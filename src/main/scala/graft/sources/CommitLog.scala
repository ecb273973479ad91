package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/** Per-partition commit log — the resumability substrate required by the
  * north rule ("each partition's validation state, lineage (snapshot-id,
  * file manifest) and metrics are checkpointed to a commit log so a killed
  * job restarts at the last incomplete partition with identical output").
  *
  * All I/O goes through `org.apache.hadoop.fs.FileSystem`, so the log runs
  * unchanged against local paths (`file://` or bare), HDFS, or S3A — the
  * scheme of the supplied dir picks the filesystem. Layout (mirrors the
  * shape of a table-format commit log, one atomic file per committed unit —
  * atomic rename on HDFS/local; on object stores the rename is a copy+delete
  * but the marker-file protocol still gives at-most-once visibility):
  *
  * {{{
  * <dir>/_commits/part=<p>.json   -- one JSON per completed partition
  * <dir>/violations_batch_<b>/part=<p>/ -- that partition's violation rows
  * }}}
  *
  * The JSON carries: partition id, row/verdict metrics, the rule-set hash
  * (resume refuses to mix rule versions), a snapshot id surrogate (hash of
  * the input manifest), the input file manifest itself, the batch dir the
  * partition's violations were written to (so readers only consume
  * committed (part, batch) pairs and a crash between a batch write and its
  * commits can never surface duplicate rows), and optional per-partition
  * sketch bytes (KLL / HLL) so drift and cardinality resume incrementally
  * with validation. There is no Iceberg runtime in this sandbox
  * (SURVEY.md §7); the log supplies the snapshot/manifest lineage an
  * Iceberg snapshot would.
  */
object CommitLog {

  final case class Commit(
      part: Int,
      docs: Long,
      failedDocs: Long,
      violations: Long,
      ruleHash: String,
      snapshotId: String,
      manifest: Seq[String],
      wallMs: Long,
      batch: String = "",
      sketches: Map[String, Array[Byte]] = Map.empty)

  /** Resolve the filesystem for a dir string (bare paths = local FS). */
  private def fsFor(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  private def commitsDir(base: Path): Path = new Path(base, "_commits")

  def commitPath(dir: String, part: Int,
      conf: Configuration = new Configuration()): Path = {
    val (_, base) = fsFor(dir, conf)
    new Path(commitsDir(base), s"part=$part.json")
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  /** Atomic write: temp file + rename, so a concurrent/killed writer never
    * leaves a half-visible commit. `FileSystem.rename` won't clobber an
    * existing destination on every FS, so an existing commit file (re-run
    * of an already-committed part) is deleted first — commit content is a
    * pure function of (part, input, rules), so the replace is idempotent.
    */
  def write(dir: String, c: Commit,
      conf: Configuration = new Configuration()): Unit = {
    val (fs, base) = fsFor(dir, conf)
    val cd = commitsDir(base)
    fs.mkdirs(cd)
    val sketchJson =
      if (c.sketches.isEmpty) ""
      else c.sketches.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + esc(k) + "\":\"" + b64(v) + "\"" }
        .mkString(",\"sketches\":{", ",", "}")
    val json =
      s"""{"part":${c.part},"docs":${c.docs},"failed_docs":${c.failedDocs},
         |"violations":${c.violations},"rule_hash":"${esc(c.ruleHash)}",
         |"snapshot_id":"${esc(c.snapshotId)}",
         |"manifest":[${c.manifest.map(m => "\"" + esc(m) + "\"").mkString(",")}],
         |"batch":"${esc(c.batch)}"$sketchJson,
         |"wall_ms":${c.wallMs}}""".stripMargin.replace("\n", "")
    val tmp = new Path(cd, s"part-${c.part}-${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = new Path(cd, s"part=${c.part}.json")
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"commit rename failed for $dst")
    }
  }

  private def readCommitFiles(dir: String, conf: Configuration): Seq[(Int, String)] = {
    val (fs, base) = fsFor(dir, conf)
    val cd = commitsDir(base)
    if (!fs.exists(cd)) return Nil
    fs.listStatus(cd).toSeq
      .filter(_.getPath.getName.matches("part=\\d+\\.json"))
      .map { st =>
        val part = st.getPath.getName.stripPrefix("part=").stripSuffix(".json").toInt
        val in = fs.open(st.getPath)
        val txt = try {
          val buf = new java.io.ByteArrayOutputStream()
          val arr = new Array[Byte](8192)
          var n = in.read(arr)
          while (n >= 0) { buf.write(arr, 0, n); n = in.read(arr) }
          new String(buf.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
        part -> txt
      }
  }

  /** READ side parses with Jackson (already on Spark's classpath), not
    * regexes: a `"([^"]*)"` field pattern truncates at the `\"` that [[esc]]
    * itself faithfully writes for a manifest path containing a quote — real
    * object-store keys can contain quotes and newlines, and a corrupted
    * manifest read would silently break snapshot-lineage checks. The write
    * side stays hand-rolled (it controls its own output shape).
    */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parsedCommits(dir: String,
      conf: Configuration): Seq[(Int, com.fasterxml.jackson.databind.JsonNode)] =
    readCommitFiles(dir, conf).map { case (p, txt) => p -> mapper.readTree(txt) }

  /** Completed partitions (+ their recorded rule hash for mismatch checks). */
  def completed(dir: String,
      conf: Configuration = new Configuration()): Map[Int, String] =
    parsedCommits(dir, conf)
      .map { case (p, n) => p -> Option(n.get("rule_hash")).map(_.asText).getOrElse("") }
      .toMap

  /** part -> batch dir name it was committed under ("" for pre-batch logs). */
  def committedBatches(dir: String,
      conf: Configuration = new Configuration()): Map[Int, String] =
    parsedCommits(dir, conf)
      .map { case (p, n) => p -> Option(n.get("batch")).map(_.asText).getOrElse("") }
      .toMap

  /** part -> named sketch bytes persisted with the commit (may be empty). */
  def sketches(dir: String,
      conf: Configuration = new Configuration()): Map[Int, Map[String, Array[Byte]]] =
    parsedCommits(dir, conf).map { case (p, n) =>
      val entries = Option(n.get("sketches")).map { sk =>
        import scala.jdk.CollectionConverters._
        sk.properties().asScala.map { e =>
          e.getKey -> java.util.Base64.getDecoder.decode(e.getValue.asText)
        }.toMap
      }.getOrElse(Map.empty[String, Array[Byte]])
      p -> entries
    }.toMap

  /** The recorded input-file manifest per part (lineage read-back). */
  def manifests(dir: String,
      conf: Configuration = new Configuration()): Map[Int, Seq[String]] =
    parsedCommits(dir, conf).map { case (p, n) =>
      import scala.jdk.CollectionConverters._
      p -> Option(n.get("manifest"))
        .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
    }.toMap

  /** part -> committed doc count (0 = a legitimately empty partition). */
  def docCounts(dir: String,
      conf: Configuration = new Configuration()): Map[Int, Long] =
    parsedCommits(dir, conf).map { case (p, n) =>
      p -> Option(n.get("docs")).map(_.asLong).getOrElse(0L)
    }.toMap

  /** part -> (docs, failed_docs) — the per-partition metric series the
    * CLI's part-anomaly watchdog feeds to [[graft.operators.Anomaly]].
    */
  def partMetrics(dir: String,
      conf: Configuration = new Configuration()): Map[Int, (Long, Long)] =
    parsedCommits(dir, conf).map { case (p, n) =>
      p -> (Option(n.get("docs")).map(_.asLong).getOrElse(0L),
        Option(n.get("failed_docs")).map(_.asLong).getOrElse(0L))
    }.toMap

  /** Sum of failed_docs over all committed partitions (the job verdict). */
  def failedDocsTotal(dir: String,
      conf: Configuration = new Configuration()): Long =
    parsedCommits(dir, conf).map { case (_, n) =>
      Option(n.get("failed_docs")).map(_.asLong).getOrElse(0L)
    }.sum

  def clear(dir: String, conf: Configuration = new Configuration()): Unit = {
    val (fs, base) = fsFor(dir, conf)
    val cd = commitsDir(base)
    if (fs.exists(cd)) fs.delete(cd, true): Unit
  }
}
