package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Per-partition commit log — the resumability substrate required by the
  * north rule ("each partition's validation state, lineage (snapshot-id,
  * file manifest) and metrics are checkpointed to a commit log so a killed
  * job restarts at the last incomplete partition with identical output").
  *
  * Layout (mirrors the shape of a table-format commit log, one atomic file
  * per committed unit — works on any filesystem with atomic rename; on
  * object stores the rename is a copy+delete but the marker-file protocol
  * still gives at-most-once visibility):
  *
  * {{{
  * <dir>/_commits/part=<p>.json   -- one JSON per completed partition
  * <dir>/violations/part=<p>/     -- that partition's violation rows
  * }}}
  *
  * The JSON carries: partition id, row/verdict metrics, the rule-set hash
  * (resume refuses to mix rule versions), a snapshot id surrogate (hash of
  * the input manifest), and the input file manifest itself. There is no
  * Iceberg runtime in this sandbox (SURVEY.md §7); the log supplies the
  * snapshot/manifest lineage an Iceberg snapshot would.
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
      wallMs: Long)

  private def commitsDir(dir: String): Path = Paths.get(dir, "_commits")

  /** `Files.list` holds a directory handle until closed — materialize the
    * listing inside try/finally so long-running drivers polling many commit
    * dirs don't leak FDs.
    */
  private def listDir(d: Path): Seq[Path] = {
    val s = Files.list(d)
    try s.iterator().asScala.toList finally s.close()
  }

  def commitPath(dir: String, part: Int): Path =
    commitsDir(dir).resolve(s"part=$part.json")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Atomic write: temp file + rename, so a concurrent/killed writer never
    * leaves a half-visible commit.
    */
  def write(dir: String, c: Commit): Unit = {
    Files.createDirectories(commitsDir(dir))
    val json =
      s"""{"part":${c.part},"docs":${c.docs},"failed_docs":${c.failedDocs},
         |"violations":${c.violations},"rule_hash":"${esc(c.ruleHash)}",
         |"snapshot_id":"${esc(c.snapshotId)}",
         |"manifest":[${c.manifest.map(m => "\"" + esc(m) + "\"").mkString(",")}],
         |"wall_ms":${c.wallMs}}""".stripMargin.replace("\n", "")
    val tmp = Files.createTempFile(commitsDir(dir), s"part-${c.part}", ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, commitPath(dir, c.part), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Completed partitions (+ their recorded rule hash for mismatch checks). */
  def completed(dir: String): Map[Int, String] = {
    val d = commitsDir(dir)
    if (!Files.exists(d)) return Map.empty
    listDir(d)
      .filter(_.getFileName.toString.matches("part=\\d+\\.json"))
      .map { p =>
        val part = p.getFileName.toString.stripPrefix("part=").stripSuffix(".json").toInt
        val txt = Files.readString(p)
        val hash = "\"rule_hash\":\"([^\"]*)\"".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
        part -> hash
      }.toMap
  }

  /** Sum of failed_docs over all committed partitions (the job verdict). */
  def failedDocsTotal(dir: String): Long = {
    val d = commitsDir(dir)
    if (!Files.exists(d)) return 0L
    listDir(d)
      .filter(_.getFileName.toString.matches("part=\\d+\\.json"))
      .map { p =>
        "\"failed_docs\":(\\d+)".r.findFirstMatchIn(Files.readString(p))
          .map(_.group(1).toLong).getOrElse(0L)
      }.sum
  }

  def clear(dir: String): Unit = {
    val d = commitsDir(dir)
    if (Files.exists(d)) {
      listDir(d).foreach(Files.deleteIfExists(_))
    }
  }
}
