package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules.Rule
import graft.sources.CommitLog

/** Resumable validation runs (north rule: "a killed job restarts at the last
  * incomplete partition with identical output").
  *
  * A run validates the docs table one `part` at a time; after each part's
  * violations land in `outDir/violations/part=<p>/`, an atomic commit JSON
  * (metrics + rule hash + snapshot-id surrogate + input manifest) is written.
  * A restart reads the commit log, skips committed parts — the `part`
  * filter prunes at the source when the input is partitioned on `part` —
  * and reproduces byte-identical output for the remainder:
  * violations are sorted within each part and written as a single file per
  * part, so file bytes are a pure function of (input partition, rule set).
  *
  * Scale notes: "one Spark job per partition" is the commit granularity of
  * the checkpoint protocol, not a parallelism limit — each per-part job
  * still fans out across all executors, and `partsPerBatch` groups many
  * table partitions into one job (one commit per part is still written).
  * The single-file-per-part write is for byte-reproducibility of goldens;
  * at 100 TB you'd raise files-per-part and trade away byte-identity for
  * write parallelism while keeping row-level identity.
  */
object ResumableValidate {

  final case class RunReport(partsDone: Seq[Int], partsSkipped: Seq[Int])

  /** Stable hash of the rule set (refuses to resume across rule changes):
    * SHA-256 over the canonical rendering (sorted map keys), full digest —
    * a 32-bit `toString.hashCode` both collides and depends on Scala Map
    * iteration order, either of which would let a resume silently mix
    * outputs from different rule sets.
    */
  def ruleHash(rule: Rule): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Rule.canonical(rule).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Validate `docs` (must carry a `part` column) against `rule` + the span
    * invariant, checkpointing per part. `failAfterParts` kills the run after
    * N parts (test hook simulating a mid-run crash).
    *
    * `filesPerPart` (default 1 = byte-identical golden output: one sorted
    * file per part) is the scale knob: at 100 TB raise it so each part
    * writes with real parallelism — rows are assigned to files by a
    * deterministic doc_id hash and each file stays internally sorted, so
    * output remains row-identical and file-set-deterministic, just not
    * single-file.
    *
    * `expectedParts`, when given, is the authoritative partition list (at
    * scale: the table manifest): expected parts with ZERO rows still get a
    * pass-verdict commit (docs=0, failed=0 — the reference emits a pass for
    * an empty document too, engine.rs:51-57) instead of silently vanishing
    * from the commit log.
    */
  def run(spark: SparkSession, docs: DataFrame, rule: Rule, outDir: String,
      manifest: Seq[String] = Nil, failAfterParts: Int = Int.MaxValue,
      partsPerBatch: Int = 8, defs: Map[String, Rule] = Map.empty,
      failFast: Boolean = false, filesPerPart: Int = 1,
      expectedParts: Option[Seq[Int]] = None): RunReport = {
    val rh = ruleHash(rule)
    val done = CommitLog.completed(outDir)
    done.collectFirst { case (p, h) if h.nonEmpty && h != rh =>
      throw new IllegalStateException(
        s"Commit log at $outDir was written with rule hash $h, current is $rh")
    }
    val snapshotId = java.lang.Integer.toHexString(manifest.mkString(",").hashCode)

    val observedParts = docs.select(col("part")).distinct()
      .collect().map(_.getInt(0)).toSet
    val allParts = expectedParts
      .map(ep => (ep.toSet ++ observedParts).toSeq)
      .getOrElse(observedParts.toSeq).sorted
    val pending = allParts.filterNot(done.contains)
    val donePartsList = allParts.filter(done.contains)

    // crash hygiene: a kill between a batch's parquet write and its commit
    // rows leaves orphaned part dirs — remove any part dir without a commit
    // so re-runs can't double-count (the commit file is the source of truth)
    val base = new java.io.File(outDir)
    if (base.exists()) {
      base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("violations_batch_"))
        .foreach { b =>
          b.listFiles().filter(f => f.isDirectory && f.getName.startsWith("part="))
            .foreach { pd =>
              val p = pd.getName.stripPrefix("part=").toInt
              if (!done.contains(p)) {
                def rm(f: java.io.File): Unit = {
                  if (f.isDirectory) f.listFiles().foreach(rm)
                  f.delete(): Unit
                }
                rm(pd)
              }
            }
        }
    }

    val withV = Validate.withViolations(docs, rule, defs)
      .withColumn("violations",
        concat(col("violations"), SpanInvariant.violationsCol(col("spans"))))
      .withColumn("pass", size(col("violations")) === 0)

    var executed = List.empty[Int]
    pending.grouped(partsPerBatch).foreach { batch =>
      if (executed.size < failAfterParts) {
        val take = batch.take(failAfterParts - executed.size)
        val t0 = System.nanoTime()
        val slice = withV.filter(col("part").isin(take: _*)).persist()
        val flat = slice
          .select(col("part"), col("doc_id"), explode(col("violations")).as("v"))
          .select(col("part"), col("doc_id"), col("v.path").as("path"),
            col("v.rule").as("rule"), col("v.message").as("message"))
        // filesPerPart=1: single sorted file per part (byte-identical
        // goldens); >1: deterministic hash split for write parallelism
        val viols = (if (filesPerPart <= 1) flat.coalesce(1)
          else flat.repartition(take.size * filesPerPart, col("part"),
            pmod(xxhash64(col("doc_id")), lit(filesPerPart.toLong))))
          .sortWithinPartitions("part", "doc_id", "path", "rule", "message")
        viols.write.mode("overwrite").partitionBy("part")
          .parquet(s"$outDir/violations_batch_${take.head}")
        // per-part metrics for the commit rows
        val metrics = slice.groupBy(col("part"))
          .agg(count(lit(1)).as("docs"),
            sum(when(!col("pass"), 1L).otherwise(0L)).as("failed"),
            sum(size(col("violations")).cast("long")).as("nv"))
          .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        val wallMs = (System.nanoTime() - t0) / 1000000
        take.foreach { p =>
          val (d, f, v) = metrics.getOrElse(p, (0L, 0L, 0L))
          CommitLog.write(outDir, CommitLog.Commit(p, d, f, v, rh, snapshotId,
            manifest, wallMs))
        }
        slice.unpersist()
        executed = executed ++ take
        if (executed.size >= failAfterParts) {
          throw new RuntimeException(s"Injected failure after ${executed.size} parts")
        }
        // --fail-fast: stop at the first failing batch; commits for the
        // batch are already written (checkpoint preserved, SURVEY.md §2.8)
        if (failFast && metrics.values.exists(_._2 > 0)) {
          return RunReport(executed, donePartsList)
        }
      }
    }
    RunReport(executed, donePartsList)
  }

  /** Read back all committed violations (union of the per-batch outputs). */
  def violations(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("violations_batch_"))
      .filter(_.listFiles().exists(f => f.isDirectory && f.getName.startsWith("part=")))
      .map(_.getAbsolutePath)
    require(dirs.nonEmpty, s"no committed violations under $outDir")
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }
}
