package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules.Rule
import graft.sources.CommitLog

/** Resumable validation runs (north rule: "a killed job restarts at the last
  * incomplete partition with identical output").
  *
  * A run validates the docs table one `part` at a time; after each part's
  * violations land in `outDir/violations_batch_<b>/part=<p>/`, an atomic
  * commit JSON (metrics + rule hash + snapshot-id surrogate + input manifest
  * + the batch dir name + optional per-partition sketch bytes) is written.
  * A restart reads the commit log, skips committed parts — the `part`
  * filter prunes at the source when the input is partitioned on `part` —
  * and reproduces byte-identical output for the remainder:
  * violations are sorted within each part and written as a single file per
  * part, so file bytes are a pure function of (input partition, rule set).
  *
  * All filesystem access (commit log, crash-hygiene sweep, violation
  * read-back) goes through `org.apache.hadoop.fs.FileSystem`, so the whole
  * resumable path runs against `file://`, HDFS, or S3A unchanged — a
  * cluster driver pointing outDir at an object store gets the same
  * protocol (rename atomicity caveats documented in [[CommitLog]]).
  *
  * Readers only consume committed (part, batch) pairs: each commit records
  * the batch dir its violations were written to, so a crash between a
  * batch's parquet write and its commit loop can never surface duplicate
  * rows on re-run — the re-run writes those parts into a NEW batch dir and
  * the old batch's rows for them are never read (and are swept on restart).
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

  /** Sketch keys persisted with each commit when `withSketches = true`. */
  val HllDocIdKey = "hll_doc_id"
  val KllNSpansKey = "kll_n_spans"

  /** Commit-sketch key for a user-named drift column (`--drift-col`). */
  def kllColKey(c: String): String = s"kll_col_$c"

  /** The ONE composition of user rule + built-in span invariant the engine
    * validates with — [[run]] and the CLI scorecard both lower through
    * this, so a report can never cover a different rule set than the
    * verdicts did.
    */
  def compositeViolations(docs: org.apache.spark.sql.DataFrame, rule: Rule,
      defs: Map[String, Rule] = Map.empty): org.apache.spark.sql.DataFrame =
    Validate.withViolations(docs, rule, defs)
      .withColumn("violations",
        concat(col("violations"), SpanInvariant.violationsCol(col("spans"))))
      .withColumn("pass", size(col("violations")) === 0)

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
    *
    * `withSketches = true` additionally aggregates, per part and in the SAME
    * pass as the verdict metrics, an HLL sketch of `doc_id` and a KLL sketch
    * of `size(spans)`, persisting the bytes in the commit JSON — so
    * cardinality and drift state resume incrementally with validation
    * (merge with [[mergedDocIdSketch]] / [[mergedNSpansSketch]], no re-scan
    * of committed parts).
    */
  def run(spark: SparkSession, docs: DataFrame, rule: Rule, outDir: String,
      manifest: Seq[String] = Nil, failAfterParts: Int = Int.MaxValue,
      partsPerBatch: Int = 8, defs: Map[String, Rule] = Map.empty,
      failFast: Boolean = false, filesPerPart: Int = 1,
      expectedParts: Option[Seq[Int]] = None,
      withSketches: Boolean = false,
      driftCols: Seq[String] = Nil): RunReport = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rh = ruleHash(rule)
    val done = CommitLog.completed(outDir, conf)
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
    // so the on-disk state stays a pure function of the commit log (readers
    // already ignore uncommitted (part, batch) pairs; the sweep keeps dead
    // bytes from accumulating across repeated crashes)
    val basePath = new Path(outDir)
    val fs = basePath.getFileSystem(conf)
    if (fs.exists(basePath)) {
      fs.listStatus(basePath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("violations_batch_"))
        .foreach { b =>
          fs.listStatus(b.getPath).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("part="))
            .foreach { pd =>
              val p = pd.getPath.getName.stripPrefix("part=").toInt
              if (!done.contains(p)) fs.delete(pd.getPath, true): Unit
            }
        }
    }

    val withV = compositeViolations(docs, rule, defs)

    var executed = List.empty[Int]
    pending.grouped(partsPerBatch).foreach { batch =>
      if (executed.size < failAfterParts) {
        val take = batch.take(failAfterParts - executed.size)
        val t0 = System.nanoTime()
        val batchName = s"violations_batch_${take.head}"
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
          .parquet(s"$outDir/$batchName")
        // per-part metrics (+ optional sketches) for the commit rows —
        // one aggregation pass over the persisted slice
        val baseAggs = Seq(
          count(lit(1)).as("docs"),
          sum(when(!col("pass"), 1L).otherwise(0L)).as("failed"),
          sum(size(col("violations")).cast("long")).as("nv"))
        val sketchAggs = (if (withSketches) Seq(
          hll_sketch_agg(col("doc_id").cast("string")).as("hll"),
          graft.plans.Kll.sketchAgg(size(col("spans")).cast("double")).as("kll"))
        else Nil) ++ driftCols.map(c =>
          graft.plans.Kll.sketchAgg(col(c).cast("double")).as(kllColKey(c)))
        val aggs = baseAggs ++ sketchAggs
        val metricRows = slice.groupBy(col("part"))
          .agg(aggs.head, aggs.tail: _*).collect()
        val metrics = metricRows.map { r =>
          val sk = (if (withSketches) Map(
            HllDocIdKey -> r.getAs[Array[Byte]]("hll"),
            KllNSpansKey -> r.getAs[Array[Byte]]("kll"))
          else Map.empty[String, Array[Byte]]) ++
            driftCols.map(c => kllColKey(c) -> r.getAs[Array[Byte]](kllColKey(c)))
          r.getInt(0) -> ((r.getAs[Long]("docs"), r.getAs[Long]("failed"),
            r.getAs[Long]("nv"), sk))
        }.toMap
        val wallMs = (System.nanoTime() - t0) / 1000000
        take.foreach { p =>
          val (d, f, v, sk) =
            metrics.getOrElse(p, (0L, 0L, 0L, Map.empty[String, Array[Byte]]))
          CommitLog.write(outDir, CommitLog.Commit(p, d, f, v, rh, snapshotId,
            manifest, wallMs, batch = batchName, sketches = sk), conf)
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

  /** Read back committed violations: only (part, batch) pairs recorded in
    * the commit log are consumed, so rows from a batch that crashed before
    * its commits (and whose parts were re-run into a later batch) are never
    * double-counted.
    */
  def violations(spark: SparkSession, outDir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val allCommits = CommitLog.committedBatches(outDir, conf)
    val byBatch = allCommits
      .filter(_._2.nonEmpty)
      .groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    // commits written before the batch field existed carry no batch name;
    // fall back to the legacy read for those parts (union every batch dir
    // — pre-batch-field logs had no crash-orphan dirs to double-count)
    val legacyParts = allCommits.collect { case (p, b) if b.isEmpty => p }.toSeq
    val basePath = new Path(outDir)
    val fs = basePath.getFileSystem(conf)
    def batchDf(batchName: String, parts: Seq[Int]): Option[DataFrame] = {
      val bp = new Path(basePath, batchName)
      val hasParts = fs.exists(bp) && fs.listStatus(bp)
        .exists(st => st.isDirectory && st.getPath.getName.startsWith("part="))
      if (hasParts)
        Some(spark.read.parquet(bp.toString)
          .filter(col("part").isin(parts: _*)))
      else None
    }
    val legacyDfs = if (legacyParts.isEmpty) Seq.empty
      else {
        val batchDirs = fs.listStatus(basePath).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("violations_batch_"))
          .map(_.getPath.getName).sorted
        batchDirs.flatMap(b => batchDf(b, legacyParts))
      }
    val dfs = byBatch.toSeq.sortBy(_._1).flatMap { case (batchName, parts) =>
      batchDf(batchName, parts)
    } ++ legacyDfs
    require(dfs.nonEmpty, s"no committed violations under $outDir")
    dfs.reduce(_ unionByName _)
  }

  /** Merged doc_id HLL sketch over all committed parts (requires the run to
    * have used `withSketches = true`) — returns the distinct estimate.
    * Union happens in Spark (`hll_union_agg`) over the persisted bytes:
    * no re-scan of any committed data.
    */
  /** Every committed part must carry `key` — a commit log where only SOME
    * parts have the sketch (e.g. a crash under plain validation resumed
    * later with `--sketches`) would otherwise merge into corpus-wide
    * numbers silently computed from a subset: partial coverage presented
    * as whole-run stats is worse than an error.
    */
  private def sketchBytesAllParts(spark: SparkSession, outDir: String,
      key: String): Seq[Array[Byte]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val perPart = CommitLog.sketches(outDir, conf).toSeq.sortBy(_._1)
    require(perPart.nonEmpty, s"no commits under $outDir")
    // a legitimately EMPTY part (docs = 0) commits no sketch rows and
    // contributes nothing to any merge — only non-empty parts must carry
    // the key
    val docs = CommitLog.docCounts(outDir, conf)
    val missing = perPart.collect {
      case (p, m) if !m.contains(key) && docs.getOrElse(p, 0L) > 0L => p
    }
    require(missing.isEmpty,
      s"sketch $key missing from committed part(s) ${missing.take(8).mkString(",")}" +
        s"${if (missing.size > 8) ",…" else ""} under $outDir — these parts were " +
        "validated without sketches; re-run them (delete their commits) with " +
        "--sketches/--drift-col before asking for a merged report")
    // flatMap, not apply: empty parts legitimately carry no bytes
    val bytes = perPart.flatMap(_._2.get(key))
    require(bytes.nonEmpty, s"no $key sketches committed under $outDir")
    bytes
  }

  def mergedDocIdEstimate(spark: SparkSession, outDir: String): Long = {
    val bytes = sketchBytesAllParts(spark, outDir, HllDocIdKey)
    import spark.implicits._
    bytes.toDF("sketch")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .collect()(0).getLong(0)
  }

  /** Merged KLL sketch of size(spans) over all committed parts. Merge runs
    * in part order — KLL compaction is sensitive to merge order, so a fixed
    * order keeps the merged sketch reproducible for a given set of
    * per-part sketches.
    */
  def mergedNSpansSketch(spark: SparkSession, outDir: String): Array[Byte] =
    mergedKllSketch(spark, outDir, KllNSpansKey)

  /** Merged KLL sketch for any persisted sketch key (e.g. [[kllColKey]] for
    * a `--drift-col` column). Pure commit-log read — NEVER rescans data.
    */
  def mergedKllSketch(spark: SparkSession, outDir: String, key: String): Array[Byte] =
    graft.plans.Kll.union(sketchBytesAllParts(spark, outDir, key))
}
