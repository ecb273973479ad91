package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.ResumableValidate
import graft.rules.RuleLoader
import graft.sources.CommitLog

/** spark-submit-able entry point — the distributed analogue of the
  * reference CLI `ys [-f schema.yaml]... instance.yaml [--fail-fast]
  * [--json]` (`/root/reference/src/bin/ys.rs:18-96,122-243`):
  *
  * {{{
  * spark-submit --class graft.Main <jar> \
  *   --rules rules.yaml [--rules more.yaml]... \
  *   --docs /path/to/docs_parquet --out /path/to/out \
  *   [--fail-fast] [--json] [--parts-per-batch N] [--files-per-part N] \
  *   [--forget deletes.parquet [--forget-col doc_id]]
  * }}}
  *
  * `--forget` applies a tombstone list (right-to-be-forgotten) to the
  * docs table before any rule runs — broadcast anti-join, audit with the
  * recomputed zero residual written to `out/forget_audit`.
  *
  * `--rules` is repeatable like the reference's `-f` (`ys.rs:133-177`): the
  * first file is the evaluation root; all files are preloaded for `$ref`
  * resolution, keyed by canonical path and by their `$id` when declared.
  * With NO `--rules`, the docs table's `$schema` column names the rules
  * file (relative paths resolve against the docs table's parent directory),
  * mirroring the reference's instance-level `$schema` discovery
  * (`ys.rs:178-213`); if neither is present the run is an ERROR — silently
  * validating nothing is never correct.
  *
  * Per-partition violations land under `out/`, one atomic commit JSON per
  * completed partition (resume: re-run the same command; completed
  * partitions are skipped — north-rule resumability). Exit code 0 = all
  * documents pass, 1 = violations found (`ys.rs:215-243`), 2 = usage/load
  * error (the reference's non-validation failure channel, `ys.rs:50-68`).
  * `--fail-fast` stops at the first failing partition batch like the
  * reference's sentinel-error short-circuit (`error.rs:30-31`). `--json`
  * prints the violation rows as a JSON array on stdout (`ys.rs:54-68`
  * shape, with doc_id/part standing in for the YAML line/col marker);
  * `--json-limit` bounds the driver-side collect (default 10000 — the
  * reference prints all, but a 100 TB corpus can emit billions of rows).
  *
  * `--infer out.yaml` profiles the docs table and writes the inferred YAML
  * schema instead of validating (the validator's inverse; the natural next
  * run passes it back via `--rules`). `--scorecard` prints the per-(path,
  * rule) violation scorecard (counts, rates, Wilson bounds) as JSON lines
  * on stdout after a validation run. `--catalog media.parquet` adds the
  * referential-integrity global check (dangling media_refs vs the catalog,
  * north-rule anti-join) and `--unique <col>` (repeatable) the salted
  * key-uniqueness global check; their violation rows land under
  * `out/global_*` and count toward the exit-1 verdict.
  *
  * `--quarantine <dir>` writes the failing documents (with their violation
  * arrays, for triage) as parquet, and `--clean <dir>` the passing ones —
  * the enforcement split ([[operators.Enforce]]'s quarantine action) over
  * the same composite rule the validation ran. `--anomaly-parts` runs the
  * median/MAD robust-z watchdog ([[operators.Anomaly]]) over the
  * per-partition failure rates in the commit log — computed from commit
  * bytes only, no corpus rescan — and reports outlier partitions on
  * stderr. `--outlier-spans` flags documents whose span COUNT is a
  * within-partition robust-z outlier (truncated/exploded docs a fixed
  * min/maxItems bound misses) to `out/global_outlier_spans` — advisory,
  * not part of the exit verdict.
  */
object Main {

  private case class Args(rules: List[String] = Nil, docs: String = "",
      out: String = "", failFast: Boolean = false, json: Boolean = false,
      jsonLimit: Int = 10000, partsPerBatch: Int = 8, filesPerPart: Int = 1,
      sketches: Boolean = false, driftCols: List[String] = Nil,
      driftSave: String = "", driftBaseline: String = "",
      infer: String = "", scorecard: Boolean = false,
      catalog: String = "", unique: List[String] = Nil,
      quarantine: String = "", clean: String = "",
      anomalyParts: Boolean = false, outlierSpans: Boolean = false,
      forget: String = "", forgetCol: String = "doc_id")

  /** Apply a tombstone list (`--forget deletes.parquet`, id column
    * `--forget-col`, same name on both sides) to the docs table: writes
    * the per-table audit — including the independently recomputed
    * post-apply residual, which must be 0 — to `out/forget_audit`, logs
    * the counts, and returns the surviving rows. Broadcast anti-join;
    * the corpus never shuffles ([[operators.Forget]]).
    */
  private[graft] def applyForget(spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame, forgetPath: String,
      idCol: String, out: String): org.apache.spark.sql.DataFrame = {
    val del = spark.read.parquet(forgetPath)
    // collect ONCE (the audit itself costs corpus scans) and write the
    // 1-row result from the collected copy — never run the audit twice
    val audit = operators.Forget.audit(spark,
      Seq(("docs", docs, idCol)), del, idCol)
    val rows = audit.collect()
    if (out.nonEmpty)
      spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), audit.schema)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$out/forget_audit")
    val a = rows(0)
    System.err.println(s"[graft] forget: removed=${a.getLong(2)} " +
      s"kept=${a.getLong(3)} residual=${a.getLong(4)}")
    operators.Forget.forget(docs, del, idCol, idCol)
  }

  private def parse(argv: List[String], a: Args): Args = argv match {
    case Nil => a
    case "--rules" :: v :: rest => parse(rest, a.copy(rules = a.rules :+ v))
    case "--docs" :: v :: rest => parse(rest, a.copy(docs = v))
    case "--out" :: v :: rest => parse(rest, a.copy(out = v))
    case "--fail-fast" :: rest => parse(rest, a.copy(failFast = true))
    case "--json" :: rest => parse(rest, a.copy(json = true))
    case "--json-limit" :: v :: rest => parse(rest, a.copy(jsonLimit = v.toInt))
    case "--parts-per-batch" :: v :: rest => parse(rest, a.copy(partsPerBatch = v.toInt))
    case "--files-per-part" :: v :: rest => parse(rest, a.copy(filesPerPart = v.toInt))
    case "--sketches" :: rest => parse(rest, a.copy(sketches = true))
    case "--drift-col" :: v :: rest => parse(rest, a.copy(driftCols = a.driftCols :+ v))
    case "--drift-save" :: v :: rest => parse(rest, a.copy(driftSave = v))
    case "--drift-baseline" :: v :: rest => parse(rest, a.copy(driftBaseline = v))
    case "--infer" :: v :: rest => parse(rest, a.copy(infer = v))
    case "--scorecard" :: rest => parse(rest, a.copy(scorecard = true))
    case "--catalog" :: v :: rest => parse(rest, a.copy(catalog = v))
    case "--unique" :: v :: rest => parse(rest, a.copy(unique = a.unique :+ v))
    case "--quarantine" :: v :: rest => parse(rest, a.copy(quarantine = v))
    case "--clean" :: v :: rest => parse(rest, a.copy(clean = v))
    case "--anomaly-parts" :: rest => parse(rest, a.copy(anomalyParts = true))
    case "--outlier-spans" :: rest => parse(rest, a.copy(outlierSpans = true))
    case "--forget" :: v :: rest => parse(rest, a.copy(forget = v))
    case "--forget-col" :: v :: rest => parse(rest, a.copy(forgetCol = v))
    case other :: _ => throw new IllegalArgumentException(s"Unknown argument: $other")
  }

  /** One JSON line per scorecard row (stable key order, jesc-escaped) —
    * the `--scorecard` stdout shape.
    */
  private[graft] def scorecardJson(r: org.apache.spark.sql.Row): String =
    s"""{"path":"${jesc(r.getAs[String]("path"))}",""" +
      s""""rule":"${jesc(r.getAs[String]("rule"))}",""" +
      s""""violations":${r.getAs[Long]("violations")},""" +
      s""""affected_docs":${r.getAs[Long]("affected_docs")},""" +
      s""""doc_rate":${r.getAs[Double]("doc_rate")},""" +
      s""""wilson_low":${r.getAs[Double]("wilson_low")}}"""

  private def jesc(s0: String): String = {
    // exceptions may carry a null message (bare NPE/IllegalState); the
    // JSON error channel and exit-code contract must survive that
    val s = if (s0 == null) "null" else s0
    s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
    }
  }

  /** Any drift flag implies sketching: a `--drift-baseline` run without
    * `--sketches` must still produce its comparison, not silently no-op.
    */
  private def wantsSketches(args: Args): Boolean =
    args.sketches || args.driftCols.nonEmpty ||
      args.driftSave.nonEmpty || args.driftBaseline.nonEmpty

  /** `--sketches` / `--drift-col` report: merged per-partition sketches from
    * the COMMIT LOG ONLY — on a resume run, committed parts contribute their
    * persisted sketch bytes without any rescan (the north rule's
    * "lineage + metrics checkpointed" made actionable). `--drift-save` writes
    * the merged sketches as a baseline file; `--drift-baseline` compares the
    * current run against such a file and reports per-column KS.
    */
  private def driftReport(spark: SparkSession, args: Args): Unit = {
    if (!wantsSketches(args)) return
    import graft.operators.ResumableValidate.{kllColKey, KllNSpansKey}
    val est = ResumableValidate.mergedDocIdEstimate(spark, args.out)
    System.err.println(s"[graft] sketch doc_id_distinct_est=$est")
    val keys = KllNSpansKey +: args.driftCols.map(kllColKey)
    val merged = keys.map(k =>
      k -> ResumableValidate.mergedKllSketch(spark, args.out, k))
    merged.foreach { case (k, b) =>
      val q = graft.plans.Kll.quantiles(b, Seq(0.1, 0.5, 0.9))
      System.err.println(s"[graft] sketch $k p10=${q(0)} p50=${q(1)} p90=${q(2)}")
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    if (args.driftSave.nonEmpty) {
      val p = new org.apache.hadoop.fs.Path(args.driftSave)
      val out = p.getFileSystem(hconf).create(p, true)
      val json = merged.map { case (k, b) =>
        "\"" + jesc(k) + "\":\"" + java.util.Base64.getEncoder.encodeToString(b) + "\""
      }.mkString("{", ",", "}")
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      System.err.println(s"[graft] drift baseline saved to ${args.driftSave}")
    }
    if (args.driftBaseline.nonEmpty) {
      val p = new org.apache.hadoop.fs.Path(args.driftBaseline)
      val in = p.getFileSystem(hconf).open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      merged.foreach { case (k, b) =>
        Option(node.get(k)).foreach { bn =>
          val base = java.util.Base64.getDecoder.decode(bn.asText)
          val ks = graft.plans.Kll.ks(base, b)
          System.err.println(f"[graft] drift $k ks=$ks%.6f")
        }
      }
    }
  }

  /** Parent dir of a LOCAL docs path for relative `$schema` resolution.
    * Accepts a bare path, a spec-compliant percent-encoded file:// URI
    * (what `java.nio.Path.toUri` / Python `as_uri` emit — `%20` decodes to
    * a space), and a raw unencoded file:// path with spaces (what humans
    * type — strict `new URI(...)` would throw on it). Remote schemes are an
    * error: rules files are read with local I/O.
    */
  private[graft] def localDocsParent(docs: String): java.nio.file.Path = {
    val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://".r
    val dir = schemeRe.findFirstMatchIn(docs) match {
      case Some(m) if m.group(1) != "file" =>
        throw new IllegalArgumentException(
          s"instance-level $$schema discovery requires a local docs path " +
            s"(got scheme ${m.group(1)}://); pass --rules explicitly")
      case Some(_) =>
        val viaUri =
          try {
            val u = new java.net.URI(docs)
            // file://host/... authority forms are rejected by Paths.get(URI)
            if (u.getAuthority != null && u.getAuthority.nonEmpty) None
            else Some(java.nio.file.Paths.get(u))
          } catch { case _: Exception => None }
        val local = viaUri.getOrElse {
          // unencoded fallback: treat everything after the scheme as a
          // literal path (Hadoop-Path-style leniency)
          val p = new org.apache.hadoop.fs.Path(docs).toUri.getPath
          if (p == null || p.isEmpty)
            throw new IllegalArgumentException(
              s"cannot resolve a local directory from $docs; pass --rules explicitly")
          java.nio.file.Paths.get(p)
        }
        local
      case None => java.nio.file.Paths.get(docs)
    }
    dir.toAbsolutePath.getParent
  }

  def main(argv: Array[String]): Unit = {
    val args = try {
      val a = parse(argv.toList, Args())
      require(a.docs.nonEmpty && (a.out.nonEmpty || a.infer.nonEmpty),
        "--docs and --out are required (or --docs with --infer)")
      a
    } catch { case e: Exception =>
      System.err.println(s"""{"error":"${jesc(e.getMessage)}"}""") // ys.rs:50-68 channel
      sys.exit(2)
    }

    val spark = SparkSession.builder()
      .appName("graft-validate")
      // spark-submit injects spark.master; standalone runs fall back to env
      .config("spark.master", sys.props.getOrElse("spark.master",
        sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // native expressions as SQL functions (span_invariant, simhash64,
      // minhash_bands, cosine_sim, kll_sketch)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val exit = try {
      val docsRaw = spark.read.parquet(args.docs)
      // right-to-be-forgotten on the validation path: tombstones applied
      // BEFORE any rule runs, audit (incl. the recomputed zero residual)
      // written next to the violation outputs — a validated corpus is also
      // a deletion-compliant one
      val docs =
        if (args.forget.isEmpty) docsRaw
        else applyForget(spark, docsRaw, args.forget, args.forgetCol, args.out)
      if (args.infer.nonEmpty) {
        // schema-inference mode (the validator's inverse): profile the
        // table, write the inferred YAML schema, and stop — the natural
        // next run is `--rules <inferred.yaml>` over fresh data
        val yaml = operators.Inference.toYaml(operators.Inference.inferRule(docs))
        // Hadoop FS, not java.nio: --infer must honor the same URI schemes
        // (hdfs://, s3a://, file://, bare) as --docs/--out and the commit log
        val outPath = new org.apache.hadoop.fs.Path(args.infer)
        val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val os = fs.create(outPath, true)
        try os.write(yaml.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        System.err.println(s"[graft] inferred schema written to ${args.infer}")
        0
      } else {
      val loaded =
        if (args.rules.nonEmpty) RuleLoader.loadFiles(args.rules)
        else {
          // instance-level $schema discovery (ys.rs:178-213): the docs
          // table's `$schema` column must name exactly one rules file
          if (!docs.schema.fieldNames.contains("$schema")) {
            throw new IllegalArgumentException(
              "No schema: pass --rules or add a string `$schema` column to the docs table")
          }
          val refs = docs.select(docs.col("$schema"))
            .filter(docs.col("$schema").isNotNull).distinct().limit(2)
            .collect().map(_.getString(0))
          if (refs.isEmpty) {
            throw new IllegalArgumentException(
              "No schema: pass --rules or add a string `$schema` column to the docs table")
          }
          require(refs.length == 1,
            s"docs table carries more than one distinct $$schema value")
          // relative $schema paths resolve against the docs table's parent
          // dir — only meaningful for local paths (rules files are read via
          // local I/O); a remote scheme (hdfs://, s3a://) must use --rules
          RuleLoader.loadFile(
            localDocsParent(args.docs).resolve(refs(0)).normalize.toString)
        }
      val manifest = docs.inputFiles.sorted.toSeq
      val report = ResumableValidate.run(spark, docs, loaded.root, args.out,
        manifest = manifest,
        failAfterParts = Int.MaxValue,
        partsPerBatch = args.partsPerBatch,
        defs = loaded.defs,
        failFast = args.failFast,
        filesPerPart = args.filesPerPart,
        withSketches = wantsSketches(args),
        driftCols = args.driftCols)
      driftReport(spark, args)
      val hconf = spark.sparkContext.hadoopConfiguration
      val commits = CommitLog.completed(args.out, hconf)
      val failedDocs = CommitLog.failedDocsTotal(args.out, hconf)
      if (args.json && failedDocs > 0) {
        // emit_validation_errors_json shape (ys.rs:54-68): one object per
        // violation row, parquet coordinates instead of YAML markers
        val rows = ResumableValidate.violations(spark, args.out)
          .orderBy("part", "doc_id", "path", "rule", "message")
          .limit(args.jsonLimit).collect()
        println(rows.map { r =>
          s"""{"part":${r.getAs[Int]("part")},""" +
            s""""doc_id":"${jesc(String.valueOf(r.getAs[String]("doc_id")))}",""" +
            s""""path":"${jesc(r.getAs[String]("path"))}",""" +
            s""""rule":"${jesc(r.getAs[String]("rule"))}",""" +
            s""""error":"${jesc(r.getAs[String]("message"))}"}"""
        }.mkString("[", ",", "]"))
      }
      // north-rule GLOBAL checks (set-level — not expressible as per-row
      // expressions): referential integrity against a media catalog and
      // key uniqueness; violation rows land next to the per-row ones
      var globalBad = 0L
      if (args.catalog.nonEmpty) {
        val cat = spark.read.parquet(args.catalog)
        operators.RefIntegrity.violations(docs, cat)
          .write.mode("overwrite").parquet(s"${args.out}/global_ref_integrity")
        val n = spark.read.parquet(s"${args.out}/global_ref_integrity").count()
        System.err.println(s"[graft] global check ref_integrity: $n dangling refs")
        globalBad += n
      }
      args.unique.foreach { c =>
        operators.Uniqueness.violations(docs, c)
          .write.mode("overwrite").parquet(s"${args.out}/global_unique_$c")
        val n = spark.read.parquet(s"${args.out}/global_unique_$c").count()
        System.err.println(s"[graft] global check unique($c): $n duplicated keys")
        globalBad += n
      }
      // enforcement split (`--quarantine` / `--clean`): failing documents
      // (with their violation arrays, for triage) and/or passing documents
      // land as parquet next to the run — the CLI form of
      // [[operators.Enforce]]'s quarantine action, over the SAME composite
      // rule the validation ran
      if (args.quarantine.nonEmpty || args.clean.nonEmpty) {
        val withV = ResumableValidate.compositeViolations(docs, loaded.root, loaded.defs)
        if (args.quarantine.nonEmpty) {
          withV.filter(!col("pass")).drop("pass")
            .write.mode("overwrite").parquet(args.quarantine)
          val n = spark.read.parquet(args.quarantine).count()
          System.err.println(s"[graft] quarantined $n failing docs -> ${args.quarantine}")
        }
        if (args.clean.nonEmpty) {
          withV.filter(col("pass")).drop("violations", "pass")
            .write.mode("overwrite").parquet(args.clean)
          val n = spark.read.parquet(args.clean).count()
          System.err.println(s"[graft] clean ${n} passing docs -> ${args.clean}")
        }
      }
      // `--anomaly-parts`: robust median/MAD z over the per-partition
      // failure rates in the commit log — "which partitions are not like
      // the others" from commit bytes only (no corpus rescan)
      if (args.anomalyParts) {
        val pm = CommitLog.partMetrics(args.out, hconf).toSeq.sortBy(_._1)
        import spark.implicits._
        val series = pm.map { case (p, (d, f)) =>
          (p, d, f, if (d == 0) 0.0 else f.toDouble / d) }
          .toDF("part", "docs", "failed_docs", "rate")
          .withColumn("_g", lit("parts"))
        val flagged = operators.Anomaly.robustZ(series, Seq("_g"), "rate")
          .filter(col("is_anomaly"))
          .select("part", "docs", "failed_docs", "rate", "z")
          .collect() // bounded by #parts
        flagged.foreach { r =>
          val z = Option(r.get(4)).map(v => f"${v.asInstanceOf[Double]}%.2f")
            .getOrElse("null")
          System.err.println(
            s"[graft] anomalous part ${r.getAs[Int]("part")}: " +
              f"rate=${r.getAs[Double]("rate")}%.6f z=$z " +
              s"(docs=${r.get(1)}, failed=${r.get(2)})")
        }
        System.err.println(
          s"[graft] part-anomaly: ${flagged.length} of ${pm.size} parts flagged")
      }
      // `--outlier-spans`: ROW-level robust-z watchdog over per-doc span
      // counts within each partition ([[operators.Anomaly.rowOutliers]],
      // histogram med/MAD — one tiny agg + one broadcast flag pass): flags
      // truncated / exploded documents a fixed min/maxItems rule would
      // miss. Advisory (stderr + out/global_outlier_spans), not exit-1:
      // an outlier is a hygiene signal, not a rule violation.
      if (args.outlierSpans) {
        operators.Anomaly.rowOutliers(
            docs.withColumn("n_spans", size(col("spans"))), Seq("part"), "n_spans")
          .filter(col("is_outlier"))
          .select(col("part"), col("doc_id"), col("n_spans"),
            col("med"), col("mad"), col("z"))
          .write.mode("overwrite").parquet(s"${args.out}/global_outlier_spans")
        val n = spark.read.parquet(s"${args.out}/global_outlier_spans").count()
        System.err.println(s"[graft] outlier-spans: $n docs flagged")
      }
      if (args.scorecard) {
        // per-(path, rule) data-quality report on stdout, one JSON line per
        // row (tiny: bounded by the rule set) — over the SAME composite the
        // validation ran (user rule + span invariant)
        operators.Validate.scorecardOf(
            ResumableValidate.compositeViolations(docs, loaded.root, loaded.defs))
          .collect().foreach(r => println(scorecardJson(r)))
      }
      System.err.println(
        s"[graft] partitions done=${report.partsDone.size} " +
          s"skipped=${report.partsSkipped.size} committed=${commits.size} " +
          s"failed_docs=$failedDocs")
      if (failedDocs + globalBad > 0) 1 else 0
      }
    } catch { case e: Exception =>
      System.err.println(s"""{"error":"${jesc(e.getMessage)}"}""")
      2
    } finally spark.stop()
    sys.exit(exit)
  }
}
