package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.ResumableValidate
import graft.rules.{Rule, RuleLoader}
import graft.sources.CommitLog

/** spark-submit-able entry point — the distributed analogue of the
  * reference CLI `ys -f schema.yaml instance.yaml [--fail-fast] [--json]`
  * (`/root/reference/src/bin/ys.rs:18-96`):
  *
  * {{{
  * spark-submit --class graft.Main <jar> \
  *   --rules rules.yaml --docs /path/to/docs_parquet --out /path/to/out \
  *   [--fail-fast] [--parts-per-batch N]
  * }}}
  *
  * Per-partition violations land under `out/`, one atomic commit JSON per
  * completed partition (resume: re-run the same command; completed
  * partitions are skipped — north-rule resumability). Exit code 0 = all
  * documents pass, 1 = violations found (`ys.rs:215-243`), 2 = usage/load
  * error (the reference's non-validation failure channel, `ys.rs:50-68`).
  * `--fail-fast` stops at the first failing partition batch like the
  * reference's sentinel-error short-circuit (`error.rs:30-31`).
  */
object Main {

  private case class Args(rules: Option[String] = None, docs: String = "",
      out: String = "", failFast: Boolean = false, partsPerBatch: Int = 8)

  private def parse(argv: List[String], a: Args): Args = argv match {
    case Nil => a
    case "--rules" :: v :: rest => parse(rest, a.copy(rules = Some(v)))
    case "--docs" :: v :: rest => parse(rest, a.copy(docs = v))
    case "--out" :: v :: rest => parse(rest, a.copy(out = v))
    case "--fail-fast" :: rest => parse(rest, a.copy(failFast = true))
    case "--parts-per-batch" :: v :: rest => parse(rest, a.copy(partsPerBatch = v.toInt))
    case other :: _ => throw new IllegalArgumentException(s"Unknown argument: $other")
  }

  def main(argv: Array[String]): Unit = {
    val args = try {
      val a = parse(argv.toList, Args())
      require(a.docs.nonEmpty && a.out.nonEmpty, "--docs and --out are required")
      a
    } catch { case e: Exception =>
      System.err.println(s"""{"error":"${e.getMessage}"}""") // ys.rs:50-68 channel
      sys.exit(2)
    }

    val spark = SparkSession.builder()
      .appName("graft-validate")
      // spark-submit injects spark.master; standalone runs fall back to env
      .config("spark.master", sys.props.getOrElse("spark.master",
        sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val exit = try {
      val loaded = args.rules.map(RuleLoader.loadFile)
        .getOrElse(RuleLoader.Loaded(Rule.Accept, Map.empty))
      val docs = spark.read.parquet(args.docs)
      val manifest = docs.inputFiles.sorted.toSeq
      val report = ResumableValidate.run(spark, docs, loaded.root, args.out,
        manifest = manifest,
        failAfterParts = Int.MaxValue,
        partsPerBatch = args.partsPerBatch,
        defs = loaded.defs,
        failFast = args.failFast)
      val commits = CommitLog.completed(args.out)
      val failedDocs = CommitLog.failedDocsTotal(args.out)
      System.err.println(
        s"[graft] partitions done=${report.partsDone.size} " +
          s"skipped=${report.partsSkipped.size} committed=${commits.size} " +
          s"failed_docs=$failedDocs")
      if (failedDocs > 0) 1 else 0
    } catch { case e: Exception =>
      System.err.println(s"""{"error":"${e.getMessage}"}""")
      2
    } finally spark.stop()
    sys.exit(exit)
  }
}
