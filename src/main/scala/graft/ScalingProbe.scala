package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SpanInvariant, Validate}
import graft.rules.{Keywords, Rule}

/** Dev utility: per-iteration wall times of the validation job at two
  * parallelism levels (diagnosing thread-scaling; see BENCH/BASELINE.md).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_bench_docs_8000000")
    val rule = Rule.Check(Keywords(required = List("doc_id", "spans"), properties = Map(
      "doc_id" -> Rule.Check(Keywords(types = Some(List("string")),
        pattern = Some("^d-[0-9]{12}$"))),
      "spans" -> Rule.Check(Keywords(minItems = Some(1), maxItems = Some(16))))))
    def sess(n: Int) = {
      val s = SparkSession.builder().master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n.toString)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    def job(s: SparkSession): Unit = {
      val docs = s.read.parquet(path)
      Validate.withViolations(docs, rule)
        .withColumn("violations",
          concat(col("violations"), SpanInvariant.violationsCol(col("spans"))))
        .groupBy("part")
        .agg(count(lit(1)), sum(size(col("violations")).cast("long")))
        .collect(): Unit
    }
    def t(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    Seq(32, 8, 32).foreach { n =>
      val s = sess(n)
      print(s"local[$n]:")
      (1 to 5).foreach(_ => print(f" ${t(job(s))}%.2f"))
      println()
      s.stop()
    }
  }
}
