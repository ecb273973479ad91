package graft

/** Round-6 optimization measurement aids — SEPARATE from the frozen
  * [[Bench]] harness (whose per-query methodology the driver hashes).
  *
  *  - [[PlanDump]]: `runMain graft.PlanDump <sfDir> <outDir> <query>...`
  *    writes each query's `.explain("formatted")` text to
  *    `<outDir>/<query>.txt` — the plan evidence committed under
  *    plans/r06/ (guide §7.2).
  *  - [[BenchExtra]]: `runMain graft.BenchExtra <sfDir> <query>...` times
  *    each query with the noop sink (guide §1.4: computes every column of
  *    every row, no result materialization to the driver) — min of 3 runs,
  *    same session config as the bench's per-query section. Queries named
  *    `all` expands to the full registry.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    new java.io.File(outDir).mkdirs()
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.txt"), txt)
      println(s"wrote $outDir/$n.txt")
    }
    spark.stop()
  }
}

object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args(0)
    val names0 = args.drop(1).toSeq
    val names =
      if (names0 == Seq("all")) SparkEntry.queries.keys.toSeq.sorted
      else names0
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"bench-extra: $n")
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        Bench.time {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }._2
      }
      println(f"""{"query":"$n","noop_min_sec":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
