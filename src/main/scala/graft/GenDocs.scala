package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.sources.DocsGen

/** Fixture/corpus generator CLI: writes the deterministic north-rule docs
  * table (and optionally the media catalog) as partitioned parquet.
  *
  * {{{
  * runMain graft.GenDocs <outDir> [nDocs] [nParts] [badPerMille] [schemaRef]
  * }}}
  *
  * `schemaRef`, when given, adds a literal `$schema` column to every doc —
  * the instance-level schema-discovery channel (`ys.rs:178-213`) that
  * `graft.Main` reads when launched without `--rules`.
  */
object GenDocs {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDocs = if (args.length > 1) args(1).toLong else 100000L
    val nParts = if (args.length > 2) args(2).toInt else 16
    val bad = if (args.length > 3) args(3).toInt else 10
    val schemaRef = if (args.length > 4) Some(args(4)) else None
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = DocsGen.docs(spark, DocsGen.Knobs(nDocs = nDocs, nParts = nParts,
      badKindPerMille = bad, badOrderPerMille = bad, negOffsetPerMille = bad / 2,
      nullDocIdPerMille = bad / 2, danglingRefPerMille = bad))
    val docs = schemaRef.map(r =>
      docs0.withColumn("$schema", org.apache.spark.sql.functions.lit(r))).getOrElse(docs0)
    docs.repartition(nParts, col("part"))
      .write.mode("overwrite").parquet(s"$out/docs")
    DocsGen.mediaCatalog(spark, DocsGen.Knobs())
      .write.mode("overwrite").parquet(s"$out/media_catalog")
    println(s"[gendocs] wrote $nDocs docs / $nParts parts to $out")
    spark.stop()
  }
}
