package graft.operators

import graft.SparkSpec
import graft.rules.{Keywords, Rule}
import graft.sources.DocsGen
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-plan assertions — the scale properties the engine is designed
  * around must be visible in `explain` output, not just claimed:
  * shuffle-free per-row validation, partition pruning on resume, column
  * pruning for metadata-only media queries, broadcast anti-join for RI.
  */
class PlanSpec extends SparkSpec {

  private lazy val docsPath = {
    val dir = Files.createTempDirectory("graft_plan").toString
    DocsGen.docs(spark, DocsGen.Knobs(nDocs = 2000, nParts = 4))
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    dir
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("per-row validation is shuffle-free (no Exchange before verdict agg)") {
    val docs = spark.read.parquet(docsPath)
    val rule = Rule.Check(Keywords(required = List("doc_id", "spans")))
    val plan = planOf(Validate.withViolations(docs, rule)
      .withColumn("sv", SpanInvariant.predCol(col("spans"))))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resume part-filter prunes partitions at the source") {
    val docs = spark.read.parquet(docsPath).filter(col("part").isin(1, 2))
    val plan = docs.queryExecution.executedPlan.toString
    // partition-column filter must land in PartitionFilters, not a
    // post-scan Filter over all data
    assert(plan.contains("PartitionFilters") && plan.contains("part"),
      s"no partition pruning:\n$plan")
    // runtime evidence: only files under the selected partitions are read
    // (inputFiles reports the unpruned relation, so check at execution)
    val touched = docs.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(touched.nonEmpty &&
      touched.forall(f => f.contains("part=1") || f.contains("part=2")),
      s"scan read files outside the requested partitions: ${touched.mkString(",")}")
  }

  test("metadata-only media query prunes the binary content column") {
    val dir = Files.createTempDirectory("graft_media").toString
    Multimodal.syntheticMedia(spark, 100).write.mode("overwrite").parquet(dir)
    val metaOnly = spark.read.parquet(dir).select("media_ref", "mime")
    val plan = metaOnly.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("content"),
      s"content column not pruned:\n$plan")
  }

  test("referential-integrity anti-join broadcasts the catalog") {
    val docs = spark.read.parquet(docsPath)
    val catalog = DocsGen.mediaCatalog(spark, DocsGen.Knobs())
    val plan = planOf(RefIntegrity.dangling(docs, catalog))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
  }

  test("uniqueness two-phase agg has partial aggregation before the shuffle") {
    val docs = spark.read.parquet(docsPath)
    val plan = planOf(Uniqueness.duplicates(docs, "doc_id"))
    // HashAggregate(partial) -> Exchange -> HashAggregate(final|merge)
    assert(plan.contains("HashAggregate") && plan.contains("Exchange"))
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0, s"no hash aggregate:\n$plan")
  }
}
