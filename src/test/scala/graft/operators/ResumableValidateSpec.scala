package graft.operators

import graft.SparkSpec
import graft.rules.{Keywords, Rule}
import graft.sources.{CommitLog, DocsGen}
import java.nio.file.Files

/** Resume fixture (FIXTURES.md §4): run, kill after N partitions, restart —
  * expect identical violation output and a commit log showing the completed
  * partitions skipped.
  */
class ResumableValidateSpec extends SparkSpec {

  private val rule = Rule.Check(Keywords(required = List("doc_id", "spans")))

  private def freshDocs = DocsGen.docs(spark, DocsGen.Knobs(
    nDocs = 3000, nParts = 6, badKindPerMille = 20, badOrderPerMille = 10,
    nullDocIdPerMille = 5))

  test("kill mid-run, restart: skips committed parts, identical output") {
    val cleanDir = Files.createTempDirectory("graft_clean").toString
    val crashDir = Files.createTempDirectory("graft_crash").toString

    // reference: single uninterrupted run
    val r0 = ResumableValidate.run(spark, freshDocs, rule, cleanDir,
      manifest = Seq("gen:3000:6"), partsPerBatch = 2)
    assert(r0.partsDone.size == 6 && r0.partsSkipped.isEmpty)

    // crashed run: dies after 2 parts
    val crashed = intercept[RuntimeException] {
      ResumableValidate.run(spark, freshDocs, rule, crashDir,
        manifest = Seq("gen:3000:6"), failAfterParts = 2, partsPerBatch = 2)
    }
    assert(crashed.getMessage.contains("Injected failure"))
    assert(CommitLog.completed(crashDir).size == 2)

    // restart: completes the rest, skipping the 2 committed parts
    val r2 = ResumableValidate.run(spark, freshDocs, rule, crashDir,
      manifest = Seq("gen:3000:6"), partsPerBatch = 2)
    assert(r2.partsSkipped.size == 2 && r2.partsDone.size == 4)
    assert(CommitLog.completed(crashDir).size == 6)

    // outputs identical row-for-row
    val a = ResumableValidate.violations(spark, cleanDir)
      .orderBy("part", "doc_id", "path", "rule", "message").collect()
    val b = ResumableValidate.violations(spark, crashDir)
      .orderBy("part", "doc_id", "path", "rule", "message").collect()
    assert(a.length == b.length && a.sameElements(b),
      s"clean=${a.length} rows, resumed=${b.length} rows")
    assert(a.length > 0)
  }

  test("resume refuses a different rule set (rule hash mismatch)") {
    val dir = Files.createTempDirectory("graft_rh").toString
    ResumableValidate.run(spark, freshDocs, rule, dir, partsPerBatch = 6)
    val other = Rule.Check(Keywords(required = List("doc_id")))
    val e = intercept[IllegalStateException] {
      ResumableValidate.run(spark, freshDocs, other, dir)
    }
    assert(e.getMessage.contains("rule hash"))
  }

  test("commit rows carry lineage: snapshot id, manifest, metrics") {
    val dir = Files.createTempDirectory("graft_lin").toString
    ResumableValidate.run(spark, freshDocs, rule, dir,
      manifest = Seq("file_a.parquet", "file_b.parquet"), partsPerBatch = 6)
    val txt = Files.readString(CommitLog.commitPath(dir, 0))
    assert(txt.contains("\"snapshot_id\":\"") && txt.contains("file_a.parquet"))
    assert(txt.contains("\"docs\":") && txt.contains("\"wall_ms\":"))
  }
}
