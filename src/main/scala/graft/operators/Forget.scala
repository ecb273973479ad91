package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten / delete-propagation: apply a tombstone list of
  * ids to a corpus and every derived table, audit exactly what was
  * removed, and — the part that matters at 10^12 rows — plan the rewrite
  * so only the FILES that contain a deleted id are touched.
  *
  * The reference is a single-document validator with no notion of
  * deletion; this is corpus-lifecycle capability in the same family as
  * Diff / Layout (a validation engine that certifies a corpus must also
  * certify its deletions: "these ids are gone everywhere, and here is the
  * audit trail").
  *
  * Scale notes:
  *   - [[forget]] is ONE anti-join; with a typical delete list (thousands
  *     to millions of ids against 10^12 rows) the list broadcasts and the
  *     whole operation is a scan-stage filter — zero shuffle of the corpus.
  *   - [[audit]] runs one aggregation scan per table (removed/kept counts
  *     from the same broadcast membership probe), plus a delete-list-sized
  *     re-check of the applied output (`residual` must be 0).
  *   - [[plan]] never touches the corpus at all: it joins the delete list
  *     against the file manifest's (min_id, max_id) ranges via the same
  *     fixed-width chunk trick as [[Temporal.rangeJoin]] — a file spanning
  *     c id-chunks emits c manifest rows, a delete probes exactly one
  *     chunk, and the inequality is a residual filter, never a theta-join.
  *     Output is manifest-sized: which files rewrite, which are untouched,
  *     and how many tombstones hit each — the input to a copy-on-write
  *     commit that leaves 99.9% of a 100 TB table's files byte-identical.
  */
object Forget {

  /** Surviving rows: `df` minus the rows whose `idCol` appears in
    * `deletes.delCol`. Null ids never match a tombstone (null-safe
    * equality would make a null tombstone delete every null-id row —
    * deletion wants explicit ids only).
    */
  def forget(df: DataFrame, deletes: DataFrame, idCol: String,
      delCol: String): DataFrame =
    df.join(broadcast(deletes.select(col(delCol).as("_del_id")).distinct()),
      col(idCol) === col("_del_id"), "left_anti")

  /** Per-table deletion audit: for each (name, table, idColumn) entry,
    * one row with the total/removed/kept counts and `residual` — the
    * number of tombstoned ids still present AFTER applying [[forget]],
    * which must be 0 (the end-to-end contract a compliance review asks
    * for, checked on the applied output rather than assumed).
    */
  def audit(spark: SparkSession, tables: Seq[(String, DataFrame, String)],
      deletes: DataFrame, delCol: String): DataFrame = {
    val del = deletes.select(col(delCol).as("_del_id")).distinct()
    val audits = tables.map { case (name, df, idCol) =>
      val marked = df.join(broadcast(del), col(idCol) === col("_del_id"), "left")
        .agg(count(lit(1)).as("rows_total"),
          count(col("_del_id")).as("rows_removed"))
        .select(lit(name).as("tbl"), col("rows_total"), col("rows_removed"))
      val residual = forget(df, deletes, idCol, delCol)
        .join(broadcast(del), col(idCol) === col("_del_id"), "left_semi")
        .agg(count(lit(1)).as("residual"))
      marked.crossJoin(residual)
        .select(col("tbl"), col("rows_total"), col("rows_removed"),
          (col("rows_total") - col("rows_removed")).as("rows_kept"),
          col("residual"))
    }
    audits.reduce(_ unionByName _)
  }

  /** Copy-on-write rewrite plan from a file manifest with per-file id
    * ranges (`fileCol`, `minCol`, `maxCol` — the column stats every
    * parquet/Iceberg manifest already carries): one output row per file
    * with `n_tombstones` (delete-list ids falling inside the file's
    * [min, max], an upper bound on actual hits) and `action` —
    * `"rewrite"` when any tombstone lands in range, `"keep"` otherwise.
    *
    * `chunk` is the id-chunk width: a file's range explodes into the
    * chunks it overlaps (in-plan `sequence()`), deletes probe one chunk,
    * and the equi-join on the chunk makes range containment a residual
    * filter. Pick chunk ≈ the median per-file id span so the manifest
    * explosion factor stays ≈ 2.
    */
  def plan(manifest: DataFrame, deletes: DataFrame, fileCol: String,
      minCol: String, maxCol: String, delCol: String, chunk: Long): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    val exploded = manifest
      .select(col(fileCol).as("file"), col(minCol).as("_min"), col(maxCol).as("_max"))
      .filter(col("_max") >= col("_min"))
      .withColumn("_chunk",
        explode(sequence(floor(col("_min") / chunk), floor(col("_max") / chunk))))
    val dels = deletes.select(col(delCol).as("_del_id")).distinct()
      .withColumn("_chunk", floor(col("_del_id") / chunk))
    val hits = dels.join(exploded, Seq("_chunk"))
      .filter(col("_del_id") >= col("_min") && col("_del_id") <= col("_max"))
      .groupBy(col("file")).agg(count(lit(1)).as("n_tombstones"))
    manifest.select(col(fileCol).as("file"), col(minCol).as("min_id"),
        col(maxCol).as("max_id"))
      .join(hits, Seq("file"), "left")
      .select(col("file"), col("min_id"), col("max_id"),
        coalesce(col("n_tombstones"), lit(0L)).as("n_tombstones"),
        when(coalesce(col("n_tombstones"), lit(0L)) > 0, "rewrite")
          .otherwise("keep").as("action"))
  }
}
