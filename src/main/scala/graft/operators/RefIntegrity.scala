package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential integrity of media references — the table-level analogue of
  * the reference's external `$ref` resolution error "Schema … not found"
  * (`/root/reference/src/schemas/yaml_schema.rs:731-733,806-811`): every
  * `media_ref` in a media span must resolve against the media catalog.
  *
  * Plan shape (scale notes):
  *   - `explode(spans)` is a Generate inside the scan stage — no shuffle;
  *   - project down to `(doc_id, media_ref)` before the join so the shuffle
  *     (if any) carries two string columns, not whole documents;
  *   - LEFT ANTI join: `broadcast(catalog)` when the catalog fits the
  *     broadcast threshold (the common case — catalogs are ~1e6-1e9 refs of
  *     one string column) → zero shuffle of the 100 TB side; otherwise a
  *     shuffled hash anti-join on `media_ref`, where AQE's skew-join split
  *     handles hot refs (a single viral image referenced by billions of
  *     docs) — plus an optional pre-`distinct` path that collapses the probe
  *     side to unique refs first when per-doc attribution isn't needed.
  */
object RefIntegrity {

  /** (doc_id, media_ref) pairs whose media_ref is absent from the catalog. */
  def dangling(docs: DataFrame, catalog: DataFrame,
      broadcastCatalog: Boolean = true): DataFrame = {
    val refs = docs
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media" && col("s.media_ref") =!= "")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
    val cat = catalog.select(col("media_ref"))
    val right = if (broadcastCatalog) broadcast(cat) else cat
    refs.join(right, Seq("media_ref"), "left_anti")
  }

  /** Distinct dangling refs only (cheapest form: probe side collapsed by a
    * partial-agg `distinct` before the anti-join).
    */
  def danglingRefs(docs: DataFrame, catalog: DataFrame,
      broadcastCatalog: Boolean = true): DataFrame = {
    val refs = docs
      .select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media" && col("s.media_ref") =!= "")
      .select(col("s.media_ref").as("media_ref"))
      .distinct()
    val cat = catalog.select(col("media_ref"))
    val right = if (broadcastCatalog) broadcast(cat) else cat
    refs.join(right, Seq("media_ref"), "left_anti")
  }

  /** Violation rows in the engine's standard shape. */
  def violations(docs: DataFrame, catalog: DataFrame,
      broadcastCatalog: Boolean = true): DataFrame =
    dangling(docs, catalog, broadcastCatalog).select(
      col("doc_id"),
      lit("spans").as("path"),
      lit("$ref").as("rule"),
      concat(lit("Schema "), col("media_ref"), lit(" not found")).as("message"))
}
