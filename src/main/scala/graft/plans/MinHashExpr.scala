package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel invoked from generated code (Janino calls the static
  * forwarder on `graft.plans.MinHashOps`).
  */
object MinHashOps {

  private val Space = UTF8String.fromString(" ")

  /** MinHash LSH band hashes of a token array, in one tight loop —
    * bit-identical to the HOF pipeline
    * `Dedup.bandHashes(Dedup.shingles(text, k), numHashes, bands)`:
    *
    *   - shingle string = k consecutive tokens joined by " ";
    *   - slot j of the signature = min over shingles of Spark's
    *     `xxhash64(shingle, j)`, which decomposes as
    *     `hashInt(j, hashUTF8String(shingle, 42))` — so the kernel hashes
    *     each shingle STRING once and derives all `numHashes` slots with
    *     cheap integer mixes (the HOF re-hashes the full string per slot:
    *     numHashes× more byte traffic);
    *   - band b = `xxhash64(concat_ws(",", slots[b*r .. b*r+r-1]))` — the
    *     decimal rendering matches Spark's long→string cast.
    *
    * Returns null when the token array yields no shingles (< k tokens),
    * like the HOF's empty-signature guard.
    */
  def bandHashes(arr: ArrayData, k: Int, numHashes: Int, bands: Int): ArrayData = {
    val n = arr.numElements()
    val numShingles = n - k + 1
    if (numShingles <= 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < numShingles) {
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val base = XXH64.hashUTF8String(UTF8String.concatWs(Space, parts: _*), 42L)
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s, base)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(r * 21)
      var j = 0
      while (j < r) {
        if (j > 0) sb.append(',')
        sb.append(mins(b * r + j))
        j += 1
      }
      out(b) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for MinHash LSH band hashes of a token array.
  *
  * Exists because the HOF formulation (shingle strings via zip_with chains,
  * then an `aggregate` whose accumulator zip_with re-hashes the FULL shingle
  * string once per signature slot) is interpreted and does numHashes× the
  * necessary byte hashing — it dominated d_dedup_minhash's wall (BENCH r3:
  * 8.5 s, the most expensive query). Semantics are bit-identical to
  * `Dedup.bandHashes(Dedup.shingles(text, k), numHashes, bands)`,
  * cross-checked in PipelineOpsSpec.
  */
case class MinHashBands(child: Expression, k: Int, numHashes: Int, bands: Int)
  extends UnaryExpression {

  require(k >= 1 && numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    "numHashes must divide into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.bandHashes(input.asInstanceOf[ArrayData], k, numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.MinHashOps.bandHashes($c, $k, $numHashes, $bands);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
