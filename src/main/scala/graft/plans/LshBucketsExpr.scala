package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernel invoked from generated code (the [[MinHashOps]] pattern). */
object LshBucketsOps {

  /** Plane matrices are data-independent constants (xxhash64 of
    * (table, plane, dim), the [[graft.operators.Similarity]] derivation);
    * cache them per (nPlanes, dims, nTables) so each task computes them
    * once, not once per row.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(nPlanes: Int, dims: Int, nTables: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dims, nTables), { _ =>
      // row t*nPlanes+p = the plane-p components for table t
      val m = new Array[Array[Double]](nTables * nPlanes)
      var t = 0
      while (t < nTables) {
        var p = 0
        while (p < nPlanes) {
          val row = new Array[Double](dims)
          var d = 0
          while (d < dims) {
            val h = XXH64.hashInt(d, XXH64.hashInt(p, XXH64.hashInt(t, 42L)))
            val mm = ((h % 2001L) + 2001L) % 2001L
            row(d) = (mm.toDouble - 1000.0) / 1000.0
            d += 1
          }
          m(t * nPlanes + p) = row
          p += 1
        }
        t += 1
      }
      m
    })

  /** All `nTables` sign-bit LSH bucket ids of one double vector in one
    * tight loop — bit-identical to `Similarity.lshBucket` per table (same
    * plane constants, same left-to-right FP accumulation over dims), which
    * evaluated nTables interpreted `aggregate`/`zip_with` trees per row,
    * each allocating a boxed dims-array per plane.
    */
  def buckets(vec: ArrayData, dims: Int, nPlanes: Int, nTables: Int): ArrayData = {
    if (vec.numElements() != dims) return null
    val m = planes(nPlanes, dims, nTables)
    val v = new Array[Double](dims)
    var d = 0
    while (d < dims) { v(d) = vec.getDouble(d); d += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = 0L
      var p = 0
      while (p < nPlanes) {
        val row = m(t * nPlanes + p)
        var proj = 0.0
        var i = 0
        while (i < dims) { proj += v(i) * row(i); i += 1 }
        if (proj >= 0) acc |= (1L << p)
        p += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for all-tables LSH bucket ids of a double
  * vector. Exists because the HOF formulation (one interpreted
  * `aggregate(zip_with(...))` per (table, plane)) allocated
  * nTables×nPlanes boxed arrays per row and dominated the LSH index build
  * (s_ann_lsh). Semantics are bit-identical per table to
  * `Similarity.lshBucket` / `lshBucketScala` (cross-checked in
  * PipelineOpsSpec).
  */
case class LshBuckets(child: Expression, dims: Int, nPlanes: Int, nTables: Int)
  extends UnaryExpression {

  require(dims >= 1 && nPlanes >= 1 && nPlanes <= 63 && nTables >= 1,
    "bad LSH geometry")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    LshBucketsOps.buckets(input.asInstanceOf[ArrayData], dims, nPlanes, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.LshBucketsOps.buckets($c, $dims, $nPlanes, $nTables);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
