package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static helper invoked from generated code (Janino calls the static
  * forwarder on `graft.plans.SimHashOps`).
  */
object SimHashOps {

  /** 64-bit SimHash over a token array: per-token xxhash64 (Spark's XXH64,
    * seed 42 — bit-identical to the `xxhash64` SQL function), per-bit ±1
    * votes, bit set where votes > 0. Single tight loop, one 64-int
    * scratch array per row.
    */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Native Catalyst expression for the 64-bit SimHash signature of a token
  * array.
  *
  * Exists because the HOF formulation (`aggregate` over tokens with a
  * 64-element `zip_with` vote accumulator per token) is interpreted —
  * higher-order functions don't participate in codegen — and allocates a
  * fresh 64-element array per (token, row). Semantics are bit-identical to
  * the HOF form (same per-token `xxhash64` seed-42 hash, same ±1 votes,
  * same bit fold), cross-checked in PipelineOpsSpec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashOps.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashOps.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
