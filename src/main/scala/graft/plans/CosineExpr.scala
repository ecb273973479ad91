package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static kernel invoked from generated code. */
object CosineOps {

  /** Cosine similarity of two double arrays in one fused loop —
    * bit-identical to the HOF formulation
    * `dot(a,b) / (sqrt(Σa²)·sqrt(Σb²))` with left-to-right accumulation
    * (same multiply/add sequence, same sqrt/divide), 0.0 when either norm
    * is 0, null on length mismatch or null elements (exactly where the
    * zip_with/aggregate chain nulls out).
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val norm = math.sqrt(na) * math.sqrt(nb)
    if (norm == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / norm)
  }
}

/** Native Catalyst expression for cosine similarity over `array<double>`.
  *
  * Exists because the HOF formulation (a `zip_with` product array + three
  * `aggregate` folds per evaluation) is interpreted — and cosine runs in
  * the hottest inner loops of the similarity subsystem: once per candidate
  * PAIR in near-dup verification and once per (row, centroid) in IVF
  * assignment/training. Bit-identical to the HOF form (cross-checked in
  * PipelineOpsSpec; the IVF/ANN oracles also pin it, since assignment
  * argmaxes compare unrounded doubles).
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = CosineOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""
        java.lang.Double $tmp = graft.plans.CosineOps.cosine($a, $b);
        ${ev.isNull} = ($tmp == null);
        ${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}
