package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static kernel invoked from generated code (the [[MinHashOps]] pattern). */
object QuantizeInt8Ops {

  /** Symmetric int8 quantization of a double vector in one pass —
    * IEEE-identical to the HOF pipeline in `Similarity.quantizeInt8`
    * (scale = left-to-right max of |x|; q = floor(x / scale * 127.0 + 0.5)
    * as int; all-zero vector quantizes to zeros with scale 0). Returns a
    * struct(scale double, qvec array<int>).
    */
  def quantize(vec: ArrayData, isFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var scale = 0.0
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val a = math.abs(v(i))
      // NaN ordering matches Spark's greatest (NaN sorts above any double)
      if (a > scale || java.lang.Double.isNaN(a)) scale = a
      i += 1
    }
    val q = new Array[Int](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(v(i) / scale * 127.0 + 0.5).toInt
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(q))
  }
}

/** Native Catalyst expression for symmetric int8 vector quantization.
  *
  * Exists because the HOF formulation (an interpreted max-abs `aggregate`
  * plus a per-element `transform` with a branch per value) dominated the
  * quantized-serving queries. Semantics are IEEE-identical to
  * `Similarity.quantizeInt8`'s column pipeline (cross-checked in
  * PipelineOpsSpec).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  // the kernel reads float or double elements natively — no cast pass
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    QuantizeInt8Ops.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.QuantizeInt8Ops.quantize($c, $isFloat);
    """)

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}
