package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from generated code (scalac emits static
  * forwarders on `graft.plans.SpanOps`, so Janino can call them directly).
  */
object SpanOps {
  private val MEDIA = UTF8String.fromString("media")
  private val TEXT = UTF8String.fromString("text")

  /** `^m-[0-9a-f]{8}$` without a regex engine. */
  def refOk(ref: UTF8String): Boolean = {
    if (ref == null || ref.numBytes() != 10) return false
    if (ref.getByte(0) != 'm' || ref.getByte(1) != '-') return false
    var i = 2
    while (i < 10) {
      val b = ref.getByte(i)
      if (!((b >= '0' && b <= '9') || (b >= 'a' && b <= 'f'))) return false
      i += 1
    }
    true
  }

  /** Per-span scalar checks 1-5 of SpanInvariant (kind enum, media_ref
    * consistency + pattern, text consistency, offset >= 0).
    */
  def spanOk(kind: UTF8String, text: UTF8String, ref: UTF8String, offset: Int): Boolean = {
    if (kind == null || offset < 0) return false
    val isMedia = kind.equals(MEDIA)
    val isText = kind.equals(TEXT)
    if (!isMedia && !isText) return false
    val hasRef = ref != null && ref.numBytes() > 0
    if (isMedia != hasRef) return false
    if (hasRef && !refOk(ref)) return false
    if (isText && (text == null || text.numBytes() == 0)) return false
    true
  }
}

/** Native Catalyst predicate for the north-rule span invariant: one tight
  * loop over the `array<struct>` per row, no intermediate arrays, fully
  * inside whole-stage codegen.
  *
  * Exists because the HOF formulation (`forall`/`zip_with`/`slice` in
  * `SpanInvariant.predCol`) is interpreted (higher-order functions don't
  * participate in codegen) and allocates shifted copies of the span array
  * per row — profiled at ~2× the wall time and visibly worse thread-scaling
  * from the allocation pressure. Semantics are identical (cross-checked in
  * tests against the HOF form): null/short-circuit behavior, empty arrays
  * pass, null spans fail, offsets strictly increasing.
  */
case class SpanInvariantPred(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val kindIdx = elemType.fieldIndex("kind")
  private lazy val textIdx = elemType.fieldIndex("text")
  private lazy val refIdx = elemType.fieldIndex("media_ref")
  private lazy val offIdx = elemType.fieldIndex("offset")
  private lazy val nFields = elemType.size

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return false
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var ok = true
    var prev = Int.MinValue
    var i = 0
    while (ok && i < n) {
      if (arr.isNullAt(i)) ok = false
      else {
        val s = arr.getStruct(i, nFields)
        val kind = if (s.isNullAt(kindIdx)) null else s.getUTF8String(kindIdx)
        val text = if (s.isNullAt(textIdx)) null else s.getUTF8String(textIdx)
        val ref = if (s.isNullAt(refIdx)) null else s.getUTF8String(refIdx)
        val off = if (s.isNullAt(offIdx)) Int.MinValue else s.getInt(offIdx)
        ok = off != Int.MinValue && off > prev && SpanOps.spanOk(kind, text, ref, off)
        prev = off
      }
      i += 1
    }
    ok
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val ok = ctx.freshName("ok")
    val prev = ctx.freshName("prev")
    val s = ctx.freshName("s")
    val k = ctx.freshName("k")
    val t = ctx.freshName("t")
    val r = ctx.freshName("r")
    val off = ctx.freshName("off")
    val utf8 = classOf[UTF8String].getName
    val arrData = classOf[ArrayData].getName
    val row = classOf[InternalRow].getName
    val code =
      code"""
        |${childGen.code}
        |boolean ${ev.value} = false;
        |if (!${childGen.isNull}) {
        |  $arrData $arr = ${childGen.value};
        |  int $n = $arr.numElements();
        |  boolean $ok = true;
        |  int $prev = Integer.MIN_VALUE;
        |  for (int $i = 0; $ok && $i < $n; $i++) {
        |    if ($arr.isNullAt($i)) { $ok = false; break; }
        |    $row $s = $arr.getStruct($i, $nFields);
        |    $utf8 $k = $s.isNullAt($kindIdx) ? null : $s.getUTF8String($kindIdx);
        |    $utf8 $t = $s.isNullAt($textIdx) ? null : $s.getUTF8String($textIdx);
        |    $utf8 $r = $s.isNullAt($refIdx) ? null : $s.getUTF8String($refIdx);
        |    int $off = $s.isNullAt($offIdx) ? Integer.MIN_VALUE : $s.getInt($offIdx);
        |    $ok = $off != Integer.MIN_VALUE && $off > $prev &&
        |      graft.plans.SpanOps.spanOk($k, $t, $r, $off);
        |    $prev = $off;
        |  }
        |  ${ev.value} = $ok;
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanInvariantPred =
    copy(child = newChild)
}
