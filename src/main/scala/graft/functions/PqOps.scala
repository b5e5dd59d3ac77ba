package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels. The Column form of these —
  * PqM·PqK unrolled element_at/struct expressions per row — exceeded
  * janino's 64 KB method limit ("Code grows beyond 64 KB" at the 10×
  * probe), which silently dropped the whole stage out of codegen; the
  * HOF form before it was interpreted lambdas (the recorded trap). A
  * native expression with the codebook as a broadcast-by-value
  * constructor-side literal keeps the generated code one method call
  * and the arithmetic one tight compiled loop.
  *
  * Both expressions take (q8, flat_codebook, K): the codebook rides in
  * as a FOLDABLE array<array<bigint>> literal of M·K subvectors in
  * (j·K + k) order, materialized once per expression instance; K is a
  * plan-time int literal. Null / out-of-range q8 elements read as 0 —
  * exactly the coalesce(element_at...) semantics of the Column form
  * (and the oracle's SUM-skips-nulls).
  */
abstract class PqKernel extends BinaryExpression {
  def k: Int

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (!okLeft || !okRight) TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects (array<bigint>, array<array<bigint>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"${prettyName} codebook must be a literal")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"${prettyName} K must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** codebook(jk)(d) in (j·K + k) order, materialized once. */
  @transient protected lazy val cb: Array[Array[Long]] = {
    val a = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      val sub = a.getArray(i)
      Array.tabulate(sub.numElements())(d =>
        if (sub.isNullAt(d)) 0L else sub.getLong(d))
    }
  }
  @transient protected lazy val m: Int = cb.length / k
  @transient protected lazy val subLen: Int = if (cb.isEmpty) 0 else cb(0).length

  protected def q8At(arr: ArrayData, idx: Int): Long =
    if (idx < arr.numElements() && !arr.isNullAt(idx)) arr.getLong(idx) else 0L
}

/** `graft_pqencode(q8, cbFlat, K)` → array<bigint> of M codes:
  * codes(j) = argmin_k ‖sub_j − cw_jk‖² (integer L2, tie → min k). */
case class PqEncode(left: Expression, right: Expression, k: Int)
    extends PqKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): GenericArrayData = {
    val codes = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * k
      val off = j * subLen
      var bestD2 = Long.MaxValue
      var bestK = 0L
      var kk = 0
      while (kk < k) {
        val cw = cb(base + kk)
        var d2 = 0L
        var d = 0
        while (d < subLen) {
          val diff = q8At(arr, off + d) - cw(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD2) { bestD2 = d2; bestK = kk.toLong }
        kk += 1
      }
      codes(j) = bestK
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_pqadc(q8, cbFlat, K)` → array<array<bigint>> ADC tables:
  * adc(j)(k) = ⟨sub_j, cw_jk⟩ — scoring a candidate is then M table
  * lookups instead of a dim-length dot. */
case class PqAdcTables(left: Expression, right: Expression, k: Int)
    extends PqKernel {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): GenericArrayData = {
    val tables = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * k
      val off = j * subLen
      val row = new Array[Any](k)
      var kk = 0
      while (kk < k) {
        val cw = cb(base + kk)
        var dot = 0L
        var d = 0
        while (d < subLen) {
          dot += q8At(arr, off + d) * cw(d)
          d += 1
        }
        row(kk) = dot
        kk += 1
      }
      tables(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(tables)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val self = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcTables].getName)
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
