package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: number of positions where two long
  * arrays agree — the MinHash signature-agreement count behind every
  * est-Jaccard in the fuzzy-dedup family. The HOF form
  * (`aggregate(zip_with(a, b, eq), 0, +)`) runs interpreted lambdas
  * with two intermediate arrays per CANDIDATE PAIR (the widest row
  * count in the LSH pipelines); this is one fused compiled loop with
  * zero allocation. Identical arithmetic: positions beyond the shorter
  * array count 0, exactly like zip_with's null padding under
  * `when(x === y, 1).otherwise(0)` — and in practice both signatures
  * have the fixed permutation-family length. NULL ELEMENTS (possible
  * for SQL callers — the type check accepts containsNull arrays) also
  * count 0, again matching the HOF form where `null === y` is null and
  * falls to `otherwise(0)`; the guards are branch-predicted no-ops on
  * the engine's own null-free signature arrays.
  *
  * Registered for SQL as `graft_sigmatch` via
  * [[graft.GraftExtensions]].
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sigmatch expects array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
