package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two double arrays in
  * a single fused loop (dot + both norms), with whole-stage codegen.
  *
  * This is the engine-grade fast path for SimilarityOps (which otherwise
  * composes zip_with/aggregate HOFs — 3 array traversals and lambda
  * call overhead per row). Same sequential fold order, so results are
  * bit-identical to the HOF version and share its oracle.
  *
  * Either side may be array<float> (round-18): each element is widened
  * to double inside the loop — float→double is exact in IEEE-754, so
  * the fold is bit-identical to casting the whole array up front, while
  * the row that crosses the shuffle stays at 4 bytes/element (guide
  * §2.3 — narrower types halve the exchange) and no per-comparison
  * double-array copy is allocated.
  *
  * Registered for SQL as `cosine_sim` via [[graft.GraftExtensions]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<double>/array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = isFloat(left)
    val bf = isFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, left)};
         |  double $y = ${get(b, right)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ xᵢ² of a float/double array, accumulated in the EXACT fold order
  * of [[CosineSimilarity]]'s fused loop (left-to-right, double adds,
  * float elements widened exactly) — so
  * `CosineDotPre(a, b, VecNorm2(a), VecNorm2(b)) ≡ CosineSimilarity(a, b)`
  * bit-for-bit whenever a and b have the SAME length (the fused loop
  * folds norms over min(|a|,|b|); callers pair fixed-dimension vectors
  * of one table, where the lengths are equal by construction —
  * CosineKernelSpec pins the equivalence). Null elements contribute
  * the storage value the fused loop also reads (0 in unsafe rows).
  *
  * Registered for SQL as `graft_vnorm2`. */
case class VecNorm2(child: Expression) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vnorm2 expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = isFloat
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $get; $s += $x * $x; }
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PRE-NORMALIZED cosine: dot(a, b) / (√na2 · √nb2) with the two
  * squared norms PRECOMPUTED per vector ([[VecNorm2]]) instead of
  * re-accumulated per pair — the all-pairs tile join evaluates one
  * kernel per CANDIDATE PAIR, so folding norms there cost 3× the
  * flops of the dot alone (round-18, guide §1.2 per-task work). The
  * dot fold is the same left-to-right double accumulation as
  * [[CosineSimilarity]]'s (its dot/na/nb accumulators never interact
  * inside the loop), so for equal-length inputs the result is
  * BIT-IDENTICAL (CosineKernelSpec). Registered as `graft_cosine_pre`. */
case class CosineDotPre(a: Expression, b: Expression,
    na2: Expression, nb2: Expression) extends QuaternaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = na2
  override def fourth: Expression = nb2

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = Seq(a, b).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    val normOk = Seq(na2, nb2).forall(_.dataType == DoubleType)
    if (arrOk && normOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_cosine_pre expects (array<float|double>, array<float|double>, " +
        s"double, double), got (${a.dataType.simpleString}, " +
        s"${b.dataType.simpleString}, ${na2.dataType.simpleString}, " +
        s"${nb2.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any, n1: Any, n2: Any): Any = {
    val av = l.asInstanceOf[ArrayData]
    val bv = r.asInstanceOf[ArrayData]
    val af = isFloat(a)
    val bf = isFloat(b)
    val n = math.min(av.numElements(), bv.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (bf) bv.getFloat(i).toDouble else bv.getDouble(i)
      dot += x * y
      i += 1
    }
    dot / (math.sqrt(n1.asInstanceOf[Double]) * math.sqrt(n2.asInstanceOf[Double]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, n1, n2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($av.numElements(), $bv.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${get(av, a)} * ${get(bv, b)};
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($n1) * java.lang.Math.sqrt($n2));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(a = newFirst, b = newSecond, na2 = newThird, nb2 = newFourth)
}

// Column-API access goes through the function registry
// (GraftExtensions.register + functions.call_function("cosine_sim", ...)):
// the Column<->Expression bridge (classic.ExpressionUtils) is private[sql].
