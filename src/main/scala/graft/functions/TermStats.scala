package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst generator: per-document DISTINCT (tok, cnt) pairs
  * of the space-split text — `graft_tokcounts(text)` → rows of
  * (tok string, cnt bigint).
  *
  * This is the map-side pre-aggregation the retrieval statistics
  * (TF-IDF's tf/df passes) were paying the shuffle-input price for:
  * `explode(split(text, ' '))` emits EVERY token occurrence (Σ tokens
  * rows through the aggregate's partial hash map, plus a materialized
  * UTF8String array per doc), where the downstream statistics only
  * need per-document counts. One byte-walk per document builds a
  * token→count map and emits |distinct tokens| rows — 3-5× fewer on
  * natural text — from which tf = SUM(cnt) and df = COUNT(*) per doc
  * both derive exactly (split semantics match `split(text, ' ')` with
  * Spark's keep-empty-strings behavior, so the aggregate equalities
  * are byte-exact, asserted in RetrievalSpec/TwinAgreementSpec).
  *
  * Registered for SQL as `graft_tokcounts` via
  * [[graft.GraftExtensions]]. */
case class TokenCountsGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokcounts expects a string, got ${child.dataType.simpleString}")

  override def elementSchema: StructType = StructType(
    StructField("tok", StringType, nullable = false) ::
    StructField("cnt", LongType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val b = v.asInstanceOf[UTF8String].getBytes
      // LinkedHashMap: deterministic first-seen emit order (order is
      // aggregated away downstream, but stable output aids debugging)
      val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
      var start = 0
      var i = 0
      while (i <= b.length) {
        if (i == b.length || b(i) == ' ') {
          val tok = UTF8String.fromBytes(b, start, i - start)
          val c = m.get(tok)
          if (c == null) m.put(tok, Array(1L)) else c(0) += 1L
          start = i + 1
        }
        i += 1
      }
      val it = m.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          InternalRow(e.getKey, e.getValue()(0))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: the whitespace token count —
  * `graft_tokcount(text)` → int = (number of 0x20 bytes) + 1, the
  * single-spaced-documents convention every text operator shares
  * (Exprs.tokenCount). The column form it replaces,
  * `length(text) − length(translate(text, ' ', '')) + 1`, ALLOCATES a
  * full space-stripped copy of the text per evaluation — and the
  * quality-gate expressions reference the count several times across
  * Filter and Project operators (codegen CSE dedupes within an
  * operator, not across), so a curation pass was paying several full
  * text copies per document. This is one zero-alloc byte scan
  * (a space is one UTF-8 byte, so byte count ≡ char count exactly);
  * null text → null, like length(null). */
case class SpaceTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokcount expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  /** Public so generated code can call it via an expression ref. */
  def count(text: UTF8String): Int = {
    val b = text.getBytes
    var spaces = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == ' ') spaces += 1
      i += 1
    }
    spaces + 1
  }

  override def nullSafeEval(t: Any): Any =
    count(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("tokCounter", this,
        classOf[SpaceTokenCount].getName)
      s"${ev.value} = $ref.count($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst generator: per-document DISTINCT 3-gram shingle
  * HASHES — `graft_shingles_h(text, n)` → rows of (h bigint), one per
  * distinct n-token shingle, xxhash64 (seed 42, the builtin's seed) of
  * the space-joined window; null text emits ONE null-h row so callers
  * keep explode_outer's keep-the-doc semantics without an outer
  * generate.
  *
  * This is the HASH-CURRENCY form of `explode(graft_shingles(text, n))`
  * for the contamination probes (doc_contamination, pipeline_curate's
  * flags): the string form materializes every distinct shingle as a
  * UTF8String, ships it through the broadcast hash probe, and hashes
  * it there anyway — this form hashes each window in place (one
  * StringBuilder reused per window, zero UTF8String allocation, a
  * long-keyed distinct set) and the probe joins 8-byte longs against
  * an 8-byte broadcast set. Lookups by hash equal lookups by shingle
  * (the bigram-LM join-currency convention: a 2⁻⁶⁴ collision is the
  * same accepted odds as every hash-keyed dedup in this engine), so
  * overlap counts are unchanged and the DuckDB oracles — which replay
  * the string form — stay hash-green. Window semantics are
  * [[TokenGrams.foreachWindow]]'s, identical to `graft_shingles`
  * (distinct by first occurrence, always ≥1 window). */
case class TokenShinglesHashedGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles_h expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, n=$n")

  override def elementSchema: StructType = StructType(
    StructField("h", LongType, nullable = true) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.single(InternalRow(null))
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      val seen = new java.util.LinkedHashSet[java.lang.Long]
      TokenGrams.foreachWindow(toks, n, 1, toks.length - n)(s =>
        seen.add(XXH64.hashUTF8String(UTF8String.fromString(s), 42L)))
      val it = seen.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = InternalRow(it.next().longValue())
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: per-document length + query-term
  * frequencies in ONE byte scan — `graft_qterms(text, terms)` →
  * array<bigint> of [dl, tf(terms[0]), tf(terms[1]), …] where dl is
  * the whitespace token count (spaces + 1, the Exprs.tokenCount
  * convention) and tf(t) counts space-split tokens byte-equal to t.
  *
  * The column form BM25 used — `split` once plus one
  * `size(filter(toks, _ === t))` HOF per query term — materializes a
  * UTF8String array per document and re-walks it per term with an
  * interpreted lambda; this walks the text bytes once, comparing each
  * token span against the (foldable) term list with zero allocation.
  * Byte-equal to the HOF form on any input (empty tokens from
  * non-contract space runs match only an empty query term, which no
  * caller passes); asserted against the column form in BpeSpec's
  * retrieval sibling. `terms` must be a foldable array<string> —
  * enforced by the type check, decoded once per expression instance.
  */
case class QueryTermCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_qterms expects a foldable term list")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_qterms expects (string, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val termBytes: Array[Array[Byte]] = {
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    require(arr != null, "graft_qterms: term list must be non-null")
    Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).getBytes.clone())
  }

  /** Public so generated code can call it via an expression ref. */
  def counts(text: UTF8String): ArrayData = {
    val b = text.getBytes
    val t = termBytes
    val out = new Array[Long](t.length + 1)
    var spaces = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        if (i < b.length) spaces += 1
        val len = i - start
        var k = 0
        while (k < t.length) {
          val tb = t(k)
          if (tb.length == len) {
            var j = 0
            var eq = true
            while (eq && j < len) {
              if (b(start + j) != tb(j)) eq = false
              j += 1
            }
            if (eq) out(k + 1) += 1
          }
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    out(0) = spaces + 1
    new GenericArrayData(out)
  }

  override def nullSafeEval(t: Any, m: Any): Any =
    counts(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val ref = ctx.addReferenceObj("qtermCounter", this,
        classOf[QueryTermCounts].getName)
      s"${ev.value} = $ref.counts($t);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
