package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst forms of the text-chunking primitives that the HOF
  * (`transform`/`sequence`/`slice`) versions in
  * [[graft.operators.TextOps]] express interpretively.
  *
  * Why native: higher-order functions are CodegenFallback with a full
  * interpreted expression-tree evaluation PER ARRAY ELEMENT (sequence →
  * slice → concat_ws for every chunk/shingle of every doc). These
  * expressions do the same work in one flat Scala pass per row —
  * [[TokenChunksGen]] is the engine-grade `Generator` (SURVEY §2.10 X3:
  * the reference's task-generator plugin re-expressed as a UDTF) and
  * [[TokenShingles]] a scalar array expression that stays inside
  * whole-stage codegen via a single static-shaped call.
  *
  * Semantics are BIT-IDENTICAL to the HOF forms on NON-NULL text
  * (asserted by TokenGramsSpec): token split is `split(text, " ", -1)`
  * (trailing empties kept), chunk i covers tokens [i·w, i·w+w), the
  * last chunk may be short, an empty/short text yields one (possibly
  * empty) chunk — matching `sequence(0, greatest(size-1, 0), w)` +
  * `slice` + `concat_ws(" ", …)`; shingles are every n-token window
  * (short docs → the whole text), first-occurrence-distinct like
  * `array_distinct`.
  *
  * NULL text: the native forms are uniformly null-strict — scalar
  * expressions return NULL, the generator emits no rows. The HOF
  * forms were NOT uniform there (chunks10(NULL) = [""] because
  * concat_ws swallows the NULL slice, while the aggregate signature
  * pipelines DROPPED null-text docs at the explode), so null-strict is
  * the one consistent semantic. TokenGramsSpec pins both behaviors
  * explicitly and asserts the documents fixture carries no NULL text,
  * which is what keeps every oracle hash green across the swap.
  *
  * Registered for SQL/Column use as `graft_chunks(text, w)` (generator)
  * and `graft_shingles(text, n)` via [[graft.GraftExtensions]].
  */
object TokenGrams {

  /** The ONE canonical window walk every native token-gram form shares
    * (chunks, shingles, shingle count, minhash — TokenChunksGen's
    * streaming iterator mirrors it and is the only other copy): visit
    * the space-joined token window starting at 0, step, 2·step, …,
    * while the start ≤ `lastStart` — and ALWAYS the window at 0, the
    * at-least-one-window invariant the HOF forms encode via
    * `sequence(0, greatest(lastStart, 0), step)`. The window may run
    * short at the end of the doc. */
  private[functions] def foreachWindow(
      toks: Array[String], width: Int, step: Int, lastStart: Int)(
      f: String => Unit): Unit = {
    val sz = toks.length
    var i = 0
    while (i == 0 || i <= lastStart) {
      val hi = math.min(i + width, sz)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < hi) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      f(sb.toString)
      i += step
    }
  }

  /** One pass over the split tokens: emit `width`-token chunks
    * (windows at 0, w, 2w, … while the start is a valid index). */
  def chunks(text: UTF8String, width: Int): Array[UTF8String] = {
    val toks = text.toString.split(" ", -1)
    val out = Array.newBuilder[UTF8String]
    foreachWindow(toks, width, width, toks.length - 1)(
      s => out += UTF8String.fromString(s))
    out.result()
  }

  /** One pass: distinct n-token shingles in first-occurrence order. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]
    foreachWindow(toks, n, 1, toks.length - n)(s => seen.add(s))
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Generator (UDTF) form: `graft_chunks(text, w)` explodes a document
  * into its w-token chunks without materializing the intermediate
  * array. Iterator-streamed — a 1 GB document streams its chunks row
  * by row instead of building a 100M-element array first.
  */
case class TokenChunksGen(child: Expression, width: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && width > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_chunks expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, width=$width")

  override def elementSchema: StructType =
    StructType(StructField("chunk", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      val n = toks.length
      new Iterator[InternalRow] {
        private var i = 0
        private var first = true
        override def hasNext: Boolean = first || i <= n - 1
        override def next(): InternalRow = {
          first = false
          val hi = math.min(i + width, n)
          val sb = new java.lang.StringBuilder
          var j = i
          while (j < hi) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          i += width
          InternalRow(UTF8String.fromString(sb.toString))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[TokenChunksGen]] with the chunk's starting TOKEN OFFSET alongside
  * (`graft_chunks_pos(text, w)` → rows (pos, chunk), pos = 0, w, 2w…):
  * the re-assembly key for operators that strip/reorder chunks and
  * must rebuild the document in original order (boilerplate_strip_text
  * sorts surviving chunks by pos). Same streaming iterator — no
  * intermediate array. */
case class TokenChunksPosGen(child: Expression, width: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && width > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_chunks_pos expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, width=$width")

  override def elementSchema: StructType =
    StructType(StructField("pos", IntegerType, nullable = false) ::
      StructField("chunk", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      val n = toks.length
      new Iterator[InternalRow] {
        private var i = 0
        private var first = true
        override def hasNext: Boolean = first || i <= n - 1
        override def next(): InternalRow = {
          first = false
          val hi = math.min(i + width, n)
          val sb = new java.lang.StringBuilder
          var j = i
          while (j < hi) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          val at = i
          i += width
          InternalRow(at, UTF8String.fromString(sb.toString))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Generator form of full-length n-gram INSTANCES, non-distinct and in
  * document order: `graft_ngrams(text, n)`. The repetition-rule
  * currency ([[graft.operators.TextOps.gopherRepetition]] counts
  * occurrence multiplicity, which the LinkedHashSet-deduped
  * [[TokenShingles]] array cannot carry). Emits nothing for docs
  * shorter than n tokens — full windows only, matching the
  * `range(0, len - n + 1)` construction the DuckDB oracle uses.
  * Iterator-streamed like [[TokenChunksGen]]: no intermediate array.
  */
case class TokenNGramsGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, n=$n")

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      val last = toks.length - n
      if (last < 0) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= last
        override def next(): InternalRow = {
          val sb = new java.lang.StringBuilder
          var j = i
          while (j < i + n) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          i += 1
          InternalRow(UTF8String.fromString(sb.toString))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of distinct n-token shingles WITHOUT materializing them:
  * the optimizer-rule target for `size(graft_shingles(text, n))`
  * ([[graft.GraftExtensions]] injects the rewrite). Counting needs only
  * a hash-set membership probe per window — no UTF8String array, no
  * GenericArrayData; the set holds xxhash64 of each window (a 2⁻⁶⁴
  * collision would undercount by 1 — the same accepted odds as every
  * hash-keyed dedup in this engine). Returns IntegerType to slot
  * exactly where `size(...)` stood.
  */
case class ShingleCount(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_count expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_shingle_count"

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Int = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[java.lang.Long]
    TokenGrams.foreachWindow(toks, n, 1, toks.length - n)(s =>
      seen.add(XXH64.hashUTF8String(UTF8String.fromString(s), 7L)))
    seen.size
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("shingleCount", this, classOf[ShingleCount].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash of a document: `graft_simhash64(text)`.
  *
  * Bit b of the result is set iff more than half the doc's
  * space-separated tokens have bit b set in their xxhash64 — identical
  * to the aggregate formulation (explode tokens → 64 per-bit sums →
  * majority vote; kept as [[graft.operators.SimilarityOps
  * .simhashesAgg]], the spec-pinned comparison pair). Token hashes use
  * the same XXH64 core as the `xxhash64` builtin (seed 42), so the two
  * forms are bit-identical.
  *
  * Why native: the aggregate form shuffles one row PER TOKEN into a
  * 65-column hash aggregate — at 100 TB that is a corpus-sized shuffle
  * just to build signatures. This form computes the signature inside
  * the scan projection (one flat pass per doc, 64 int counters on the
  * stack); the only shuffle left in simhash dedup is the banded
  * candidate join itself.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      var b = 0
      while (b < 64) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 63
    while (b >= 0) {
      sim = (sim << 1) | (if (2 * ones(b) > n) 1L else 0L)
      b -= 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native rolling polynomial fingerprint: `graft_rollfp(text)` —
  * h = (h·31 + codepoint) mod 1e9+7 folded left to right over the
  * characters, identical to the `aggregate(split(text,""), …)` HOF
  * form it replaces ([[graft.operators.TextOps.fingerprintRollingHof]],
  * the spec-pinned comparison pair) and to TokenGramsSpec's Scala
  * reference fold. The HOF form built one single-char UTF8String per
  * character and ran an interpreted pmod expression per step; this is
  * one flat loop over the string's chars.
  */
case class RollingFp(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  private val Prime = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rollfp expects string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_rollfp"

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    // Fold CODEPOINTS, not UTF-16 code units: the HOF comparison pair
    // splits into per-character strings (Java regex "" split keeps
    // surrogate pairs whole) and hashes ascii() = codePointAt(0), so an
    // astral-plane char must contribute ONE step here too, or the two
    // forms diverge on any non-BMP text (emoji are routine in web
    // corpora).
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = ((h * 31 + cp) % Prime + Prime) % Prime
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("rollfp", this, classOf[RollingFp].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature: `graft_minhash(text, perms)` → array of
  * `perms` permutation minima over the doc's distinct non-empty word
  * 3-shingles.
  *
  * Hash arithmetic is EXACTLY the composed builtin pipeline it replaces
  * (kept as [[graft.operators.SimilarityOps.minhashSignaturesAgg]], the
  * spec-pinned comparison pair): shingle hash h = xxhash64(shingle) =
  * XXH64.hashUTF8String(s, 42); permutation-i variant = xxhash64(h, i)
  * = hashInt(i, hashLong(h, 42)) — the builtin folds children left to
  * right from seed 42. A doc with no non-empty shingles returns NULL
  * (the aggregate form dropped such docs; callers filter nulls).
  *
  * Why native: the aggregate form shuffled one row per (doc, shingle)
  * into a 32-column min aggregate — a corpus-sized shuffle just to
  * build signatures. This computes them inside the scan projection;
  * minhash dedup's only shuffle left is the banded LSH join.
  */
case class MinHashSig(child: Expression, perms: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && perms > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, perms=$perms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]
    val mins = Array.fill(perms)(Long.MaxValue)
    var any = false
    // same canonical walk as TokenGrams.shingles (n = 3), skipping ""
    TokenGrams.foreachWindow(toks, 3, 1, toks.length - 3) { s =>
      if (s.nonEmpty && seen.add(s)) {
        any = true
        val h = XXH64.hashUTF8String(UTF8String.fromString(s), 42L)
        val hl = XXH64.hashLong(h, 42L)
        var p = 0
        while (p < perms) {
          val v = XXH64.hashInt(p, hl)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
    }
    if (!any) null else new GenericArrayData(mins.map(Long.box(_): AnyRef))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
      s"""
         |${ev.value} = $self.compute($t);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native poly-MinHash signature: `graft_polyminhash(text, perms)` →
  * array of `perms` permutation minima over the doc's word-3-shingle
  * POLYNOMIAL hashes — the DuckDB-reproducible twin of
  * [[MinHashSig]], and the codegen replacement for the nested-HOF
  * Column pipeline (kept as
  * [[graft.operators.SimilarityOps.withPolySignatureHof]], the
  * spec-pinned bit-identity comparison pair — PolyDedupSpec).
  *
  * Arithmetic is EXACTLY the HOF/oracle form: word hash = rollfp
  * codepoint fold mod 1e9+7; shingle j = Horner combine of words
  * j..j+2; permutation i = (h·a_i + 7919·i) mod p with
  * a_i = (2i+1)·2654435761 mod p (large multipliers — see the
  * order-correlation note in SimilarityOps; every product stays
  * < 1.1e18, exact in 64-bit). Docs with < 3 words return NULL
  * (the HOF form filtered them; callers filter nulls).
  *
  * Why native: the HOF form ran 16 interpreted lambda evaluations per
  * shingle (measured ~3.5 s of the 4 s sf0.1 fuzzy-family queries);
  * this is one flat loop inside the scan projection.
  */
case class PolyMinHashSig(child: Expression, perms: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  private val Prime = 1000000007L
  @transient private lazy val mults: Array[Long] =
    Array.tabulate(perms)(i => (2L * i + 1) * 2654435761L % Prime)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && perms > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyminhash expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, perms=$perms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): ArrayData = {
    // limit -1 keeps empty tokens exactly like the Column split(" ")
    // the HOF form maps over (rollfp("") = 0 participates in shingles)
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    if (n < 3) return null
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks(i)
      var h = 0L
      var k = 0
      while (k < s.length) { // codepoint fold, same as RollingFp
        val cp = s.codePointAt(k)
        h = ((h * 31 + cp) % Prime + Prime) % Prime
        k += Character.charCount(cp)
      }
      wh(i) = h
      i += 1
    }
    val mins = Array.fill(perms)(Long.MaxValue)
    var j = 0
    while (j <= n - 3) {
      val sh = ((wh(j) * 31 + wh(j + 1)) % Prime * 31 + wh(j + 2)) % Prime
      var p = 0
      while (p < perms) {
        val v = (sh * mults(p) + 7919L * p) % Prime
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(Long.box(_): AnyRef))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("polyminhash", this, classOf[PolyMinHashSig].getName)
      s"""
         |${ev.value} = $self.compute($t);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 30-bit poly SimHash: `graft_polysimhash(text)` — bit b is
  * set iff a MAJORITY of the doc's word poly-hashes (rollfp codepoint
  * fold mod 1e9+7, one per whitespace token including empties) have
  * bit b set. The DuckDB-reproducible twin of [[SimHash64]] and the
  * codegen replacement for the nested-aggregate HOF Column form (kept
  * as [[graft.operators.SimilarityOps.simhashPolyHof]], the
  * bit-identity comparison pair — that form ran 30 interpreted lambda
  * folds over the word array per document).
  */
case class PolySimHash(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  private val Prime = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polysimhash expects string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_polysimhash"

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](30)
    var i = 0
    while (i < toks.length) {
      val s = toks(i)
      var h = 0L
      var k = 0
      while (k < s.length) { // codepoint fold, same as RollingFp
        val cp = s.codePointAt(k)
        h = ((h * 31 + cp) % Prime + Prime) % Prime
        k += Character.charCount(cp)
      }
      var b = 0
      while (b < 30) {
        counts(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 30) {
      if (2L * counts(b) > toks.length) sim |= 1L << b
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("polysimhash", this, classOf[PolySimHash].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WIDE (126-bit) polynomial SimHash: `graft_polysimhash_wide(text)` →
  * array<bigint> of NINE 14-bit chunk values (bits 14c…14c+13 of the
  * signature; hamming(a, b) = Σ_c bit_count(a_c xor b_c) since chunks
  * partition the bits).
  *
  * Purpose (round-13): the 64-bit simhash's pigeonhole bucket universe
  * is FIXED at 9 bands × ≤2⁷ chunk values × |sources| — CellProbe
  * measured Σc² growing 53× per 10× data on the hard scale fixture
  * even with linear output, because candidate enumeration in a fixed
  * key space is inherently quadratic. Widening the signature is THE
  * structural mitigation: 9 chunks of 14 bits give a 2⁷× larger chunk
  * universe at the same ≤8 Hamming radius guarantee (9 disjoint chunks
  * cover all 126 bits, so radius-8 pairs still collide on ≥1 chunk —
  * pigeonhole exactly tight at r+1 = 9), collapsing bucket populations
  * back to near-singleton at corpus scale. Note the RADIUS SEMANTICS
  * shift: ≤8 of 126 bits (~6.3%) is a tighter similarity gate than ≤8
  * of 64 (12.5%) — this is the scale CONFIGURATION of the operator,
  * not a drop-in replacement.
  *
  * Bit construction keeps the [[PolySimHash]] one-definition-two-
  * dialects contract: token hash h = the same 31-poly codepoint fold
  * mod 1e9+7, bit b of the signature votes with
  * ((h·(40503·(2b+3)) + b) mod 1e9+7) & 1 — derived bits from one
  * token hash (multipliers ≤ ~1e7, so h·m ≤ ~1e16: no 64-bit
  * overflow, plain % on nonnegative operands agrees across engines).
  * Tokens colliding in h collide in every bit — the same accepted
  * property the 30-bit poly twin has.
  */
case class PolySimHashWide(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}

  private val Prime = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polysimhash_wide expects string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_polysimhash_wide"

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](126)
    var i = 0
    while (i < toks.length) {
      val s = toks(i)
      var h = 0L
      var k = 0
      while (k < s.length) { // codepoint fold, same as PolySimHash
        val cp = s.codePointAt(k)
        h = ((h * 31 + cp) % Prime + Prime) % Prime
        k += Character.charCount(cp)
      }
      var b = 0
      while (b < 126) {
        if (((h * (40503L * (2L * b + 3)) + b) % Prime & 1L) == 1L)
          counts(b) += 1
        b += 1
      }
      i += 1
    }
    val chunks = new Array[Long](9)
    var b = 0
    while (b < 126) {
      if (2L * counts(b) > toks.length) chunks(b / 14) |= 1L << (b % 14)
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(chunks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("polysimhashwide", this,
        classOf[PolySimHashWide].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar array form: `graft_shingles(text, n)` → distinct n-token
  * shingles. Stays inside whole-stage codegen (single call per row into
  * the flat Scala pass — no per-element interpreted lambda).
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (string, positive int literal), got " +
        s"${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    TokenGrams.shingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("tokenShingles", this, classOf[TokenShingles].getName)
      s"${ev.value} = $self.compute($t);"
    })

  /** Codegen entry point (must be public and ArrayData-typed). */
  def compute(t: UTF8String): ArrayData = TokenGrams.shingles(t, n)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native deflate-compression ratio: `graft_zratio(text)` → compressed
  * size × 1000 / raw size (integer millis; empty text → 0, i.e.
  * maximally redundant, so a low-ratio quality gate REJECTS empty
  * docs — the prose-like end of the scale must never be reachable by
  * definitively-junk input). The Gopher/FineWeb-family redundancy
  * signal: looping or boilerplate text compresses far below natural
  * prose, so a LOW ratio flags
  * low-quality documents — complementary to the shingle-based
  * [[graft.operators.TextOps.repetitionRatio]] (which sees only
  * 3-token-exact repeats; deflate sees long-range and sub-token
  * redundancy).
  *
  * zlib level 6 raw deflate via the JDK's bundled java.util.zip — no
  * external libs. Only the SIZE is computed: compressed output is
  * discarded buffer-by-buffer through one per-thread 8 KiB scratch
  * array, and the Deflater (native zlib state) is reused via
  * ThreadLocal — per-row allocation would thrash native memory at
  * corpus scale. Not oracle-checkable (DuckDB ships no compression
  * primitive); TokenGramsSpec pins determinism, bounds, and the
  * repetitive ≪ prose ordering.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zratio expects string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_zratio"

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    if (bytes.length == 0) 0L
    else {
      val d = CompressionRatio.deflaters.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = CompressionRatio.scratch.get()
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total * 1000L / bytes.length
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("zratio", this, classOf[CompressionRatio].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatio {
  // raw deflate (nowrap): the 2-byte zlib header/checksum would skew
  // tiny documents; level 6 = zlib default, deterministic for a given
  // input on the JDK's bundled zlib.
  // LIFETIME: the per-thread Deflater pins native zlib state until its
  // thread dies — bounded on Spark executors (fixed task-thread pools),
  // and the Cleaner below frees the native state when a thread IS
  // churned and its entry gets collected, so no leak either way.
  private val cleaner = java.lang.ref.Cleaner.create()
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial { () =>
      val d = new java.util.zip.Deflater(6, true)
      cleaner.register(Thread.currentThread(), () => d.end())
      d
    }
  private val scratch: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))
}

/** The 16-plane integer-lattice band signature as ONE fused native
  * loop: `graft_latticebands(q8)` → array<bigint> of the 4 band keys
  * (4 sign bits each, MSB-first fold — bit-identical to the HOF
  * formulation it replaces, which lives on as
  * SimilarityOps.latticeBandedOfHof for the bit-identity spec).
  *
  * Why native (the PqKernel arc all over again): the HOF form ran
  * transform(aggregate(zip_with(sequence…))) — interpreted lambda
  * calls plus a materialized 64-element index array PER PLANE PER ROW
  * (16× per row), which made signature derivation the hot spot of
  * ann_q8_lsh_topk and the IVF-PQ family's banded scans (~1 s of the
  * 1.05 s sf0.1 line). The fused loop is 16·dim multiply-adds per row
  * with zero allocation beyond the 4-long result.
  *
  * Plane element = Weyl lattice (p·2654435761 + d·40503) % 1001 − 500
  * (nonnegative operands, so % agrees across engines — the DuckDB
  * oracle replays the same arithmetic). Null q8 elements contribute 0,
  * matching the HOF's coalesce.
  */
case class LatticeBands(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_latticebands expects array<bigint> q8 input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_latticebands"

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  def compute(q8: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = q8.numElements()
    val keys = new Array[Long](4)
    var p = 0
    while (p < 16) {
      var dot = 0L
      var d = 0
      while (d < n) {
        if (!q8.isNullAt(d)) {
          val plane = (p * 2654435761L + d * 40503L) % 1001L - 500L
          dot += q8.getLong(d) * plane
        }
        d += 1
      }
      keys(p / 4) = keys(p / 4) * 2L + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("latticebands", this,
        classOf[LatticeBands].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Float SRP (sign-random-projection) bucket keys as ONE fused native
  * loop: `graft_srpbands(v, planes)` → array<bigint> of the 8 table
  * keys (4 sign bits each, MSB-first fold — bit-identical to the HOF
  * formulation, which lives on as SimilarityOps.srpBandedOfHof for the
  * bit-identity spec; the DuckDB oracle replays the same planes as
  * literals with the same sequential dot, so the swap leaves the
  * ann_lsh_topk hash untouched).
  *
  * Same story as [[LatticeBands]]: transform(typedlit(planes),
  * p -> aggregate(zip_with(p, v, …))) is interpreted lambda evaluation
  * per element — 32 planes × 64 products per row through the
  * expression interpreter. The fused loop is 32·dim multiply-adds in
  * index order (the accumulation ORDER is the bit-identity contract:
  * IEEE doubles, same sequence ⇒ same bits ⇒ same signs).
  *
  * `planes` must be a FOLDABLE array<array<double>> literal — it is
  * baked into the plan (the typedlit ships once per stage in the task
  * binary) and materialized once per deserialized expression instance.
  */
case class SrpBands(vec: Expression, planes: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

  override def left: Expression = vec
  override def right: Expression = planes

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, planes.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
          if planes.foldable =>
        // 4 planes per band key (keys(p/4) below): a plane count that
        // is 0 or not a multiple of 4 must fail ANALYSIS, not throw
        // ArrayIndexOutOfBounds at runtime (round-13 advice — the
        // function is on the SQL surface as graft_srpbands)
        val nP = Option(planes.eval(null))
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .numElements()).getOrElse(0)
        if (nP > 0 && nP % 4 == 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_srpbands needs a non-empty planes literal with a " +
            s"multiple-of-4 plane count (4 planes per band key), got $nP")
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_srpbands expects a FOLDABLE planes literal")
      case (v, p) => TypeCheckResult.TypeCheckFailure(
        s"graft_srpbands expects (array<double>, array<array<double>>), " +
          s"got (${v.simpleString}, ${p.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_srpbands"

  // plane matrix decoded once per (deserialized) expression instance
  @transient private lazy val planeRows: Array[Array[Double]] = {
    val arr = planes.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(arr.numElements()) { p =>
      arr.getArray(p).toDoubleArray()
    }
  }

  override def nullSafeEval(v: Any, p: Any): Any =
    compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  def compute(v: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val nP = planeRows.length
    val keys = new Array[Long](nP / 4)
    var p = 0
    while (p < nP) {
      val plane = planeRows(p)
      val n = math.min(plane.length, v.numElements())
      var dot = 0.0
      var d = 0
      while (d < n) {
        if (!v.isNullAt(d)) dot += plane(d) * v.getDouble(d)
        d += 1
      }
      keys(p / 4) = keys(p / 4) * 2L + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val self = ctx.addReferenceObj("srpbands", this, classOf[SrpBands].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, planes = newRight)
}

/** Per-document Gopher repetition statistics in ONE flat text pass:
  * `graft_repstats(text)` → struct(top2_chars, dup5_chars) — the
  * round-17 optimization of [[graft.operators.TextOps
  * .gopherRepetition]]. Both statistics are PER-DOCUMENT aggregates of
  * the doc's own n-gram multiset, so nothing about them needs a
  * shuffle: the former plan exchanged every distinct (doc, 2-gram) and
  * (doc, 5-gram) count through two corpus-wide hash aggregations, a
  * per-doc window and two joins back to the doc scan (guide §2.3 —
  * "aggregate before you shuffle" taken to its limit: aggregate so
  * there is nothing left to shuffle).
  *
  * Semantics replicate the former chain (and the DuckDB oracle CTE)
  * exactly:
  *  - tokens = split(text, " ", -1); full n-token windows only
  *    (i in [0, len−n]) — docs shorter than n tokens yield 0;
  *  - top2_chars = c·length(g) of the 2-gram ranked first by
  *    (c DESC, g ASC) — the tie-break compares UTF-8 BYTES unsigned,
  *    matching Spark's binary string ordering (and DuckDB's default
  *    collation) that the former `row_number().over(orderBy(desc(c),
  *    asc(gram)))` used;
  *  - dup5_chars = Σ c·length(g) over 5-grams with c > 1;
  *  - length(g) counts CODE POINTS (Spark `length`, DuckDB `length`),
  *    computed as Σ codePoints(token) + (n−1) from per-token prefix
  *    sums — no per-gram re-scan.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_repstats expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("top2_chars", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false)))

  override def prettyName: String = "graft_repstats"

  override def nullSafeEval(t: Any): Any =
    compute(t.asInstanceOf[UTF8String])

  /** A gram as a VIEW over the token array — map key with exact
    * (token-by-token) equality, so counts are identical to keying by
    * the joined gram string while allocating ~32 bytes per distinct
    * gram instead of a full copy of the gram text (round-17 advice:
    * the string-keyed maps held ~7× the document text in transient
    * heap; a pathological huge document concentrated that in one
    * task). Gram BYTES are only materialized for tie-break candidates
    * ([[gramBytes]]). */
  private final class GramKey(val toks: Array[String], val start: Int,
      val n: Int) {
    override val hashCode: Int = {
      var h = 1
      var j = start
      while (j < start + n) { h = h * 31 + toks(j).hashCode; j += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case k: GramKey =>
        if (k.n != n) false
        else {
          var j = 0
          while (j < n) {
            if (toks(start + j) != k.toks(k.start + j)) return false
            j += 1
          }
          true
        }
      case _ => false
    }
  }

  /** UTF-8 bytes of a gram view (tokens joined by ' ') — built only
    * when the tie-break needs to compare candidates. */
  private def gramBytes(k: GramKey): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    var j = k.start
    while (j < k.start + k.n) {
      if (j > k.start) sb.append(' ')
      sb.append(k.toks(j))
      j += 1
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Count one n-gram family into a fresh map: gram view →
    * (count, codePoints). The code-point length comes from the token
    * prefix sums — no per-gram re-scan, no gram-string allocation. */
  private def countGrams(toks: Array[String], cpPrefix: Array[Int],
      n: Int): java.util.HashMap[GramKey, Array[Int]] = {
    val m = new java.util.HashMap[GramKey, Array[Int]]
    val last = toks.length - n
    var i = 0
    while (i <= last) {
      val g = new GramKey(toks, i, n)
      val e = m.get(g)
      if (e != null) e(0) += 1
      else m.put(g, Array(1, cpPrefix(i + n) - cpPrefix(i) + (n - 1)))
      i += 1
    }
    m
  }

  /** Unsigned lexicographic UTF-8 byte comparison — Spark's binary
    * string ordering (UTF8String.compareTo). */
  private def bytesLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val cpPrefix = new Array[Int](toks.length + 1)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      cpPrefix(i + 1) = cpPrefix(i) + t.codePointCount(0, t.length)
      i += 1
    }
    var top2 = 0L
    if (toks.length >= 2) {
      val m = countGrams(toks, cpPrefix, 2)
      var bestC = 0
      var bestCp = 0
      var bestKey: GramKey = null
      var bestBytes: Array[Byte] = null // built on first tie only
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c > bestC) {
          bestC = c; bestCp = e.getValue()(1)
          bestKey = e.getKey; bestBytes = null
        } else if (c == bestC && bestC > 0) {
          if (bestBytes == null) bestBytes = gramBytes(bestKey)
          val kb = gramBytes(e.getKey)
          if (bytesLt(kb, bestBytes)) {
            bestCp = e.getValue()(1); bestKey = e.getKey; bestBytes = kb
          }
        }
      }
      top2 = bestC.toLong * bestCp
    }
    var dup5 = 0L
    if (toks.length >= 5) {
      val m = countGrams(toks, cpPrefix, 5)
      val it = m.values().iterator()
      while (it.hasNext) {
        val v = it.next()
        if (v(0) > 1) dup5 += v(0).toLong * v(1)
      }
    }
    new GenericInternalRow(Array[Any](top2, dup5))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("repstats", this,
        classOf[RepetitionStats].getName)
      s"${ev.value} = $self.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
