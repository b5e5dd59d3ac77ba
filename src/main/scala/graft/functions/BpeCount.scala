package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the TRUE-BPE document token count in
  * one fused compiled pass — `graft_bpe_count(text, merges)` → bigint,
  * where `merges` is a FOLDABLE flat array<string> of the rank-ordered
  * merge table (left0, right0, left1, right1, …).
  *
  * This is a BYTE-EXACT fusion of the replace-chain encoder
  * ([[graft.operators.TextOps.bpeDocTokenCountWith]]'s column form,
  * which the DuckDB oracle replays verbatim):
  *
  *   1. spaced  = ' ' ++ (each code point ++ ' ')        — the
  *      `concat(lit(" "), regexp_replace(text, "(.)", "$1 "))` step,
  *      done as one UTF-8 lead-byte walk instead of a regex pass.
  *      Java's `.` never matches a LINE TERMINATOR (\n \r U+0085
  *      U+2028 U+2029), so those code points pass through with no
  *      trailing space — the walk reproduces exactly that (round-16
  *      advice; BpeSpec's adversarial list pins \n/\r/U+2028 cases).
  *      (DuckDB's RE2 `.` excludes only \n, so the ORACLE-facing
  *      contract stays what it always was: single-spaced,
  *      line-terminator-free document text — the chain itself, not
  *      just this fusion, diverges from RE2 on a raw \r.);
  *   2. guarded = replace(spaced, "   ", " ~ ")           — original
  *      single spaces become the '~' word guard; same-length, done in
  *      place with the exact non-overlapping left-to-right scan of
  *      Spark's and DuckDB's `replace`;
  *   3. TWO exhaustive passes per merge of
  *      replace(" a b ", " ab ")                          — each pass
  *      a single src→dst byte scan with the same non-overlapping
  *      resume-after-the-match semantics (matches are found against
  *      the pass's INPUT, so a match's consumed trailing space blocks
  *      the immediately following pair exactly like the string form);
  *   4. tokens  = size(split(trim(merged), " "))          — spaces in
  *      the space-trimmed result + 1;
  *   5. result  = tokens − (size(split(text, " ")) − 1)   — the word
  *      separators handed back.
  *
  * Because every step simulates the corresponding string function at
  * the byte level (UTF-8 never embeds 0x20 in a multibyte sequence, so
  * byte matching ≡ character matching), the count is bit-identical to
  * the column chain on ANY input — including non-contract text with
  * runs of spaces — which BpeSpec asserts corpus-wide and on
  * adversarial strings. What the fusion buys: the column form is ~36
  * Catalyst string nodes (a regex pass + 2×|merges| `replace`s + two
  * `split`s), each allocating a fresh UTF8String of the ~2× char-
  * spaced text per row; this is one expression doing ping-pong passes
  * over two byte buffers with zero intermediate UTF8Strings — the
  * graft_ngrams precedent (which cut gopher_repetition 4.9 → 1.1 s)
  * applied to the heaviest honest per-doc compute on real corpora
  * (doc_pack_bpe, 17.1 s at the 240k-doc BENCH_realcorpus10x).
  *
  * The merge table ships as a plan literal exactly like the column
  * form's replace constants; it is decoded ONCE per (de)serialized
  * expression instance (`merges` must be foldable — enforced by the
  * type check). A production 50k-merge vocab would swap step 3's
  * rank-ordered passes for a single greedy pass over a merge map; the
  * two-pass chain is kept because it IS the semantics the oracle
  * replays (reference: task-hive readme.txt:20 tokenizer TODO).
  */
case class BpeTokenCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bpe_count expects a foldable merge table")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_count expects (string, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = LongType

  /** (pattern " a b ", replacement " ab ") byte pairs in rank order,
    * decoded once from the foldable merge literal. */
  @transient private lazy val table: Array[(Array[Byte], Array[Byte])] = {
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    require(arr != null && arr.numElements() % 2 == 0,
      "graft_bpe_count: merge table must be non-null with even length")
    Array.tabulate(arr.numElements() / 2) { i =>
      val a = arr.getUTF8String(2 * i).toString
      val b = arr.getUTF8String(2 * i + 1).toString
      (s" $a $b ".getBytes("UTF-8"), s" $a$b ".getBytes("UTF-8"))
    }
  }

  /** One non-overlapping left-to-right replace pass (the exact
    * semantics of `replace`: matches located against the INPUT,
    * scanning resumes after each match's last consumed byte). Returns
    * the output length written into `dst`. */
  private def replacePass(src: Array[Byte], len: Int,
      pat: Array[Byte], rep: Array[Byte], dst: Array[Byte]): Int = {
    val pl = pat.length
    var i = 0
    var o = 0
    while (i < len) {
      var hit = i + pl <= len && src(i) == ' '
      if (hit) {
        var j = 1
        while (hit && j < pl) {
          if (src(i + j) != pat(j)) hit = false
          j += 1
        }
      }
      if (hit) {
        System.arraycopy(rep, 0, dst, o, rep.length)
        o += rep.length
        i += pl
      } else {
        dst(o) = src(i)
        o += 1
        i += 1
      }
    }
    o
  }

  /** The fused count — public so generated code can call it via an
    * expression reference. */
  def count(text: UTF8String): Long = {
    val tb = text.getBytes
    var spacesInText = 0
    var nChars = 0
    var i = 0
    while (i < tb.length) {
      if (tb(i) == ' ') spacesInText += 1
      if ((tb(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    // step 1: ' ' ++ (code point ++ ' ')* — except LINE TERMINATORS,
    // which Java's `.` never matches (\n \r U+0085 U+2028 U+2029), so
    // the chain's regexp_replace passes them through with NO trailing
    // space; the walk must reproduce that, not "fix" it (round-16
    // advice: JSONL-carried newlines silently diverged).
    var cur = new Array[Byte](1 + tb.length + nChars)
    cur(0) = ' '
    var p = 1
    i = 0
    while (i < tb.length) {
      val s0 = i
      cur(p) = tb(i); p += 1; i += 1
      while (i < tb.length && (tb(i) & 0xC0) == 0x80) {
        cur(p) = tb(i); p += 1; i += 1
      }
      val cpLen = i - s0
      val lineTerm =
        (cpLen == 1 && (tb(s0) == '\n' || tb(s0) == '\r')) ||
        (cpLen == 2 && (tb(s0) & 0xFF) == 0xC2 && (tb(s0 + 1) & 0xFF) == 0x85) ||
        (cpLen == 3 && (tb(s0) & 0xFF) == 0xE2 && (tb(s0 + 1) & 0xFF) == 0x80 &&
          ((tb(s0 + 2) & 0xFF) == 0xA8 || (tb(s0 + 2) & 0xFF) == 0xA9))
      if (!lineTerm) { cur(p) = ' '; p += 1 }
    }
    var curLen = p
    // step 2: replace("   ", " ~ ") — same length, in place
    i = 0
    while (i + 2 < curLen) {
      if (cur(i) == ' ' && cur(i + 1) == ' ' && cur(i + 2) == ' ') {
        cur(i + 1) = '~'; i += 3
      } else i += 1
    }
    // step 3: two passes per merge, ping-pong buffers
    var buf = new Array[Byte](curLen)
    val t = table
    var mi = 0
    while (mi < t.length) {
      val (pat, rep) = t(mi)
      var pass = 0
      while (pass < 2) {
        curLen = replacePass(cur, curLen, pat, rep, buf)
        val tmp = cur; cur = buf; buf = tmp
        pass += 1
      }
      mi += 1
    }
    // step 4: spaces in the space-trimmed result + 1
    var s = 0
    var e = curLen
    while (s < e && cur(s) == ' ') s += 1
    while (e > s && cur(e - 1) == ' ') e -= 1
    var tokens = 1L
    i = s
    while (i < e) {
      if (cur(i) == ' ') tokens += 1
      i += 1
    }
    // step 5: hand back the word separators
    tokens - spacesInText
  }

  override def nullSafeEval(t: Any, m: Any): Any =
    count(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val ref = ctx.addReferenceObj("bpeCounter", this,
        classOf[BpeTokenCount].getName)
      s"${ev.value} = $ref.count($t);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
