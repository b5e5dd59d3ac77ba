package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** token_count_bpe_merge: the static replace-chain must equal TRUE
  * iterative greedy BPE (repeatedly merge the lowest-ranked adjacent
  * pair) on every fixture payload — the equivalence argument in the
  * operator's scaladoc, checked rather than trusted.
  */
class BpeSpec extends SparkSuite {

  /** Textbook greedy BPE over an arbitrary merge table. */
  private def bpe(merges: Seq[(String, String)])(piece: String): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = piece.map(_.toString).toVector
    var done = false
    while (!done) {
      val candidates = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (candidates.isEmpty) done = true
      else {
        val (_, i) = candidates.min
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  private val preTok = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]".r

  test("both merge tables have the BPE rank property (constituents rank lower)") {
    // the scaladoc's equivalence argument needs it: a merge's non-char
    // constituent must itself be produced by a LOWER-ranked merge
    Seq("payload" -> TextOps.BpeMerges, "doc" -> TextOps.DocBpeMerges)
      .foreach { case (tag, merges) =>
        val producedAt = merges.zipWithIndex
          .map { case ((a, b), i) => (a + b) -> i }.toMap
        merges.zipWithIndex.foreach { case ((a, b), i) =>
          Seq(a, b).filter(_.length > 1).foreach { s =>
            assert(producedAt.contains(s) && producedAt(s) < i,
              s"$tag merge $i ($a,$b): constituent '$s' not from a lower rank")
          }
        }
      }
  }

  test("document counter ≡ textbook greedy BPE over every fixture document") {
    // the counter is the native expression — register like its callers do
    graft.GraftExtensions.register(spark)
    val counted = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(counted.nonEmpty)
    val got = sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextOps.bpeDocTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val doc = bpe(TextOps.DocBpeMerges) _
    var mergedDocs = 0
    counted.foreach { case (id, text) =>
      val words = text.split(" ").toSeq
      val want = words.map(doc(_).length.toLong).sum
      assert(got(id) == want, s"doc $id: query ${got(id)}, textbook $want")
      if (want < words.map(_.length).sum) mergedDocs += 1
    }
    assert(mergedDocs == counted.length,
      "corpus words (the/join/scan/data/row...) should merge in every doc")
  }

  test("bpe_train ≡ driver-Scala reference trainer; encode-with-learned compresses") {
    // reference trainer: textbook Sennrich loop over the same
    // word-frequency table — overlap-counting adjacent pairs, argmax
    // with the SAME total tie-break, non-overlapping left-to-right
    // apply, stop below pair frequency 2
    val wordFreq: Map[String, Long] = sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var words: Map[Vector[String], Long] =
      wordFreq.map { case (w, c) => w.map(_.toString).toVector -> c }
    val expected = Seq.newBuilder[(String, String, Long)]
    var done = false
    var rounds = 0
    while (rounds < 12 && !done) {
      val freqs = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.indices.dropRight(1).foreach { i =>
          freqs((syms(i), syms(i + 1))) =
            freqs.getOrElse((syms(i), syms(i + 1)), 0L) + c
        }
      }
      val cands = freqs.toSeq.sortBy { case ((l, r), f) => (-f, l, r) }
      if (cands.isEmpty || cands.head._2 < 2) done = true
      else {
        val ((l, r), f) = cands.head
        expected += ((l, r, f))
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        rounds += 1
      }
    }
    val got = operators.TextOps.bpeTrainQuery(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected.result(),
      s"learned table diverged from the reference trainer: $got")
    assert(got.nonEmpty)

    // encode-with-learned: counts match textbook BPE under the learned
    // table and strictly compress vs character count
    val learned = got.map { case (l, r, _) => l -> r }
    val enc = bpe(learned) _
    val rows = operators.TextOps.tokenCountBpeTrained(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val texts = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, nWords, nTokens) =>
      val ws = texts(id).split(" ").toSeq
      assert(nWords == ws.length, s"doc $id word count")
      val want = ws.map(enc(_).length.toLong).sum
      assert(nTokens == want, s"doc $id: query $nTokens, textbook $want")
      assert(nTokens < ws.map(_.length).sum, s"doc $id: no compression")
    }
  }

  test("replace-chain query ≡ textbook greedy BPE on every fixture payload") {
    val got = TextOps.tokenCountBpeMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.nonEmpty)
    val payloads = sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("string"),
        concat(lit("{\"row_id\":"), col("o_orderkey").cast("string"),
          lit(",\"cust\":"), col("o_custkey").cast("string"), lit("}")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // counts must actually exercise the merges: some payload merges
    // down (n_tokens < sum of piece lengths) — not a no-op chain
    val pay = bpe(TextOps.BpeMerges) _
    var merged = 0
    got.foreach { case (id, nPieces, nTokens) =>
      val pieces = preTok.findAllIn(payloads(id)).toSeq
      assert(pieces.length == nPieces, s"id $id pre-token count")
      val want = pieces.map(pay(_).length).sum
      assert(nTokens == want,
        s"id $id (${payloads(id)}): query $nTokens, textbook $want")
      if (want < pieces.map(_.length).sum) merged += 1
    }
    assert(merged == got.length,
      "every payload contains 'row'/'id'/'cust' — all should merge")
  }

  test("native graft_bpe_count ≡ column replace chain, corpus-wide and adversarial") {
    // round-16: the encoder is the fused native expression; the column
    // chain (the form the DuckDB oracle replays verbatim) is kept as
    // the reference pair. The native form claims BYTE-EXACT simulation
    // of every replace pass — assert it on the whole fixture corpus
    // for BOTH merge tables (static + learned)…
    graft.GraftExtensions.register(spark)
    val learned = TextOps.bpeTrainQuery(spark, sf).collect()
      .map(r => r.getString(1) -> r.getString(2)).toSeq
    for (merges <- Seq(TextOps.DocBpeMerges, learned)) {
      val diff = sources.Tables.documents(spark, sf)
        .select(col("doc_id"),
          TextOps.bpeDocTokenCountWith(col("text"), merges).as("native"),
          TextOps.bpeDocTokenCountChain(col("text"), merges).as("chain"))
        .filter(col("native") =!= col("chain"))
      assert(diff.isEmpty, s"native != chain: ${diff.take(5).mkString(", ")}")
    }
    // …and on adversarial NON-contract strings where the replace
    // chain's quirks (multi-space runs, unicode, tabs, edges) bite:
    // the native form must reproduce the quirks, not "fix" them.
    import spark.implicits._
    val nasty = Seq(
      "", " ", "  ", "   ", "the", " the", "the ", "a  b", "a   b",
      "th e", "t h e", "~", "~~", "the ~ the", "\tthe\tdata\t",
      "émigré café ñ", "日本語 テキスト", "🎉 the 🎉", "éclair",
      "the the the the", "a", "ab", "aa bb aa bb", "t t t t t t",
      // line terminators: Java regex `.` skips these, so the chain
      // emits them with NO trailing space — the native walk must too
      "a\nb", "the\ndata", "\n", "a\r\nb", "\rthe", "the\r",
      "ab", "a b", "a b", "t h\ne",
      "line one\nline two\n")
      .toDF("text")
    val bad = nasty
      .select(col("text"),
        TextOps.bpeDocTokenCountWith(col("text"), TextOps.DocBpeMerges).as("native"),
        TextOps.bpeDocTokenCountChain(col("text"), TextOps.DocBpeMerges).as("chain"))
      .filter(col("native") =!= col("chain")).collect()
    assert(bad.isEmpty, s"adversarial mismatch: ${bad.mkString(", ")}")
  }
}
