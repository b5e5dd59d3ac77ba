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
}
