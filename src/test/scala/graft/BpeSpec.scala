package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** token_count_bpe_merge: the static replace-chain must equal TRUE
  * iterative greedy BPE (repeatedly merge the lowest-ranked adjacent
  * pair) on every fixture payload — the equivalence argument in the
  * operator's scaladoc, checked rather than trusted.
  */
class BpeSpec extends SparkSuite {

  /** Textbook greedy BPE over [[TextOps.BpeMerges]]. */
  private val rank: Map[(String, String), Int] =
    TextOps.BpeMerges.zipWithIndex.toMap

  private def bpe(piece: String): Seq[String] = {
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

  test("merge table has the BPE rank property (constituents rank lower)") {
    // the scaladoc's equivalence argument needs it: a merge's non-char
    // constituent must itself be produced by a LOWER-ranked merge
    val producedAt = TextOps.BpeMerges.zipWithIndex
      .map { case ((a, b), i) => (a + b) -> i }.toMap
    TextOps.BpeMerges.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(a, b).filter(_.length > 1).foreach { s =>
        assert(producedAt.contains(s) && producedAt(s) < i,
          s"merge $i ($a,$b): constituent '$s' not produced by a lower rank")
      }
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
    var merged = 0
    got.foreach { case (id, nPieces, nTokens) =>
      val pieces = preTok.findAllIn(payloads(id)).toSeq
      assert(pieces.length == nPieces, s"id $id pre-token count")
      val want = pieces.map(bpe(_).length).sum
      assert(nTokens == want,
        s"id $id (${payloads(id)}): query $nTokens, textbook $want")
      if (want < pieces.map(_.length).sum) merged += 1
    }
    assert(merged == got.length,
      "every payload contains 'row'/'id'/'cust' — all should merge")
  }
}
