package graft

import org.apache.spark.sql.functions._

/** The native token-gram expressions (TokenChunksGen generator,
  * TokenShingles scalar — graft.functions.TokenGrams) must be
  * BIT-IDENTICAL to the interpreted HOF forms they replace
  * (TextOps.chunks10 / shingles3), on the real fixture and on the edge
  * cases the HOF arithmetic encodes (empty text, short text, trailing
  * separators, within-doc repetition).
  */
class TokenGramsSpec extends SparkSuite {
  import spark.implicits._

  private val edgeTexts = Seq(
    "",                        // one empty chunk / one empty shingle
    "one",                     // single token, shorter than n
    "a b",                     // shorter than shingle width 3
    "a b c",                   // exactly one shingle
    "a b c d e f g h i j",     // exactly one 10-chunk
    "a b c d e f g h i j k",   // chunk boundary + 1
    "x y x y x y x y",         // repeated shingles (distinct matters)
    "a  b",                    // double space → empty token kept by split
    "trail ")                  // trailing space → trailing empty token

  private def fixtureAndEdges =
    sources.Tables.documents(spark, sf).select(col("text"))
      .union(edgeTexts.toDF("text"))

  test("graft_chunks generator ≡ explode(chunks10 HOF), bit-identical") {
    GraftExtensions.register(spark)
    val df = fixtureAndEdges
    val hof = df.select(col("text"),
      explode(operators.TextOps.chunks10(col("text"))).as("chunk"))
    val native = df.select(col("text"),
      call_function("graft_chunks", col("text"), lit(10)).as("chunk"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty,
      "chunk multisets differ between HOF and native generator")
    // ordering within a doc matters for fingerprint-style consumers:
    // compare position-tagged sequences too
    val hofArr = df.select(operators.TextOps.chunks10(col("text")).as("c"))
      .collect().map(_.getSeq[String](0))
    val natArr = df.select(col("text")).as[String].collect()
      .map(t => functions.TokenGrams
        .chunks(org.apache.spark.unsafe.types.UTF8String.fromString(t), 10)
        .map(_.toString).toSeq)
    assert(hofArr.toSeq == natArr.toSeq, "per-doc chunk order differs")
  }

  test("graft_ngrams generator ≡ HOF full-window construction, multiset + order") {
    GraftExtensions.register(spark)
    val df = fixtureAndEdges
    for (n <- Seq(2, 5)) {
      // HOF reference: full-length windows only (empty for short docs)
      val toks = split(col("text"), " ")
      val hofGrams = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
        .otherwise(typedlit(Seq.empty[String]))
      val hof = df.select(col("text"), explode(hofGrams).as("gram"))
      val native = df.select(col("text"),
        call_function("graft_ngrams", col("text"), lit(n)).as("gram"))
      assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty,
        s"$n-gram multisets differ between HOF and native generator")
    }
    // short-doc edge: fewer tokens than n → no grams at all
    val short = Seq("one", "a b").toDF("text")
      .select(call_function("graft_ngrams", col("text"), lit(5)))
    assert(short.isEmpty)
  }

  test("graft_shingles ≡ shingles3 HOF, bit-identical arrays") {
    GraftExtensions.register(spark)
    val df = fixtureAndEdges
    val both = df.select(
      operators.TextOps.shingles3(col("text")).as("hof"),
      call_function("graft_shingles", col("text"), lit(3)).as("native"))
    val bad = both.filter(not(col("hof") <=> col("native")))
    assert(bad.isEmpty, s"shingle arrays differ: ${bad.head(3).mkString("; ")}")
  }

  test("graft_simhash64 ≡ per-token aggregate simhash, bit-identical") {
    val native = operators.SimilarityOps.simhashes(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val agg = operators.SimilarityOps.simhashesAgg(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(native.keySet == agg.keySet)
    val diff = native.collect { case (id, h) if agg(id) != h => id }
    assert(diff.isEmpty, s"simhash differs for docs: ${diff.take(5)}")
  }

  test("graft_minhash ≡ per-shingle aggregate signatures, bit-identical") {
    val native = operators.SimilarityOps.minhashSignatures(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val agg = operators.SimilarityOps.minhashSignaturesAgg(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(native.keySet == agg.keySet)
    val diff = native.collect { case (id, s) if agg(id) != s => id }
    assert(diff.isEmpty, s"signature differs for docs: ${diff.take(5)}")
  }

  test("optimizer rule rewrites size(graft_shingles) to count-only form") {
    GraftExtensions.register(spark)
    val df = operators.TextOps.repetitionRatio(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_shingle_count"),
      s"rewrite did not fire:\n$optimized")
    // and the rewritten plan computes the same numbers as the real
    // materialized-array count (HOF form — NOT subject to the rule,
    // so this genuinely crosses the rewrite boundary)
    val viaArray = sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(operators.TextOps.shingles3(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val got = df.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_distinct").toInt)).toMap
    assert(got == viaArray, "count-only rewrite changed results")
  }

  test("graft_rollfp ≡ per-char aggregate HOF fold, bit-identical") {
    val native = operators.TextOps.fingerprintRolling(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hof = operators.TextOps.fingerprintRollingHof(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native == hof)
  }

  test("graft_zratio: deterministic, bounded, repetitive ≪ prose") {
    GraftExtensions.register(spark)
    val repetitive = ("spam " * 200).trim
    val prose = (1 to 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")
    val rows = Seq(repetitive, prose, "")
      .toDF("text")
      .select(call_function("graft_zratio", col("text")).as("z"))
      .collect().map(_.getLong(0))
    val Array(zRep, zProse, zEmpty) = rows
    assert(zEmpty == 0L,
      "empty text is maximally redundant (0) so a low-ratio gate rejects it")
    assert(zRep > 0 && zRep < 100,
      s"200x-repeated token should compress below 10% ($zRep)")
    assert(zProse > 3 * zRep,
      s"varied prose ($zProse) must compress far worse than loops ($zRep)")
    // determinism across evaluations (ThreadLocal deflater reuse must
    // not leak state between rows/runs)
    val again = operators.TextOps.compressionRatio(spark, sf).collect()
    val first = operators.TextOps.compressionRatio(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq == first.map(_.toSeq).toSeq)
    assert(first.forall { r =>
      val z = r.getLong(1); z > 0 && z <= 1500
    }, "corpus ratios must land in (0, 1.5]")
  }

  test("graft_rollfp folds codepoints: non-BMP text still ≡ the HOF fold") {
    GraftExtensions.register(spark)
    // The fixture is pure ASCII, so this pins the astral-plane case the
    // corpus will hit: split("") keeps surrogate pairs whole and ascii()
    // is codePointAt(0), so the native loop must advance per CODEPOINT.
    val prime = 1000000007L
    val rows = Seq("hello 😀 world", "😀😁",
      "mixé ✓ 🤖", "").toDF("text")
      .select(
        call_function("graft_rollfp", col("text")).as("native"),
        aggregate(split(col("text"), ""), lit(0L),
          (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)),
            lit(prime))).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != hof ${r.getLong(1)}"))
  }

  test("NULL text: native forms are null-strict; HOF divergence is pinned") {
    GraftExtensions.register(spark)
    val df = Seq(Some("a b"), None).toDF("text")
    // generator: no rows for NULL
    val out = df.select(call_function("graft_chunks", col("text"), lit(10)))
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "a b")
    // scalars: NULL in, NULL out
    val scalars = df.filter(col("text").isNull).select(
      call_function("graft_shingles", col("text"), lit(3)),
      call_function("graft_simhash64", col("text")),
      call_function("graft_minhash", col("text"), lit(4))).head()
    assert((0 to 2).forall(scalars.isNullAt),
      "native scalar forms must be null-strict")
    // the HOF chunk form instead yields [""] on NULL (concat_ws swallows
    // the null slice) — the documented divergence this spec pins
    val hofNull = df.filter(col("text").isNull)
      .select(operators.TextOps.chunks10(col("text")).as("c")).head()
    assert(hofNull.getSeq[String](0) == Seq(""),
      "HOF chunks10(NULL) behavior changed — update TokenGrams docs")
    // ...and the fixture guarantee that makes the divergence moot for
    // every oracle-checked query:
    assert(sources.Tables.documents(spark, sf)
      .filter(col("text").isNull).isEmpty,
      "documents fixture unexpectedly contains NULL text")
  }

  test("graft_repstats ≡ the aggregate gopher-repetition chain, fixture + adversarial") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.expressions.Window
    // adversarial beyond the shared edge list:
    //  - a tie between 2-grams whose UTF-8 byte order DISAGREES with
    //    Java UTF-16 order (U+FFFF sorts before U+10000 in bytes,
    //    after it in UTF-16) — the tie-break must follow Spark's
    //    binary ordering, and the two candidates have different
    //    code-point lengths so a wrong pick changes top2_chars;
    //  - non-BMP chars in counted grams (code-point length ≠ UTF-16
    //    length);
    //  - exact 5-gram repetition windows, newlines inside tokens.
    val ffff = "￿￿"
    val supp = new String(Character.toChars(0x10000))
    val adversarial = Seq(
      s"$ffff $ffff $ffff $supp $supp $supp", // the byte-vs-UTF16 tie
      "a b a b a b a b a b a b",              // heavy 2+5-gram repetition
      "x\ny x\ny z x\ny y z",                 // newlines inside tokens
      s"$supp b c d e $supp b c d e",         // repeated 5-gram, non-BMP
      "t t t t t t")                          // single-token repetition
    val df = fixtureAndEdges.union(adversarial.toDF("text"))
      .withColumn("doc_id", monotonically_increasing_id())
      .localCheckpoint()
    def grams(n: Int) = df.select(col("doc_id"),
      call_function("graft_ngrams", col("text"), lit(n)))
    val top2 = grams(2)
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("c"), asc("gram"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), (col("c") * length(col("gram"))).as("t2"))
    val dup5 = grams(5)
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .groupBy("doc_id").agg(sum(col("c") * length(col("gram"))).as("d5"))
    val ref = df.select(col("doc_id"))
      .join(top2, Seq("doc_id"), "left").join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("t2"), lit(0L)).as("t2"),
        coalesce(col("d5"), lit(0L)).as("d5"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = df.select(col("doc_id"),
        call_function("graft_repstats", col("text")).as("rs"))
      .select(col("doc_id"), col("rs.top2_chars"), col("rs.dup5_chars"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ref.keySet == native.keySet)
    ref.foreach { case (id, exp) =>
      assert(native(id) == exp, s"doc $id: native ${native(id)} != chain $exp")
    }
  }
}
