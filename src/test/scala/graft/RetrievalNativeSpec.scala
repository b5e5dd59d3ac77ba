package graft

import org.apache.spark.sql.functions._

import graft.operators.RetrievalOps

/** Round-16 retrieval fusion: tfidf_terms moved to ONE corpus pass
  * (native graft_tokcounts generator + a tok-window df instead of the
  * vocab broadcast join) and bm25_search's per-doc counters to one
  * native byte scan (graft_qterms). Both claim byte-equality with the
  * column forms they replaced — asserted here, not argued (the
  * BpeSpec native ≡ chain convention). */
class RetrievalNativeSpec extends SparkSuite {

  test("graft_tokcounts ≡ explode(split) tf/df aggregates, corpus-wide") {
    graft.GraftExtensions.register(spark)
    val docs = sources.Tables.documents(spark, sf)
    val gen = docs
      .select(col("source"), call_function("graft_tokcounts", col("text")))
    val tfNew = gen.groupBy("source", "tok").agg(sum("cnt").as("tf"))
    val tfOld = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("tf"))
    assert(tfNew.except(tfOld).isEmpty && tfOld.except(tfNew).isEmpty,
      "tf aggregate differs between generator and explode forms")
    val dfNew = gen.groupBy("tok").agg(count(lit(1)).as("df"))
    val dfOld = docs
      .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    assert(dfNew.except(dfOld).isEmpty && dfOld.except(dfNew).isEmpty,
      "df aggregate differs between generator and explode forms")
  }

  test("graft_qterms ≡ split + filter HOF per term, corpus and adversarial") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val terms = Seq("hash", "merge", "scan")
    val lit3 = typedLit(terms)
    def both(df: org.apache.spark.sql.DataFrame) = {
      val toks = split(col("text"), " ")
      val c = call_function("graft_qterms", col("text"), lit3)
      df.select(
        (c.getItem(0).cast("int") ===
          functions.Exprs.tokenCount(col("text"))).as("dl_eq") +:
        terms.zipWithIndex.map { case (t, i) =>
          (c.getItem(i + 1).cast("int") ===
            size(filter(toks, x => x === t))).as(s"eq_$t") }: _*)
        .filter(terms.map(t => !col(s"eq_$t"))
          .foldLeft(!col("dl_eq"))(_ || _))
    }
    assert(both(sources.Tables.documents(spark, sf)).isEmpty,
      "graft_qterms differs from the HOF form on the corpus")
    val nasty = Seq("", " ", "hash", " hash", "hash ", "hash  merge",
      "hashhash", "has h", "merge merge merge", "scan\tscan",
      "émigré hash café", "日本語 merge").toDF("text")
    assert(both(nasty).isEmpty,
      "graft_qterms differs from the HOF form on adversarial strings")
  }

  test("graft_shingles_h ≡ xxhash64 over graft_shingles, per doc") {
    // the contamination probes' hash currency: the generator's row set
    // must equal the builtin xxhash64 over the string shingle array
    // (same distinct, same windows, same seed) — asserted per doc.
    graft.GraftExtensions.register(spark)
    val viaGen = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), call_function("graft_shingles_h", col("text"), lit(3)))
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
    val viaStr = sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        sort_array(transform(
          call_function("graft_shingles", col("text"), lit(3)),
          t => xxhash64(t))).as("hs"))
    assert(viaGen.except(viaStr).isEmpty && viaStr.except(viaGen).isEmpty,
      "hashed shingle generator differs from xxhash64(graft_shingles)")
    // and the null-text sentinel: one null-h row, not a dropped doc
    import spark.implicits._
    val nullRows = Seq[(Long, String)]((1L, null)).toDF("doc_id", "text")
      .select(col("doc_id"), call_function("graft_shingles_h", col("text"), lit(3)))
      .collect()
    assert(nullRows.length == 1 && nullRows.head.isNullAt(1),
      "null text must emit exactly one null-h row")
  }

  test("hybrid_search_rrf fuses exactly the two source lists' ranks") {
    // round-17: the fusion must be pure rank arithmetic over the two
    // existing chains — recompute every fused score driver-side from
    // the source lists and require bit-equality, plus provenance: a
    // claimed rank must BE that doc's rank in the source list.
    val bm = RetrievalOps.bm25Search(spark, sf).collect()
      .map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val ann = operators.SimilarityOps.annQ8Topk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val fused = RetrievalOps.hybridSearchRrf(spark, sf).collect()
    assert(fused.length == 50, s"5 queries × top-10: got ${fused.length}")
    val perQ = fused.groupBy(_.getLong(0))
    assert(perQ.keySet == ann.keys.map(_._1).toSet && perQ.values.forall(_.length == 10))
    fused.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      val (score, bmR, annR, rrfR) =
        (r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(bmR == bm.getOrElse(d, -1), s"bm25 rank provenance at ($q,$d)")
      assert(annR == ann.getOrElse((q, d), -1), s"ann rank provenance at ($q,$d)")
      val want = (if (annR > 0) 1000000L / (60 + annR) else 0L) +
        (if (bmR > 0) 1000000L / (60 + bmR) else 0L)
      assert(score == want, s"rrf arithmetic at ($q,$d): $score != $want")
      assert(rrfR >= 1 && rrfR <= 10)
    }
    // within each query the fused list is (rrf desc, doc_id asc)-sorted
    perQ.values.foreach { rows =>
      val ordered = rows.sortBy(_.getInt(5))
        .map(r => (-r.getLong(2), r.getLong(1)))
      assert(ordered.sameElements(ordered.sorted), "fused order broken")
    }
  }

  test("single-pass tfidf ≡ the two-pass broadcast-join formulation") {
    graft.GraftExtensions.register(spark)
    val docs = sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("tf"))
    val dfv = docs
      .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val old = tf.join(broadcast(dfv), Seq("tok"))
      .withColumn("tfidf_micro",
        round(lit(1e6) * col("tf") *
          log(lit(nDocs).cast("double") / col("df"))).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(desc("tfidf_micro"), asc("tok"))))
      .filter(col("rn") <= 3)
      .select(col("source"), col("rn"), col("tok"), col("tf"), col("df"),
        col("tfidf_micro"))
      .orderBy("source", "rn")
    val neu = RetrievalOps.tfidfTerms(spark, sf)
    assert(neu.collect().toSeq == old.collect().toSeq,
      "single-pass tfidf differs from the broadcast-join form")
  }
}
