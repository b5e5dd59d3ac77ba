package graft

import graft.operators.SimilarityOps

/** The IVF index LIFECYCLE: [[SimilarityOps.buildIvfIndex]] persists
  * centroids + cid-partitioned cell assignments once (the offline
  * half); [[SimilarityOps.annIvfProbe]] answers searches from the
  * stored index (the online half) — bit-identical to the fused
  * train+search query, with zero training work in the plan.
  */
class IvfIndexSpec extends SparkSuite {

  test("probe over a persisted index ≡ annIvfTopk, with no training in the plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    SimilarityOps.buildIvfIndex(spark, sf, dir)

    // layout: cells is written partitioned by cid — one directory per
    // populated cell, so an nprobe cell filter is partition pruning at
    // the scan (files of unprobed cells are never opened)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles().toSeq
      .filter(_.getName.startsWith("cid="))
    info(s"${cellDirs.size} populated cell partitions")
    assert(cellDirs.nonEmpty && cellDirs.size <= 16,
      s"expected 1..16 cid= partitions, got ${cellDirs.size}")

    // the fused query trains in-plan (Lloyd rounds leave their
    // localCheckpoint RDD scans = LogicalRDD nodes carrying the
    // CENTROID schema (cid, cv)); the probe's plan must contain NO
    // centroid RDD — its index arrives from parquet. The probe DOES
    // legitimately carry one non-training LogicalRDD: the 5-row
    // materialized query frame (query_id, qv — the round-10 fix that
    // stopped re-deriving queries with extra store scans), so the
    // round-9 blanket no-LogicalRDD proxy would false-positive.
    val probe = SimilarityOps.annIvfProbe(spark, sf, dir)
    val fused = SimilarityOps.annIvfTopk(spark, sf, 2)
    def rddSchemas(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.output.map(_.name).toSet
      }
    val probeRdds = rddSchemas(probe)
    assert(!probeRdds.exists(_.contains("cv")),
      s"training (centroid RDD) leaked into the probe plan: $probeRdds")
    assert(probeRdds.forall(_ == Set("query_id", "qv")),
      s"unexpected non-query LogicalRDD in the probe plan: $probeRdds")
    assert(rddSchemas(fused).exists(_.contains("cv")),
      "fused form no longer trains in-plan — update this spec")

    val got = probe.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    val want = fused.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == want, "stored-index probe diverged from the fused query")
    assert(got.nonEmpty)
  }

  test("ann_ivf_probe query form: builds once, probes training-free, ≡ fused") {
    // the (spark, sfDir) query form memoizes the index build per
    // (session, sfDir) — second call must reuse the same stored index
    val first = SimilarityOps.annIvfProbeQuery(spark, sf)
    val rdds = first.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.output.map(_.name).toSet
    }
    assert(rdds.forall(_ == Set("query_id", "qv")),
      s"training leaked into the query-form probe plan: $rdds")
    val got = first.collect().map(_.toSeq).toSeq
    assert(got == SimilarityOps.annIvfTopk(spark, sf, 2).collect().map(_.toSeq).toSeq,
      "query-form probe diverged from the fused train+search query")
    assert(got == SimilarityOps.annIvfProbeQuery(spark, sf).collect().map(_.toSeq).toSeq,
      "second (memoized) invocation diverged")
  }

  test("incremental dedup against a persisted signature index ≡ the in-plan form") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val isNew = pmod(col("doc_id"), lit(5)) === 0
    val dir = java.nio.file.Files.createTempDirectory("graft-sigidx").toString
    // ingestion-side: the existing corpus's signatures persisted once
    SimilarityOps.buildSigIndex(spark, docs.filter(!isNew), dir)
    // nightly-side: sign only the batch, probe the stored index
    val probe = SimilarityOps.dedupIncrementalProbe(spark, docs.filter(isNew), dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toSeq
    val inPlan = SimilarityOps.dedupIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toSeq
    assert(probe == inPlan, "stored-index verdicts diverged from the in-plan form")
    assert(probe.nonEmpty)
  }

  test("bucketed signature index: identical verdicts, index side joins with no exchange") {
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val isNew = pmod(col("doc_id"), lit(5)) === 0
    val dir = java.nio.file.Files.createTempDirectory("graft-sigidx-b").toString
    SimilarityOps.buildSigIndex(spark, docs.filter(!isNew), dir)
    SimilarityOps.buildSigIndexBucketed(spark, docs.filter(!isNew), "graft.sig_index_spec")

    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3))).toSeq
    val bucketed = SimilarityOps
      .dedupIncrementalProbeBucketed(spark, docs.filter(isNew), "graft.sig_index_spec")
    assert(verdicts(bucketed) ==
      verdicts(SimilarityOps.dedupIncrementalProbe(spark, docs.filter(isNew), dir)),
      "bucketed-index verdicts diverged from the plain-index probe")

    // With broadcast + AQE pinned off, the existing-match join is a
    // sort-merge join on (band, bucket): the plain parquet index
    // shuffles BOTH sides; the bucketed table's scan satisfies the
    // join's partitioning, so exactly one exchange disappears.
    val conf = spark.conf
    val (bcast, aqe) = (conf.get("spark.sql.autoBroadcastJoinThreshold"),
      conf.get("spark.sql.adaptive.enabled"))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      def shuffles(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r.findAllIn(
          df.queryExecution.executedPlan.toString).length
      val nPlain = shuffles(SimilarityOps
        .dedupIncrementalProbe(spark, docs.filter(isNew), dir))
      val nBucketed = shuffles(SimilarityOps
        .dedupIncrementalProbeBucketed(spark, docs.filter(isNew), "graft.sig_index_spec"))
      info(s"shuffle exchanges: plain-index probe $nPlain, bucketed $nBucketed")
      assert(nBucketed == nPlain - 1,
        s"expected exactly one fewer exchange, got $nPlain -> $nBucketed")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("ivfIndexInsert appends a batch without retraining; assignments verified independently") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-ins").toString
    val e = SimilarityOps.ivfEmbeddings(spark, sf)
    val isBatch = pmod(col("vec_id"), lit(7)) === 0
    // build on the standing corpus, then insert the day's batch
    SimilarityOps.buildIvfIndexVecs(spark, e.filter(!isBatch), dir)
    val rawBatch = sources.Tables.embeddings(spark, sf).filter(isBatch)
      .select(col("vec_id"), col("embedding"))
    SimilarityOps.ivfIndexInsert(spark, rawBatch, dir)

    // the cells table now covers every vector exactly once
    val cells = spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("cid").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = e.count()
    assert(cells.length == total, s"cells has ${cells.length} rows, corpus $total")
    assert(cells.map(_._1).distinct.length == total, "duplicate vec_id in cells")

    // independent plain-Scala argmax-cosine against the STORED
    // centroids must reproduce every stored assignment (same
    // sequential fold order as the native expression → same doubles)
    val cent = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    cells.foreach { case (vid, cid) =>
      val best = cent.minBy { case (ccid, cv) => (-cos(vecs(vid), cv), ccid) }._1
      assert(best == cid, s"vec $vid stored in cell $cid but nearest centroid is $best")
    }

    // search still answers over the post-insert index
    assert(SimilarityOps.annIvfProbe(spark, sf, dir).collect().nonEmpty)
  }
}
