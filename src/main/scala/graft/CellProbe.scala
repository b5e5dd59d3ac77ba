package graft

import org.apache.spark.sql.functions._

/** Diagnostic (not part of the driver contract): the 100× probe's
  * super-linear lines all share one suspected mechanism — a FIXED
  * partition-key space (q8 semantic cells, LSH buckets, the closed
  * 31-token fixture vocabulary's shingle universe) whose per-key
  * population grows linearly with corpus size, making same-key
  * candidate enumeration quadratic. This prints the key-population
  * histograms at each given fixture dir so the mechanism is measured,
  * not guessed: cells for the semantic family, band-buckets for the
  * MinHash family, shingle document-frequency for the PPJoin family.
  *
  * Usage: runMain graft.CellProbe /tmp/sfx10 /tmp/sfx100
  */
object CellProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    for (dir <- args.toSeq) {
      // semantic q8 cells
      val cells = graft.sources.Tables.embeddings(spark, dir)
        .select(call_function("graft_q8cell", col("embedding")).as("s"))
        .select(col("s.cell").as("cell"))
        .groupBy("cell").count()
      val cs = cells.agg(
        count(lit(1)).as("n_cells"), sum("count").as("n_vecs"),
        max("count").as("max_cell"),
        sum(col("count") * col("count")).as("sum_sq")).head()
      println(s"CELLPROBE $dir q8cells: n_cells=${cs.getLong(0)} " +
        s"vecs=${cs.getLong(1)} max=${cs.getLong(2)} sumSq=${cs.getLong(3)}")
      // the WIDE 4×16-bit form's (band, subcell) space — the round-14
      // mitigation measurement: the same corpus's Σc² under the 2⁸×
      // larger per-band universe (the semantic analog of the
      // widesimhash line below)
      val wcells = graft.sources.Tables.embeddings(spark, dir)
        .select(posexplode(
          call_function("graft_q8cellw", col("embedding")).getField("cells")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "subcell")
        .groupBy("band", "subcell").count()
      val wc = wcells.agg(
        count(lit(1)).as("n_cells"), max("count").as("max_cell"),
        expr("percentile_approx(count, 0.5)").as("p50"),
        sum(col("count") * col("count")).as("sum_sq")).head()
      println(s"CELLPROBE $dir wideq8cells: n_cells=${wc.getLong(0)} " +
        s"max=${wc.getLong(1)} p50=${wc.get(2)} sumSq=${wc.getLong(3)}")
      // minhash poly band buckets
      val docs = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val bands = graft.operators.SimilarityOps
        .withPolySignature(spark, docs, col("text"))
        .select(col("doc_id"),
          posexplode(graft.operators.SimilarityOps.polyBandSlices))
        .groupBy("pos", "col").count()
      val bs = bands.agg(
        count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
        sum(col("count") * col("count")).as("sum_sq")).head()
      println(s"CELLPROBE $dir minhash-band-buckets: " +
        s"n=${bs.getLong(0)} max=${bs.getLong(1)} sumSq=${bs.getLong(2)}")
      // shingle document frequency (the PPJoin candidate currency)
      val sh = docs
        .select(explode(
          call_function("graft_shingles", col("text"), lit(3))).as("sh"))
        .groupBy("sh").count()
      val ss = sh.agg(
        count(lit(1)).as("n_shingles"), max("count").as("max_df"),
        expr("percentile_approx(count, 0.5)").as("p50_df"),
        sum(col("count") * col("count")).as("sum_sq")).head()
      println(s"CELLPROBE $dir shingle-df: universe=${ss.getLong(0)} " +
        s"max_df=${ss.getLong(1)} p50_df=${ss.get(2)} sumSq=${ss.getLong(3)}")
      // the NARROW poly simhash (source, band, 10-bit chunk) space —
      // the round-14 dispatcher's detector currency (Σc²/doc): one
      // row via the same ANALYZE the dispatcher memoizes
      val ps = graft.operators.SimilarityOps.simhashBucketStats(spark, dir)
        .head()
      println(s"CELLPROBE $dir polysimhash-band-buckets: " +
        s"docs=${ps.getLong(0)} n=${ps.getLong(1)} max=${ps.getLong(2)} " +
        s"sumSq=${ps.getLong(3)} perDoc=${ps.getLong(4)}")
      // xxhash simhash pigeonhole buckets (round-11 verdict item 3/4:
      // the missing histogram that adjudicates simhash_dedup's 100×
      // line) — population of the (source, band, 7-bit chunk) key
      // space the candidate join enumerates within. The chunk universe
      // is FIXED (9 bands × ≤128 values × |sources|), so Σc² growing
      // quadratically with corpus size = candidate-bound, same
      // mechanism as the q8 cells.
      val simB = graft.operators.SimilarityOps
        .simhashBandedFrame(spark, dir)
        .groupBy("source", "band", "chunk").count()
      val sb = simB.agg(
        count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
        expr("percentile_approx(count, 0.5)").as("p50"),
        sum(col("count") * col("count")).as("sum_sq")).head()
      println(s"CELLPROBE $dir simhash-band-buckets: n=${sb.getLong(0)} " +
        s"max=${sb.getLong(1)} p50=${sb.get(2)} sumSq=${sb.getLong(3)}")
      // the WIDE 126-bit form's (source, band, 14-bit chunk) space —
      // the round-13 mitigation measurement: the same corpus's Σc²
      // under the 2⁷× larger chunk universe
      val wideB = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          posexplode(call_function("graft_polysimhash_wide", col("text"))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
        .groupBy("source", "band", "chunk").count()
      val wb = wideB.agg(
        count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
        expr("percentile_approx(count, 0.5)").as("p50"),
        sum(col("count") * col("count")).as("sum_sq")).head()
      println(s"CELLPROBE $dir widesimhash-band-buckets: n=${wb.getLong(0)} " +
        s"max=${wb.getLong(1)} p50=${wb.get(2)} sumSq=${wb.getLong(3)}")
    }
    spark.stop()
  }
}

/** Diagnostic: QUALIFYING output-pair counts for the 100×-probe
  * super-linear lines (round-11 verdict item 3) — separates honest
  * output growth (qualifying pairs really multiply at 100×) from
  * candidate blowup (pairs grow ~linearly while enumeration grows
  * quadratically). One count() per pair frame.
  *
  * Usage: runMain graft.PairProbe /tmp/sfx10 /tmp/sfx100
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    for (dir <- args.toSeq) {
      def n(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val c = df.count()
        println(f"PAIRPROBE $dir $name pairs=$c wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      n("ngram_jaccard", graft.operators.TextOps.ngramJaccard(spark, dir))
      n("simhash_dedup", graft.operators.SimilarityOps.simhashDedup(spark, dir))
      n("embedding_dedup", graft.operators.SimilarityOps.embeddingDedup(spark, dir))
      n("semantic_clusters_incremental_dups",
        graft.operators.GraphOps.semanticClustersIncremental(spark, dir)
          .filter(!col("kept")))
      // the wide STRESS-POINT pair queries — their qualifying-output
      // counts adjudicate the 100× wall ratios (at radius ≤8 / τ=0.30
      // the output itself is quadratic-by-semantics; these numbers are
      // the evidence)
      n("simhash_dedup_wide",
        graft.operators.SimilarityOps.simhashDedupWide(spark, dir))
      n("semantic_dedup_wide",
        graft.operators.SimilarityOps.semanticDedupWide(spark, dir))
    }
    spark.stop()
  }
}
