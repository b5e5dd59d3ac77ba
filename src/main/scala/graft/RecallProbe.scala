package graft

/** ANN recall@10 measured where the vector GEOMETRY is real — the
  * round-16 verdict's last untested quality claim: the IVF/LSH/IVF-PQ
  * recall floors (IvfIndexSpec/IvfPqSpec, ≥0.5/0.6) run on the sf
  * fixtures only, whose synthetic embeddings need not distribute like
  * a real corpus's. This probe runs every approximate family against
  * the EXACT integer q8 brute-force top-10 ([[graft.operators
  * .SimilarityOps.annQ8Topk]] — the same ground truth the specs use)
  * on arbitrary stores (default: the /usr/share/doc real corpus and
  * its hard 10×), printing per-family mean and worst-query recall.
  * Results are recorded in BASELINE.md; a family below its fixture
  * floor on a real store gets a fix or an adjudication, not silence.
  *
  * Usage: runMain graft.RecallProbe [dir ...]
  */
object RecallProbe {
  import graft.operators.SimilarityOps

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/tmp/realcorpus", "/tmp/realcorpus10x")
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Each family is scored against the brute-force form of ITS OWN
    // exact metric: the q8 families rank by the integer q8 dot, the
    // float families by float cosine. On the fixtures the two ground
    // truths nearly coincide (similar norms); on real corpora they
    // genuinely disagree (q8 scales by per-vector max|v|, so q8-dot is
    // NOT a monotone function of cosine), and scoring a cosine ranker
    // against a dot baseline reports metric disagreement as fake
    // recall loss — round-17 measured exactly that (float families
    // 0.3 vs dot, healthy vs their own cosine baseline).
    type QFn = (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame
    val families: Seq[(String, String, QFn)] = Seq(
      ("ann_q8_lsh_topk", "q8dot", SimilarityOps.annQ8LshTopk _),
      ("ann_ivf_q8_topk", "q8dot", SimilarityOps.annIvfQ8Topk _),
      ("ann_ivf_pq_topk", "q8dot", SimilarityOps.annIvfPqTopk _),
      ("ann_lsh_topk", "cosine", SimilarityOps.annLshTopk _),
      ("ann_ivf_topk", "cosine", SimilarityOps.annIvfTopk _))
    for (dir <- dirs) {
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/embeddings.parquet"))) {
        println(s"RECALL $dir SKIPPED (no embeddings store)")
      } else {
        def topSets(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val exactBy = Map(
          "q8dot" -> topSets(SimilarityOps.annQ8Topk(spark, dir)),
          "cosine" -> topSets(SimilarityOps.cosineTopk(spark, dir)))
        require(exactBy.values.forall(_.nonEmpty),
          s"no exact top-k rows at $dir")
        for ((name, metric, fn) <- families) {
          val exact = exactBy(metric)
          val t0 = System.nanoTime()
          val approx = topSets(fn(spark, dir))
          val sec = (System.nanoTime() - t0) / 1e9
          val recalls = exact.toSeq.sortBy(_._1).map { case (q, ex) =>
            val ap = approx.getOrElse(q, Set.empty[Long])
            (ex intersect ap).size.toDouble / ex.size
          }
          val mean = recalls.sum / recalls.length
          println(f"RECALL $dir%s $name%-16s vs=$metric%-6s mean=$mean%.3f " +
            f"min=${recalls.min}%.3f queries=${recalls.length}%d sec=$sec%.2f")
        }
      }
    }
    spark.stop()
  }
}
