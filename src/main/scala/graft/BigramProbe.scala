package graft

import org.apache.spark.sql.functions._

/** Diagnostic (not part of the driver contract): stage decomposition
  * of the bigram-LM lines — the round-15 verdict's item 5. On the
  * 24k-doc real corpus `bigram_surprisal` / `_topv` were lines 2–3
  * (4.66 / 4.61 s; open vocabulary 2.9M bigrams), and the question is
  * WHICH stage binds: the c12 model aggregation, the model⋈stream
  * scoring join, or (for the topv form) the collected broadcast
  * tables. Times each sub-plan in isolation (forced with a count, min
  * of 2 passes) over the same tokenization the operator uses, so the
  * measured split is attributable and the fix-or-adjudicate decision
  * is a measurement, not a guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BigramProbe
  */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/realcorpus")
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](tag: String)(f: => T): T = {
      val t1 = System.nanoTime(); f; val a = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime(); val r = f; val b = (System.nanoTime() - t2) / 1e9
      println(f"[bigramprobe] $tag%-28s ${math.min(a, b)}%6.2f s")
      r
    }

    // mirror of TextOps.bigramsOf + the c12/c1 model build, inlined so
    // each stage can be forced in isolation
    val bi = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), xxhash64(col("bg.w1")).as("h1"),
        xxhash64(col("bg.w1"), col("bg.w2")).as("h12"))

    val nBi = time("tokenize+bigram stream")(bi.count())
    val c12 = bi.groupBy("h12", "h1").agg(count(lit(1)).as("c12"))
    val vocab = time("c12 model aggregation")(c12.count())
    val c1 = c12.groupBy("h1").agg(sum("c12").as("c1"))
    val scored = c12.join(c1, Seq("h1"))
      .select(col("h12"),
        round(lit(1e6) * log(col("c1").cast("double") / col("c12")))
          .cast("long").as("sur_micro"))
    time("scored model (c12 join c1)")(scored.count())
    time("stream join model + doc agg")(
      bi.join(scored, Seq("h12"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum("sur_micro").as("s")).count())
    println(s"[bigramprobe] |bigram instances| = $nBi, |vocab| = $vocab")
    time("bigram_surprisal full")(
      SparkEntry.queries("bigram_surprisal")(spark, sfDir).count())
    time("bigram_surprisal_topv full")(
      SparkEntry.queries("bigram_surprisal_topv")(spark, sfDir).count())
    time("unigram_surprisal full")(
      SparkEntry.queries("unigram_surprisal")(spark, sfDir).count())
    spark.stop()
  }
}
