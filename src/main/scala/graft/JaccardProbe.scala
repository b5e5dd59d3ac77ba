package graft

/** Diagnostic (not part of the driver contract): measures the
  * hash-prefix vs df-prefix Jaccard strategy crossover on given
  * fixture dirs — the measurement behind the 20k-doc threshold in
  * [[graft.operators.TextOps.ngramJaccard]]. Run after ScaleProbe:
  * `runMain graft.JaccardProbe /root/testdata/sf0.1 /tmp/sfx10`. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"JPROBE $tag%-22s rows=$n%8d t=${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    for (dir <- args.toSeq; pass <- 1 to 2) {
      time(s"hash $dir p$pass") {
        graft.operators.TextOps.ngramJaccardPrefixHash(spark, dir).count()
      }
      time(s"df   $dir p$pass") {
        graft.operators.TextOps.ngramJaccardPrefixDf(spark, dir).count()
      }
    }
    spark.stop()
  }
}
