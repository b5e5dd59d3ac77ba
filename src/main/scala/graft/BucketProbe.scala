package graft

import org.apache.spark.sql.functions._

/** Diagnostic (not part of the driver contract): LSH bucket-size
  * distribution for the xxhash and poly MinHash pipelines — the
  * measurement behind the skew handling in the banded joins. A bucket
  * of size k contributes k² rows to the band self-join, so
  * `sum(k²)` IS the join's intermediate cardinality; giant buckets
  * (boilerplate-heavy corpora) are where banded LSH degenerates.
  * Usage: runMain graft.BucketProbe <sfDir> [<sfDir>...]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      val poly = graft.operators.SimilarityOps.polyBandedBuckets(spark, dir)
        .groupBy("band", "bucket").agg(count(lit(1)).as("k"))
        .agg(max("k").as("max_k"), sum(col("k") * col("k")).as("join_rows"),
          count(lit(1)).as("n_buckets"))
        .first()
      println(s"BUCKETS poly   $dir max_k=${poly.getLong(0)} " +
        s"join_rows=${poly.getLong(1)} n_buckets=${poly.getLong(2)}")
      val xx = graft.operators.SimilarityOps.xxhashBandedBuckets(spark, dir)
        .groupBy("band", "bucket").agg(count(lit(1)).as("k"))
        .agg(max("k").as("max_k"), sum(col("k") * col("k")).as("join_rows"),
          count(lit(1)).as("n_buckets"))
        .first()
      println(s"BUCKETS xxhash $dir max_k=${xx.getLong(0)} " +
        s"join_rows=${xx.getLong(1)} n_buckets=${xx.getLong(2)}")
    }
    spark.stop()
  }
}
