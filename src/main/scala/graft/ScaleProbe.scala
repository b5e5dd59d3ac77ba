package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (not part of the driver contract): synthesize an N×
  * replica of the corpus tables so the scaling curve gets a point
  * BEYOND the largest driver fixture, then watch for plan flips.
  *
  * Why synthesis is not naive replication: copying rows verbatim would
  * make every document an exact duplicate of its replicas, so the dedup
  * family would measure a pathological 100% duplicate rate (candidate
  * pairs grow quadratically per LSH bucket) instead of 10× the corpus at
  * the SAME duplicate structure. Instead each replica k>0:
  *  - documents: deterministically permutes the word order (sort words
  *    by xxhash64(word, k)). The word multiset — hence token counts,
  *    length/quality stats — is preserved, but shingle sets (the dedup
  *    currency) diverge, so replicas are NOT near-duplicates of each
  *    other and the per-replica duplicate structure mirrors the source.
  *  - embeddings: rotates the vector elements by k positions. Norms are
  *    preserved; pairwise-similarity structure within a replica is
  *    preserved up to the shared rotation, so ANN work per replica
  *    mirrors the source.
  * Ids are reindexed by a 10M-per-replica stride; all non-corpus tables
  * are symlinked so the task/event query families act as an unchanged
  * control group.
  *
  * Usage: runMain graft.ScaleProbe [srcDir] [outDir] [replicas]
  * then SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench / PlanAudit.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/sfx10"
    val replicas = if (args.length > 2) args(2).toInt else 10

    val spark = GraftSession.builder(16).master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Files.createDirectories(Paths.get(outDir))
    val stride = 10000000L

    val reps = explode(sequence(lit(0), lit(replicas - 1))).as("r")

    // documents: per-replica deterministic word permutation (see header)
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("*"), reps)
      .withColumn(
        "text",
        when(col("r") === 0, col("text")).otherwise(
          array_join(
            transform(
              array_sort(
                transform(
                  split(col("text"), " "),
                  w => struct(xxhash64(w, col("r")).as("h"), w.as("w")))),
              s => s("w")),
            " ")))
      .select(
        (col("doc_id") + col("r") * stride).as("doc_id"),
        col("text"),
        col("lang"),
        col("source"),
        length(col("text")).cast("long").as("n_chars"))
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    // embeddings: per-replica element rotation (norm-preserving)
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select(col("*"), reps)
      .select(
        (col("vec_id") + col("r") * stride).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("r") + 1,
              size(col("embedding")) - col("r")),
            slice(col("embedding"), lit(1), col("r")))).as("embedding"),
        col("label"))
    embs.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    // control group: everything else stays the source fixture
    val others = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events")
    others.foreach { t =>
      val link = Paths.get(s"$outDir/$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(s"$srcDir/$t.parquet"))
    }

    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"SCALEPROBE wrote $outDir documents=$nd embeddings=$ne " +
      s"(replicas=$replicas, src=$srcDir)")
    spark.stop()
  }
}
