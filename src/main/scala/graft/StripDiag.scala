package graft
import org.apache.spark.sql.functions._
object StripDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(4).master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val root = java.nio.file.Files.createTempDirectory("stripdiag").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val art = graft.streaming.IngestPipeline.buildArtifacts(spark,
      docs.filter(col("doc_id") % 5 =!= 0).select(col("doc_id"), col("text")),
      graft.sources.Tables.embeddings(spark, sf).filter(col("vec_id") % 5 =!= 0)
        .select(col("vec_id"), col("embedding")),
      s"$root/art")
    val frames = graft.streaming.IngestPipeline.loadArtifacts(spark, art, persist = true)
    println("DICT ROWS = " + frames.dict.count())
    val batch = docs.filter(col("doc_id") % 5 === 0).limit(250)
      .select(col("doc_id"), col("text"))
    val stripped = graft.operators.TextOps.stripAgainstDict(spark, batch, frames.dict)
    stripped.explain("formatted")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      stripped.write.mode("overwrite").parquet(s"$root/out$i")
      println(f"strip+write pass $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // stage deltas: anti-join only (no re-assembly), chunking only
    val chunked = batch.select(col("doc_id"),
      call_function("graft_chunks_pos", col("text"), lit(10)))
      .withColumn("fp", md5(col("chunk")))
    for (i <- 1 to 3) {
      var t0 = System.nanoTime(); chunked.count()
      println(f"chunk-only pass $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      chunked.join(frames.dict.select("fp"), Seq("fp"), "left_anti").count()
      println(f"chunk+anti pass $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
