package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** foreachBatch sink into the Hive metastore: transition batches land
  * in a managed table partitioned by batch_id, written with DYNAMIC
  * partition overwrite — a replayed micro-batch (restart after a sink
  * failure between write and checkpoint commit) overwrites its own
  * partition instead of appending duplicates. This is the
  * catalog-table form of the sink-side idempotence that makes
  * foreachBatch end-to-end exactly-once (the reference's etcd Txn
  * writes are idempotent the same way: keyed by task, not appended).
  *
  * Scale: one partition per micro-batch keeps the overwrite scoped to
  * the replayed batch only; downstream readers see the table through
  * the metastore with batch_id pruning available.
  */
object CatalogSink {

  val Database = "graft"
  val TransitionsTable = s"$Database.transitions_log"

  private def ensureTable(spark: SparkSession, like: DataFrame): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
    if (!spark.catalog.tableExists(TransitionsTable)) {
      like.withColumn("batch_id", lit(0L)).limit(0)
        .write.format("parquet").partitionBy("batch_id")
        .saveAsTable(TransitionsTable)
    }
  }

  /** The foreachBatch body: idempotent per-batch overwrite. */
  def writeBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    ensureTable(spark, batch)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      batch.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").insertInto(TransitionsTable)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
