package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Persistent-catalog surface: the Hive-metastore side of the engine
  * (BASELINE.json north star "Spark SQL + Hive metastore integration").
  * The reference keeps its task registry in etcd under status-prefixed
  * keys (/root/reference/common/constants.go:5-10); the warehouse
  * analog is a managed table PARTITIONED BY status, so the reference's
  * prefix scans become metastore partition pruning.
  *
  * Scale: a status-partitioned managed table means per-status queries
  * (the engine's hottest access path) scan exactly one partition's
  * files — asserted in CatalogSpec via the scan's PartitionFilters. At
  * 100 TB the write is a one-time ingest; here it runs once per JVM
  * per sfDir (cached below) so Verify/Bench don't re-ingest per query.
  */
object CatalogOps {

  val Database = "graft"
  val TasksTable = s"$Database.tasks_managed"

  // one ingest per (JVM, sfDir): content is deterministic per sfDir
  private val loaded = scala.collection.mutable.Set[String]()

  /** Create/refresh the managed status-partitioned tasks table from
    * the sfDir fixture. Idempotent per JVM+sfDir. */
  def ensureTasksTable(spark: SparkSession, sfDir: String): String = synchronized {
    if (!loaded.contains(sfDir)) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
      Tables.tasks(spark, sfDir)
        .write.mode("overwrite")
        .format("parquet")
        .partitionBy("status")
        .saveAsTable(TasksTable)
      loaded.clear() // only one sfDir resident at a time
      loaded += sfDir
    }
    TasksTable
  }

  /** A1 over the CATALOG: GetTaskStats via `spark.sql` against the
    * managed table — per-status counts are metadata-light scans of one
    * partition each. Output matches task_stats (same oracle shape). */
  def catalogTaskStats(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = ensureTasksTable(spark, sfDir)
    spark.sql(
      s"""SELECT status, COUNT(*) AS cnt FROM $tbl
         |GROUP BY status ORDER BY status""".stripMargin)
  }

  /** S4 over the CATALOG: one status partition's rows via partition
    * pruning on the managed table (the etcd prefix-scan analog). */
  def catalogPendingTasks(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = ensureTasksTable(spark, sfDir)
    spark.sql(
      s"""SELECT id, priority, create_time, task_type FROM $tbl
         |WHERE status = 0 ORDER BY id""".stripMargin)
  }
}
