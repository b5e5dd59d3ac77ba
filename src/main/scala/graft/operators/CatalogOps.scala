package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** HiveQL window surface over the catalog: top-5 tasks per status by
    * priority, straight SQL against the managed table. */
  def catalogTopkPerStatus(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = ensureTasksTable(spark, sfDir)
    spark.sql(
      s"""SELECT status, id, priority FROM (
         |  SELECT status, id, priority,
         |         row_number() OVER (PARTITION BY status
         |                            ORDER BY priority DESC, id) AS rn
         |  FROM $tbl) t
         |WHERE rn <= 5 ORDER BY status, id""".stripMargin)
  }

  val AssignedBucketed = s"$Database.assigned_bucketed"
  val WorkersBucketed = s"$Database.workers_bucketed"
  private val bucketed = scala.collection.mutable.Set[String]()

  /** Bucketed fact+dim pair: both tables bucketBy(8, worker_id) and
    * sorted within buckets, so an equi-join on worker_id is CO-LOCATED —
    * the bucketed scans already satisfy the join's required
    * distribution and ordering, and no exchange (and no sort) appears
    * in the plan (asserted in CatalogSpec with broadcast disabled). At
    * 100 TB this is THE repeated-join layout: pay the bucketed write
    * once, skip the fact-table shuffle on every subsequent join. */
  def ensureBucketedTables(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!bucketed.contains(sfDir)) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
      Tables.assignedTasks(spark, sfDir)
        .select("id", "status", "priority", "worker_id")
        .filter(col("worker_id").isNotNull)
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "worker_id").sortBy("worker_id")
        .saveAsTable(AssignedBucketed)
      Tables.workers(spark, sfDir)
        .select("worker_id", "capacity", "task_count")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "worker_id").sortBy("worker_id")
        .saveAsTable(WorkersBucketed)
      bucketed.clear()
      bucketed += sfDir
    }
  }

  /** J1 over the bucketed layout: per-worker processing load joined to
    * capacity, shuffle-free on the bucketed worker_id. The groupBy on
    * worker_id also rides the bucket distribution — the only exchange
    * in the whole plan is the final presentation ORDER BY. */
  def catalogBucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    ensureBucketedTables(spark, sfDir)
    spark.sql(
      s"""SELECT a.worker_id, COUNT(*) AS n_tasks, MAX(w.capacity) AS capacity
         |FROM $AssignedBucketed a JOIN $WorkersBucketed w
         |  ON a.worker_id = w.worker_id
         |WHERE a.status = 1
         |GROUP BY a.worker_id ORDER BY a.worker_id""".stripMargin)
  }

  // ---------------------------------------------------------------
  // The LLM-corpus side of the catalog: documents/embeddings as
  // managed partitioned tables (the warehouse layout a curation
  // pipeline reads from, vs the raw-parquet fixture path)
  // ---------------------------------------------------------------

  val DocumentsManaged = s"$Database.documents_managed"
  val EmbeddingsManaged = s"$Database.embeddings_managed"
  private val corpusLoaded = scala.collection.mutable.Set[String]()

  /** Create/refresh the managed corpus tables: documents PARTITIONED
    * BY source, embeddings PARTITIONED BY label — the partition keys a
    * curation run actually filters on (per-source quality/dedup
    * reports; per-cluster embedding jobs). In production the key is
    * (source, ingest_date); the fixture has no date column, so source
    * alone carries the pruning story. Idempotent per JVM+sfDir, like
    * [[ensureTasksTable]] — the write is the one-time ingest job. */
  def ensureCorpusTables(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!corpusLoaded.contains(sfDir)) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
      Tables.documents(spark, sfDir)
        .write.mode("overwrite").format("parquet")
        .partitionBy("source")
        .saveAsTable(DocumentsManaged)
      Tables.embeddings(spark, sfDir)
        .write.mode("overwrite").format("parquet")
        .partitionBy("label")
        .saveAsTable(EmbeddingsManaged)
      corpusLoaded.clear()
      corpusLoaded += sfDir
    }
  }

  /** The Gopher quality gate routed through the CATALOG, restricted to
    * one source — the per-source curation report shape: the source
    * predicate is a metastore partition filter, so the scan touches
    * exactly one partition's files (asserted in CatalogSpec) and the
    * rule bundle itself is the SHARED [[TextOps.gopherQualityOf]]
    * definition — same rules, different route. */
  def catalogDocumentsQuality(spark: SparkSession, sfDir: String): DataFrame = {
    ensureCorpusTables(spark, sfDir)
    TextOps.gopherQualityOf(
        spark.table(DocumentsManaged).filter(col("source") === "src7"))
      .orderBy("doc_id")
  }

  /** Partition-pruned embedding-store stats — the routing metadata an
    * embedding job reads before touching vectors (cardinality + id
    * range of one label partition, pure SQL over the catalog). */
  def catalogEmbeddingsStats(spark: SparkSession, sfDir: String): DataFrame = {
    ensureCorpusTables(spark, sfDir)
    spark.sql(
      s"""SELECT label, COUNT(*) AS n_vecs,
         |       MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
         |FROM $EmbeddingsManaged WHERE label IN (3, 4)
         |GROUP BY label ORDER BY label""".stripMargin)
  }
}
