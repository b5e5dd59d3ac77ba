package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.functions.Exprs

/** Task-side query layer — the Spark re-expression of the reference's
  * HTTP/etcd query API (/root/reference/tasks/api.go) and task
  * projection path (/root/reference/tasks/spider.go:46-64).
  *
  * Every query is a pure (SparkSession, sfDir) => DataFrame with a total
  * ORDER BY, so the driver's Verify/Bench harness and the DuckDB oracle
  * can run it unchanged (SURVEY.md §7.1).
  *
  * Scale: all of these are single-scan narrow plans or a single hash
  * aggregation; filters and projections push down to the parquet scan
  * (verified via .explain PushedFilters/ReadSchema in the specs). At
  * 100 TB the `status` filters become partition pruning on a
  * status-partitioned table.
  */
object TaskOps {

  /** S4/P2-ish full scan with projection (etcd prefix scan analog). */
  def scanTasks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .select("id", "priority", "status", "task_type", "create_time")
      .orderBy("id")

  /** P1: Excel-row → Task projection (tasks/spider.go:46-64) with submit
    * defaults (priority 5, status pending, tasks/dispatcher.go:175-189).
    * The payload is built with plain string concat so the oracle can
    * reproduce it byte-for-byte (JSON formatter output differs between
    * engines; to_json round-trip is covered by payloadJson below). */
  def projectTasks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey").cast("string").as("id"),
      concat(
        lit("{\"row_id\":"), col("o_orderkey").cast("string"),
        lit(",\"cust\":"), col("o_custkey").cast("string"),
        lit("}")).as("payload"),
      lit(5).as("priority"),
      lit(Tables.Pending).as("status"),
      col("o_orderpriority").as("task_type"))
      .orderBy("id")

  /** A1: GetTaskStats — per-status COUNT(*) (tasks/api.go:200-240).
    * Partial (map-side) aggregation + tiny final shuffle; at scale this
    * is metadata-only per status partition. */
  def taskStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .groupBy("status")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("status")

  /** S6: count-only scan of one status partition
    * (tasks/api.go:207-232 WithCountOnly). */
  def countPending(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .filter(col("status") === Tables.Pending)
      .agg(count(lit(1)).as("cnt"))

  /** P2: ListTasks(status=pending) — one status partition
    * (tasks/api.go:122-163). */
  def filterStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .filter(col("status") === Tables.Pending)
      .select("id", "priority", "create_time", "task_type")
      .orderBy("id")

  /** P6: GetTaskByID — point lookup incl. worker extraction from the
    * processing composite key (tasks/api.go:43-111). One pruned scan
    * instead of the reference's 5-partition probe. */
  def taskById(spark: SparkSession, sfDir: String): DataFrame =
    Tables.assignedTasks(spark, sfDir)
      .filter(col("id") === "42")
      .select("id", "status", "priority", "retry_count", "worker_id")

  /** F3: status enum decode (common/constants.go:49-63). */
  def statusDecode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .select(col("id"), col("status"),
        Exprs.statusName(col("status")).as("status_name"))
      .orderBy("id")

  /** Pivot: per-task-type counts spread across status columns (the
    * GetTaskStats matrix view). Explicit pivot values keep the plan a
    * single pass (no distinct-values pre-query) and pin the output
    * schema for the oracle — at scale an unbounded pivot would need
    * the values enumerated anyway. */
  def statusPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .groupBy("task_type")
      .pivot("status", Seq(0, 1, 2, 3, 4))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("0" -> "n_pending", "1" -> "n_processing",
        "2" -> "n_completed", "3" -> "n_failed", "4" -> "n_delayed"))
      .orderBy("task_type")

  /** S11: the HTTP API's JSON result encoding (api/server.go:49-50,
    * 66-67 marshals task lists; default result limit 100,
    * api/server.go:36). The serving loop itself stays out of engine
    * scope (SURVEY.md §2.1); this is the encode layer: each row
    * rendered as the response JSON object, built with plain concat so
    * the oracle reproduces it byte-for-byte (engine JSON formatters
    * differ; the lossless to_json round-trip is covered by
    * payload_json). TakeOrdered limit — no global sort. */
  def resultJson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .orderBy("id").limit(100)
      .select(col("id"),
        concat(
          lit("{\"id\":\""), col("id"),
          lit("\",\"status\":"), col("status").cast("string"),
          lit(",\"priority\":"), col("priority").cast("string"),
          lit(",\"task_type\":\""), col("task_type"),
          lit("\"}")).as("json"))
      .orderBy("id")

  /** P8/F4: composite processing-key round-trip. The reference stores
    * in-flight tasks under `/tasks/processing/{worker}/{task}` and
    * splits the key back with SplitProcessingKey
    * (/root/reference/common/utils.go:25-31,
    * /root/reference/common/constants.go:8). Here the key is
    * materialized with concat and split back with substring_index —
    * all codegen'd string ops — and the status segment decodes through
    * [[Exprs.statusCode]] (the from-string direction of F3). Narrow
    * single-scan plan; at scale this is the key-parsing projection of
    * an etcd-export ingest. */
  def keySplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.assignedTasks(spark, sfDir)
      .filter(col("status") === Tables.Processing && col("worker_id").isNotNull)
      .withColumn("key",
        concat(lit("/tasks/"), Exprs.statusName(col("status")), lit("/"),
          col("worker_id"), lit("/"), col("id")))
      .select(col("key"),
        Exprs.statusCode(
          substring_index(substring_index(col("key"), "/", 3), "/", -1))
          .as("key_status"),
        substring_index(substring_index(col("key"), "/", 4), "/", -1)
          .as("key_worker"),
        substring_index(col("key"), "/", -1).as("key_task"))
      .orderBy("key")

  /** F6: payload JSON encode/decode round-trip (model/model.go:32-35).
    * Spark builds the payload with to_json and reads it back with
    * from_json; the oracle checks the extracted values against the
    * source columns directly — proving the round-trip is lossless. */
  def payloadJson(spark: SparkSession, sfDir: String): DataFrame = {
    val payloadSchema = StructType(Seq(
      StructField("row_id", LongType),
      StructField("cust", LongType)))
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey").cast("string").as("id"),
        to_json(struct(
          col("o_orderkey").as("row_id"),
          col("o_custkey").as("cust"))).as("payload"))
      .select(
        col("id"),
        from_json(col("payload"), payloadSchema).as("p"))
      .select(col("id"), col("p.row_id").as("row_id"), col("p.cust").as("cust"))
      .orderBy("id")
  }

  /** F5: retry backoff (tasks/worker.go:72-79), jitter-free for oracle
    * determinism. */
  def retryBackoff(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .select(col("id"), col("retry_count"),
        Exprs.backoffSec(col("retry_count")).as("delay_sec"))
      .orderBy("id")

  /** X1: processor dispatch by task type — the CASE-over-type analog of
    * the processor registry (tasks/worker.go:241-251); unknown type →
    * failed, mirroring the registry miss path. */
  def processDispatch(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .select(
        col("id"), col("task_type"),
        when(col("task_type") === "1-URGENT",
          concat(lit("spider:row "), col("id"), lit(" processed")))
          .when(col("task_type") === "2-HIGH",
            concat(lit("wechat:row "), col("id"), lit(" processed")))
          .when(col("task_type").isin("3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
            concat(lit("noop:"), col("id")))
          .otherwise(lit("error: no processor registered")).as("result"),
        when(col("task_type").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
          lit(Tables.Completed)).otherwise(lit(Tables.Failed))
          .cast("int").as("new_status"))
      .orderBy("id")

  /** X1, registry form: same dispatch as [[processDispatch]] but driven
    * by [[graft.functions.Processors]] — per-type processors registered
    * as session UDFs, the dispatch CASE and the miss→failed status both
    * DERIVED from the registry (add a processor = one register call).
    * Shares processDispatch's oracle byte-for-byte. */
  def processDispatchUdf(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.Processors.register(spark)
    Tables.tasks(spark, sfDir)
      .select(
        col("id"), col("task_type"),
        graft.functions.Processors.dispatch(col("id"), col("task_type")).as("result"),
        graft.functions.Processors.newStatus(col("task_type")).as("new_status"))
      .orderBy("id")
  }

  /** U1: ListTasks("") — all five status partitions unioned
    * (tasks/api.go:139-159), then globally ordered + limited. Expressed
    * as an explicit 5-way unionByName to exercise the operator; Catalyst
    * collapses it back into one scan per child with pushed filters. */
  def listAllTasks(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.tasks(spark, sfDir).select("id", "status", "priority")
    val perStatus = Seq(Tables.Pending, Tables.Processing, Tables.Completed,
      Tables.Failed, Tables.Delayed)
      .map(s => t.filter(col("status") === s))
    perStatus.reduce(_ unionByName _)
      .orderBy(desc("priority"), asc("id"))
      .limit(100)
  }

  /** O1: priority queue — pending tasks by priority desc, FIFO tiebreak
    * (tasks/dispatcher.go:221-223), top 100. TakeOrderedAndProject: no
    * global sort materialization at scale. */
  def priorityQueue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .filter(col("status") === Tables.Pending)
      .select("id", "priority", "create_time", "task_type")
      .orderBy(desc("priority"), asc("create_time"), asc("id"))
      .limit(100)

  /** MERGE-INTO (upsert) as one plan — the lakehouse maintenance op:
    * a staging batch of task updates (every 7th task re-prioritized;
    * every 21st arriving under a NEW id) merged into the base table.
    * Semantics = SQL MERGE: matched → update, not-matched-by-target →
    * insert, not-matched-by-source → keep. One full-outer shuffle
    * join on the task id — exactly what Delta/Iceberg MERGE plans
    * under the hood (plus their file rewrite); the `action` column
    * makes the three-way branch auditable. At 100 TB the base side
    * would additionally prune to files whose id-range min/max
    * intersects the staging batch (see LayoutOps.zorderLayout). */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.tasks(spark, sfDir)
      .select(col("id"), col("priority"), col("status"))
    val updates = Tables.tasks(spark, sfDir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(
        when(col("o_orderkey") % 21 === 0, concat(col("id"), lit("-new")))
          .otherwise(col("id")).as("uid"),
        (col("priority") + 1).as("upriority"))
    base.join(updates, base("id") === updates("uid"), "full_outer")
      .select(
        coalesce(col("uid"), col("id")).as("id"),
        coalesce(col("upriority"), col("priority")).as("priority"),
        coalesce(col("status"), lit(0)).as("status"),
        when(col("id").isNull, "insert")
          .when(col("uid").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("id")
  }
}
