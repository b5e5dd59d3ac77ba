package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry is a pure (SparkSession, sfDir) => DataFrame; oracle SQL
  * lives in [[Oracles]] keyed by the same names.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * task_stats = the reference's GetTaskStats (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    TaskOps.taskStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1/2.2 scans, projections, filters
    "scan_tasks" -> (TaskOps.scanTasks _),
    "project_tasks" -> (TaskOps.projectTasks _),
    "filter_status" -> (TaskOps.filterStatus _),
    "task_by_id" -> (TaskOps.taskById _),
    "count_pending" -> (TaskOps.countPending _),
    // §2.4 aggregations
    "task_stats" -> (TaskOps.taskStats _),
    "worker_load" -> (WorkerOps.workerLoad _),
    "least_loaded_worker" -> (WorkerOps.leastLoadedWorker _),
    // §2.5 sorts / limits
    "priority_queue" -> (TaskOps.priorityQueue _),
    "list_all_tasks" -> (TaskOps.listAllTasks _),
    // §2.3 joins
    "worker_tasks_join" -> (WorkerOps.workerTasksJoin _),
    "orphaned_tasks" -> (WorkerOps.orphanedTasks _),
    // §2.8 scalar functions
    "status_decode" -> (TaskOps.statusDecode _),
    "payload_json" -> (TaskOps.payloadJson _),
    "retry_backoff" -> (TaskOps.retryBackoff _),
    "process_dispatch" -> (TaskOps.processDispatch _),
    "heartbeat_age" -> (WorkerOps.heartbeatAge _),
    // §2.2 worker predicates
    "active_workers" -> (WorkerOps.activeWorkers _),
    "available_workers" -> (WorkerOps.availableWorkers _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}
