package graft

/** DuckDB-dialect ANSI SQL oracles for every oracle-checkable query in
  * SparkEntry.queries. The CTE prefix mirrors graft.sources.Tables'
  * derivation exactly (FIXTURES.md §C) so both engines compute over
  * identical inputs.
  *
  * Determinism rules applied throughout (SURVEY.md §7.5):
  *  - every query ends in a total ORDER BY;
  *  - money/double sums go through CAST(ROUND(x*100) AS BIGINT) so the
  *    arithmetic is exact integer addition in both engines;
  *  - event timestamps (ns parquet) are only ever emitted as
  *    floor-epoch-second BIGINTs;
  *  - explicit NULLS FIRST on rollup sorts (Spark default) since DuckDB
  *    defaults to NULLS LAST;
  *  - window-function outputs cast to INT to match Spark's row_number.
  */
object Oracles {

  /** Shared derivation CTE — keep in lockstep with Tables.tasks/workers/
    * assignedTasks. */
  val CTE: String =
    """WITH tasks AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS id,
      |         CAST(1 + o_orderkey % 10 AS INT) AS priority,
      |         CAST(CASE WHEN o_orderstatus = 'P' THEN 1
      |                   WHEN o_orderstatus = 'O' THEN 0
      |                   ELSE 2 + o_orderkey % 3 END AS INT) AS status,
      |         o_orderdate AS create_time,
      |         o_orderpriority AS task_type,
      |         CAST(o_orderkey % 4 AS INT) AS retry_count,
      |         o_totalprice AS total_price,
      |         o_orderkey, o_custkey
      |  FROM orders
      |), workers AS (
      |  SELECT s_name AS worker_id, s_suppkey,
      |         10 AS capacity,
      |         CAST(s_suppkey % 11 AS INT) AS task_count,
      |         TIMESTAMP '2024-01-01 00:00:00'
      |           + (s_suppkey % 60) * INTERVAL 1 SECOND AS last_heartbeat
      |  FROM supplier
      |), supcnt AS (
      |  SELECT count(*) AS n FROM supplier
      |), assigned AS (
      |  SELECT t.*, w.worker_id
      |  FROM tasks t
      |  CROSS JOIN supcnt
      |  LEFT JOIN workers w
      |    ON t.status = 1
      |   AND w.s_suppkey = t.o_orderkey % supcnt.n
      |)
      |""".stripMargin

  private def q(sql: String): String = CTE + sql

  val sql: Map[String, String] = Map(
    "scan_tasks" -> q(
      "SELECT id, priority, status, task_type, create_time FROM tasks ORDER BY id"),
    "project_tasks" -> q(
      """SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |       '{"row_id":' || CAST(o_orderkey AS VARCHAR)
        |         || ',"cust":' || CAST(o_custkey AS VARCHAR) || '}' AS payload,
        |       5 AS priority, 0 AS status,
        |       o_orderpriority AS task_type
        |FROM orders ORDER BY id""".stripMargin),
    "task_stats" -> q(
      "SELECT status, COUNT(*) AS cnt FROM tasks GROUP BY status ORDER BY status"),
    "count_pending" -> q(
      "SELECT COUNT(*) AS cnt FROM tasks WHERE status = 0"),
    "filter_status" -> q(
      "SELECT id, priority, create_time, task_type FROM tasks WHERE status = 0 ORDER BY id"),
    "task_by_id" -> q(
      "SELECT id, status, priority, retry_count, worker_id FROM assigned WHERE id = '42'"),
    "status_decode" -> q(
      """SELECT id, status,
        |       CASE status WHEN 0 THEN 'pending' WHEN 1 THEN 'processing'
        |                   WHEN 2 THEN 'completed' WHEN 3 THEN 'failed'
        |                   WHEN 4 THEN 'delayed' ELSE 'unknown' END AS status_name
        |FROM tasks ORDER BY id""".stripMargin),
    "payload_json" -> q(
      "SELECT CAST(o_orderkey AS VARCHAR) AS id, o_orderkey AS row_id, o_custkey AS cust FROM orders ORDER BY id"),
    "retry_backoff" -> q(
      """SELECT id, retry_count,
        |       CASE WHEN retry_count <= 0 THEN 0
        |            ELSE CAST(2 * POWER(2, retry_count - 1) AS INT) END AS delay_sec
        |FROM tasks ORDER BY id""".stripMargin),
    "process_dispatch" -> q(
      """SELECT id, task_type,
        |       CASE WHEN task_type = '1-URGENT' THEN 'spider:row ' || id || ' processed'
        |            WHEN task_type = '2-HIGH' THEN 'wechat:row ' || id || ' processed'
        |            WHEN task_type IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') THEN 'noop:' || id
        |            ELSE 'error: no processor registered' END AS result,
        |       CAST(CASE WHEN task_type IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
        |            THEN 2 ELSE 3 END AS INT) AS new_status
        |FROM tasks ORDER BY id""".stripMargin),
    "list_all_tasks" -> q(
      "SELECT id, status, priority FROM tasks ORDER BY priority DESC, id LIMIT 100"),
    "priority_queue" -> q(
      """SELECT id, priority, create_time, task_type FROM tasks WHERE status = 0
        |ORDER BY priority DESC, create_time ASC, id ASC LIMIT 100""".stripMargin),
    "active_workers" -> q(
      """SELECT worker_id, task_count, capacity,
        |       last_heartbeat > TIMESTAMP '2024-01-01 00:00:40' - INTERVAL 30 SECOND AS is_active
        |FROM workers ORDER BY worker_id""".stripMargin),
    "available_workers" -> q(
      """SELECT worker_id, GREATEST(0, task_count) AS task_count, capacity
        |FROM workers WHERE capacity > 0 AND GREATEST(0, task_count) < capacity
        |ORDER BY worker_id""".stripMargin),
    "heartbeat_age" -> q(
      """SELECT worker_id,
        |       CAST(floor(epoch(TIMESTAMP '2024-01-01 00:00:40'))
        |            - floor(epoch(last_heartbeat)) AS BIGINT) AS age_sec
        |FROM workers ORDER BY worker_id""".stripMargin),
    "worker_load" -> q(
      """SELECT worker_id, COUNT(*) AS n_tasks FROM assigned
        |WHERE status = 1 GROUP BY worker_id ORDER BY worker_id""".stripMargin),
    "least_loaded_worker" -> q(
      "SELECT worker_id, task_count FROM workers ORDER BY task_count ASC, worker_id ASC LIMIT 1"),
    "worker_tasks_join" -> q(
      """SELECT a.worker_id, a.id, a.priority, w.task_count, w.capacity
        |FROM assigned a JOIN workers w ON a.worker_id = w.worker_id
        |WHERE a.status = 1 ORDER BY a.worker_id, a.id""".stripMargin),
    "orphaned_tasks" -> q(
      """SELECT id, worker_id, priority FROM assigned
        |WHERE status = 1 AND worker_id NOT IN (
        |  SELECT worker_id FROM workers
        |  WHERE last_heartbeat > TIMESTAMP '2024-01-01 00:00:40' - INTERVAL 30 SECOND)
        |ORDER BY id""".stripMargin),
  )
}
