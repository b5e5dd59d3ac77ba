package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.{CatalogOps, TaskOps}

/** Hive-metastore surface: managed status-partitioned table + catalog
  * queries (north star "Spark SQL + Hive metastore integration"). */
class CatalogSpec extends SparkSuite {

  test("hive support is active and the managed table persists in the catalog") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
    CatalogOps.ensureTasksTable(spark, sf)
    assert(spark.catalog.tableExists(CatalogOps.TasksTable))
    val parts = spark.sql(s"SHOW PARTITIONS ${CatalogOps.TasksTable}")
      .collect().map(_.getString(0)).sorted
    assert(parts.length == 5 && parts.forall(_.startsWith("status=")))
  }

  test("catalog_task_stats over the managed table equals task_stats over parquet") {
    val cat = CatalogOps.catalogTaskStats(spark, sf).collect().map(_.toSeq).toSeq
    val raw = TaskOps.taskStats(spark, sf).collect().map(_.toSeq).toSeq
    assert(cat == raw && cat.nonEmpty)
  }

  test("pure-SQL DDL surface: CREATE TABLE / INSERT INTO / partition ops") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    spark.sql("DROP TABLE IF EXISTS graft.ddl_tasks")
    spark.sql(
      """CREATE TABLE graft.ddl_tasks (id STRING, priority INT)
        |USING parquet PARTITIONED BY (status INT)""".stripMargin)
    spark.sql(
      """INSERT INTO graft.ddl_tasks PARTITION (status = 0)
        |VALUES ('t1', 5), ('t2', 7)""".stripMargin)
    spark.sql("INSERT INTO graft.ddl_tasks PARTITION (status = 1) VALUES ('t3', 9)")
    val parts = spark.sql("SHOW PARTITIONS graft.ddl_tasks")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("status=0", "status=1"))
    assert(spark.sql("SELECT * FROM graft.ddl_tasks WHERE status = 0").count() == 2)
    spark.sql("ALTER TABLE graft.ddl_tasks DROP PARTITION (status = 1)")
    assert(spark.sql("SELECT * FROM graft.ddl_tasks").count() == 2)
    spark.sql("DROP TABLE graft.ddl_tasks")
    assert(!spark.catalog.tableExists("graft.ddl_tasks"))
  }

  test("bucketed worker_id join is shuffle-free (co-located scan, no exchange, no sort)") {
    CatalogOps.ensureBucketedTables(spark, sf)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        s"""SELECT a.worker_id, w.capacity
           |FROM ${CatalogOps.AssignedBucketed} a
           |JOIN ${CatalogOps.WorkersBucketed} w ON a.worker_id = w.worker_id""".stripMargin)
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val plan = executed.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // bucket-sorted scans satisfy the SMJ ordering too
      assert(plan.contains("SelectedBucketsCount"), s"not a bucketed scan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("catalog_bucketed_join matches the DataFrame-path worker load") {
    val cat = CatalogOps.catalogBucketedJoin(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(cat.nonEmpty)
    assert(cat.forall(_.length == 3))
  }

  test("status predicate prunes managed-table partitions to exactly one") {
    CatalogOps.ensureTasksTable(spark, sf)
    val df = spark.sql(
      s"SELECT id FROM ${CatalogOps.TasksTable} WHERE status = 0")
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // one selected partition (status=0), enforced as a partition filter
    assert(scans.forall(_.partitionFilters.nonEmpty))
    assert(scans.forall(_.selectedPartitions.partitionCount == 1))
  }
}
