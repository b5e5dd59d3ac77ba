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

  private def prunedScans(df: org.apache.spark.sql.DataFrame)
      : Seq[FileSourceScanExec] = {
    df.collect()
    // descend into AQE query stages (a stage's plan is not a TreeNode
    // child, so a plain collect misses every scan past an exchange)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectWithSubqueries { case x => x }.flatMap {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          qs +: allNodes(qs.plan)
        case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
        case x => Seq(x)
      }
    allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
  }

  test("catalog corpus tables: (source, dt) / label partitions registered in the metastore") {
    CatalogOps.ensureCorpusTables(spark, sf)
    val docParts = spark.sql(s"SHOW PARTITIONS ${CatalogOps.DocumentsManaged}")
      .collect().map(_.getString(0))
    // two-level (source, dt) layout; dt coprime to source, so the full
    // 20 sources × 16 dates grid populates
    assert(docParts.length == 20 * 16, s"got ${docParts.length} leaves")
    assert(docParts.forall(p => p.startsWith("source=") && p.contains("/dt=2025-01-")))
    val bySource = docParts.groupBy(_.split("/")(0))
    assert(bySource.size == 20 && bySource.values.forall(_.length == 16),
      "every source must deliver on all 16 dates")
    val embParts = spark.sql(s"SHOW PARTITIONS ${CatalogOps.EmbeddingsManaged}")
      .collect().map(_.getString(0))
    assert(embParts.nonEmpty && embParts.forall(_.startsWith("label=")))
  }

  test("catalog_documents_quality prunes to the one source's partitions") {
    val df = CatalogOps.catalogDocumentsQuality(spark, sf)
    val scans = prunedScans(df)
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "source predicate must be a metastore partition filter")
    // one source = 16 dt leaves under the two-level (source, dt) layout
    assert(scans.forall(_.selectedPartitions.partitionCount == 16),
      "exactly one source's 16 dt leaves may be read")
    // and the rules agree with the parquet route on the same slice
    val viaParquet = graft.operators.TextOps.gopherQuality(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf)
        .filter(org.apache.spark.sql.functions.col("source") === "src7")
        .select("doc_id"), "doc_id")
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == viaParquet && viaParquet.nonEmpty)
  }

  test("catalog_documents_daily prunes to the 4-day window and fills all 4 days") {
    val df = CatalogOps.catalogDocumentsDaily(spark, sf)
    val scans = prunedScans(df)
    assert(scans.nonEmpty)
    // BOTH predicates (source equality + dt range) must be metastore
    // partition filters on the (source, dt) layout: src3 × 4 dates =
    // exactly 4 leaf directories read, through the AQE stages
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "source + dt predicates must be metastore partition filters")
    assert(scans.forall(_.selectedPartitions.partitionCount == 4),
      s"exactly the 4 (src3, dt) leaves may be read; got " +
        scans.map(_.selectedPartitions.partitionCount).mkString(","))
    // the decorrelated dt (coprime to source) makes the window
    // non-degenerate: every day of the window is populated
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("2025-01-05", "2025-01-06", "2025-01-07", "2025-01-08"))
    assert(rows.forall(_.getLong(1) > 0), "every window day must have docs")
  }

  test("catalog_dt_rollup prunes to one leaf per source (the dt-only axis)") {
    val df = CatalogOps.catalogDtRollup(spark, sf)
    val scans = prunedScans(df)
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "dt predicate must be a metastore partition filter")
    assert(scans.forall(_.selectedPartitions.partitionCount == 20),
      "exactly one dt leaf per source may be read")
    val rows = df.collect()
    assert(rows.length == 20 && rows.forall(_.getLong(1) > 0),
      "every source delivers on the rollup day (coprime dt)")
  }

  test("dynamic partition overwrite backfills exactly one (source, dt) leaf, idempotently") {
    // the production nightly-backfill shape on the two-level layout:
    // recompute ONE day of ONE source from upstream and INSERT
    // OVERWRITE — dynamic mode replaces only the leaves present in the
    // frame, so a backfill (or a retried one) can never clobber the
    // other 319 partitions. At 100 TB this is THE correction/ingest
    // idiom: writes are leaf-scoped and retries are idempotent.
    CatalogOps.ensureCorpusTables(spark, sf)
    val tbl = CatalogOps.DocumentsManaged
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      import org.apache.spark.sql.functions.input_file_name
      def leafFiles(src: String, dt: String): Set[String] =
        spark.table(tbl)
          .filter(org.apache.spark.sql.functions.col("source") === src &&
            org.apache.spark.sql.functions.col("dt") === dt)
          .select(input_file_name()).distinct().collect()
          .map(_.getString(0)).toSet
      val before = spark.table(tbl).collect().map(_.toSeq).toSet
      val filesBackfilled = leafFiles("src3", "2025-01-06")
      val filesControl = leafFiles("src7", "2025-01-06")

      // recompute the day from the upstream fixture (the backfill source)
      val cols = spark.table(tbl).columns
      def backfillOnce(): Unit =
        graft.sources.Tables.documents(spark, sf)
          .withColumn("dt", CatalogOps.ingestDt)
          .filter(org.apache.spark.sql.functions.col("source") === "src3" &&
            org.apache.spark.sql.functions.col("dt") === "2025-01-06")
          .select(cols.map(org.apache.spark.sql.functions.col): _*)
          .write.mode("overwrite").insertInto(tbl)
      backfillOnce()
      backfillOnce() // the retry a failed job scheduler produces

      assert(spark.sql(s"SHOW PARTITIONS $tbl").count() == 20 * 16,
        "backfill must not add or drop partitions")
      assert(spark.table(tbl).collect().map(_.toSeq).toSet == before,
        "recomputed day must reproduce the table content exactly")
      assert(leafFiles("src3", "2025-01-06") != filesBackfilled,
        "the backfilled leaf's files must have been rewritten")
      assert(leafFiles("src7", "2025-01-06") == filesControl,
        "dynamic overwrite must not touch any other leaf")
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      // the double-overwrite above is content-identical, so downstream
      // tests (and the ingest guard) remain valid — nothing to reset
    }
  }

  test("catalog_embeddings_stats prunes to the two label partitions") {
    val df = CatalogOps.catalogEmbeddingsStats(spark, sf)
    val scans = prunedScans(df)
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty))
    assert(scans.forall(_.selectedPartitions.partitionCount == 2))
  }

  test("ingest guard is metastore-global: another session's sfDir switch forces re-ingest") {
    // the round-9 advice scenario: the managed tables are shared
    // across sessions, so after session B overwrites them with a
    // DIFFERENT sfDir's rows, session A's next catalog query must
    // re-ingest its own sfDir — never silently read B's rows while
    // a stale per-session guard says "resident". (Runs last-ish in
    // the suite; the final call below restores the suite's sfDir.)
    val other = "/root/testdata/sf0.01"
    val sessionA = spark.newSession()
    val sessionB = spark.newSession()
    def stats(s: org.apache.spark.sql.SparkSession, dir: String) =
      CatalogOps.catalogTaskStats(s, dir).collect().map(_.toSeq).toSeq
    def direct(s: org.apache.spark.sql.SparkSession, dir: String) =
      TaskOps.taskStats(s, dir).collect().map(_.toSeq).toSeq
    val a1 = stats(sessionA, sf)
    assert(a1 == direct(sessionA, sf))
    val b = stats(sessionB, other)
    assert(b == direct(sessionB, other), "B must see its own sfDir's rows")
    assert(b != a1, "fixture SFs must differ for this test to mean anything")
    // A again, same sfDir as before — the guard must detect B's switch
    val a2 = stats(sessionA, sf)
    assert(a2 == a1, "A must re-ingest its sfDir, not read B's rows")
    // leave the shared tables holding the suite's sfDir for later tests
    assert(stats(spark, sf) == a1)
  }
}
