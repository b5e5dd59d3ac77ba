package graft

import org.apache.spark.sql.functions._

/** The user-facing facade must return the same answers as the
  * oracle-gated queries for matching parameters (same plans, real
  * arguments). */
class TaskHiveSpec extends SparkSuite {
  import spark.implicits._

  private lazy val hive = TaskHive(spark, sf)

  test("getTaskByID matches the task_by_id oracle query at id=42") {
    val got = hive.getTaskByID("42").collect()
    val oracle = operators.TaskOps.taskById(spark, sf).collect()
    assert(got.toSeq == oracle.toSeq)
  }

  test("listTasks(None) matches list_all_tasks; status filter scans one partition") {
    val all = hive.listTasks(None, 100).collect()
    val oracle = operators.TaskOps.listAllTasks(spark, sf).collect()
    assert(all.toSeq == oracle.toSeq)
    val pending = hive.listTasks(Some("pending"), 50).collect()
    assert(pending.nonEmpty && pending.forall(_.getAs[Int]("status") == 0))
    assert(pending.length <= 50)
  }

  test("getTaskStats matches task_stats") {
    assert(hive.getTaskStats().collect().toSeq ==
      operators.TaskOps.taskStats(spark, sf).collect().toSeq)
  }

  test("getWorkerTasks returns only that worker's in-flight tasks") {
    val anyWorker = hive.listWorkers().select("worker_id")
      .as[String].head()
    val rows = hive.getWorkerTasks(anyWorker).collect()
    assert(rows.forall(_.getAs[String]("worker_id") == anyWorker))
  }

  test("submitTasks applies reference defaults (priority 5, pending)") {
    val in = Seq(("t1", "{\"k\":1}"), ("t2", "{\"k\":2}")).toDF("id", "payload")
    val out = hive.submitTasks(in).collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getAs[Int]("priority") == 5 &&
      r.getAs[Int]("status") == 0 && r.getAs[String]("task_type") == "default"))
    intercept[IllegalArgumentException] {
      hive.submitTasks(Seq("x").toDF("payload_only"))
    }
  }

  test("registerTaskProcessor installs a SQL-callable UDF") {
    hive.registerTaskProcessor("graft_proc_test", id => s"test:$id")
    assert(spark.sql("SELECT graft_proc_test('7') AS r").head().getString(0)
      == "test:7")
  }
}
