package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-shape evidence: the production-table layout (status
  * partitioning → partition pruning), skew-safe aggregation
  * equivalence, and sketch-vs-exact error bounds. */
class ScaleShapeSpec extends SparkSuite {

  test("status-partitioned table prunes partitions on status filters") {
    val dir = Files.createTempDirectory("graft_parts").toString
    Tables.tasks(spark, sf)
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val pending = spark.read.parquet(dir).filter(col("status") === 0)
    val plan = pending.queryExecution.executedPlan.toString
    // partition pruning, not a data filter: status must appear in
    // PartitionFilters and the count must match the derived table
    assert(plan.contains("PartitionFilters"), plan)
    val expected = Tables.tasks(spark, sf).filter(col("status") === 0).count()
    assert(pending.count() == expected)
    // only the status=0 directory is listed
    assert(new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("status=")) == 5)
  }

  test("salted worker load equals the direct aggregation") {
    val direct = graft.operators.WorkerOps.workerLoad(spark, sf).collect().toSeq
    val salted = graft.operators.WorkerOps.workerLoadSalted(spark, sf).collect().toSeq
    assert(direct.map(r => (r.getString(0), r.getLong(1))) ==
      salted.map(r => (r.getString(0), r.getLong(1))))
  }

  test("approx_count_distinct within 5% of exact") {
    val exact = graft.operators.EventOps.eventUserStats(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.operators.EventOps.eventUserStatsApprox(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"$k: exact=$ex approx=$ap")
    }
  }
}
