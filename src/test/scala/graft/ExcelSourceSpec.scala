package graft

import org.apache.spark.sql.functions._

/** S1/S2/S3: the custom xlsx DataSource V2 against the reference's own
  * input file (read-only fixture). */
class ExcelSourceSpec extends SparkSuite {

  private val SpiderXlsx = "/root/reference/spider.xlsx"

  test("reads spider.xlsx: 657 data rows x 9 string columns, header as names") {
    val df = spark.read.format("graft-excel").load(SpiderXlsx)
    assert(df.columns.toSeq == Seq("taskId", "taskName", "domain", "type",
      "domLimit", "drive", "rootNodes", "companyId", "root"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 657) // A1:I658 minus header (SURVEY.md §1.3)
  }

  test("excel scan composes with the task projection (S1 end-to-end)") {
    val df = spark.read.format("graft-excel").load(SpiderXlsx)
      .select(
        concat(lit("wechat-task-"), col("taskId")).as("id"),
        lit(5).as("priority"),
        col("type").as("task_type"),
        col("domain"))
      .filter(col("domain").isNotNull)
    assert(df.count() == 657)
    val first = df.orderBy("id").head()
    assert(first.getAs[String]("id").startsWith("wechat-task-"))
    assert(first.getAs[Int]("priority") == 5)
  }

  test("count-only scan (S3 smoke: excel_test.go semantics)") {
    assert(spark.read.format("graft-excel").load(SpiderXlsx).count() == 657)
  }
}
