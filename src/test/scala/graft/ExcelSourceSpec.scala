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

  test("X3 ticker: AvailableNow drains the dir; a later run ingests only new files") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-excel-stream").toFile
    val out = s"${dir.getPath}/out"
    val ckpt = s"${dir.getPath}/ckpt"
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-excel")
        .load(s"${dir.getPath}/in")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }
    Files.createDirectories(Paths.get(s"${dir.getPath}/in"))
    Files.copy(Paths.get(SpiderXlsx), Paths.get(s"${dir.getPath}/in/a.xlsx"),
      StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    assert(spark.read.parquet(out).count() == 657)
    // the "ticker" fires again after a new generator file lands: only
    // b.xlsx is ingested (a.xlsx is in the committed offset)
    Files.copy(Paths.get(SpiderXlsx), Paths.get(s"${dir.getPath}/in/b.xlsx"),
      StandardCopyOption.REPLACE_EXISTING)
    runOnce()
    assert(spark.read.parquet(out).count() == 657 * 2)
  }

  test("ExcelOffset JSON round-trips paths with quotes and backslashes") {
    import graft.sources.ExcelOffset
    val paths = Seq("/plain/a.xlsx", "/with\"quote.xlsx", "/with\\back\\slash.xlsx", "")
    val off = ExcelOffset(paths)
    assert(ExcelOffset.fromJson(off.json()).files == paths)
    assert(ExcelOffset.fromJson(ExcelOffset(Seq.empty).json()).files.isEmpty)
  }

  test("batch read of a directory unions all xlsx files (one partition per file)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft-excel-batch").toFile
    Files.copy(Paths.get(SpiderXlsx), Paths.get(s"${dir.getPath}/a.xlsx"))
    Files.copy(Paths.get(SpiderXlsx), Paths.get(s"${dir.getPath}/b.xlsx"))
    val df = spark.read.format("graft-excel").load(dir.getPath)
    assert(df.count() == 657 * 2)
    assert(df.rdd.getNumPartitions == 2)
  }
}
