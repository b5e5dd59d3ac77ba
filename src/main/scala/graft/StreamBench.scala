package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.TaskEngine
import graft.streaming.TaskEngine.TaskEvent

/** Streaming-throughput probe: drives the lifecycle engine end to end
  * (file JSON source → flatMapGroupsWithState → parquet sink) over a
  * synthetic backlog and reports events/second. The reference's implied
  * envelope is ≈5 tasks/s/worker × worker count (BASELINE.md — Capacity
  * 10 ÷ 2 s simulated latency); this measures the Spark engine's
  * single-node equivalent. Diagnostic main, not a driver contract. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nTasks = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.builder(32).master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-streambench").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    // backlog: submit → assign → complete per task, split across files
    val perFile = 10000
    (0 until nTasks).grouped(perFile).zipWithIndex.foreach { case (ids, f) =>
      val lines = ids.flatMap { i =>
        Seq(
          s"""{"taskId":"t$i","kind":"submit","workerId":null,"seq":${i * 3L}}""",
          s"""{"taskId":"t$i","kind":"assign","workerId":"w${i % 100}","seq":${i * 3L + 1}}""",
          s"""{"taskId":"t$i","kind":"complete","workerId":null,"seq":${i * 3L + 2}}""")
      }
      Files.write(Paths.get(in, f"batch$f%04d.json"),
        String.join("\n", lines: _*).getBytes)
    }
    val s = spark
    import s.implicits._
    val events = spark.readStream
      .schema(Encoders.product[TaskEvent].schema)
      .option("maxFilesPerTrigger", "2")
      .json(in)
      .as[TaskEvent]
    val t0 = System.nanoTime()
    val q = TaskEngine.transitions(spark, events)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val nTransitions = spark.read.parquet(out).count()
    val nEvents = nTasks * 3L
    println(f"""{"metric":"stream_events_per_sec","value":${nEvents / sec}%.0f,"events":$nEvents,"transitions":$nTransitions,"sec":$sec%.2f}""")
    require(nTransitions == nEvents, s"expected $nEvents transitions, got $nTransitions")
    spark.stop()
  }
}
