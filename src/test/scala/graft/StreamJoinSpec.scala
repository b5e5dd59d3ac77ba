package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

/** Stream-stream inner join with watermarks: pairs within the horizon
  * join; state/late rows beyond the watermark are dropped. */
class StreamJoinSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("purchase-click join pairs within 10 minutes, drops beyond watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val joined = StreamJoin.purchaseClickJoin(
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      clicks.toDF().toDF("ts", "user_id", "event_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      // in-horizon pair for user 1; out-of-horizon click for user 2
      clicks.addData((ts("2024-01-01 00:00:00"), 1L, 100L),
        (ts("2024-01-01 00:00:00"), 2L, 101L))
      purchases.addData((ts("2024-01-01 00:05:00"), 1L, 200L),
        (ts("2024-01-01 00:20:00"), 2L, 201L))
      q.processAllAvailable()
      // advance both watermarks well past 00:20
      clicks.addData((ts("2024-01-01 02:00:00"), 3L, 102L))
      purchases.addData((ts("2024-01-01 02:01:00"), 3L, 202L))
      q.processAllAvailable()
      // late click inside user 1's old horizon: state is evicted → no pair
      clicks.addData((ts("2024-01-01 00:04:00"), 1L, 103L))
      q.processAllAvailable()
      val out = spark.table("ss_join")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(out.contains((200L, 100L)), s"in-horizon pair missing: $out")
      assert(out.contains((202L, 102L)), s"second pair missing: $out")
      assert(!out.contains((201L, 101L)), s"out-of-horizon pair joined: $out")
      assert(!out.contains((200L, 103L)), s"late click joined after eviction: $out")
    } finally q.stop()
  }
}
