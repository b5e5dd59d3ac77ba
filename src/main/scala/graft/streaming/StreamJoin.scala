package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join (§2.9): correlate two live event streams with
  * watermark-bounded state — the streaming analog of the reference's
  * dispatch↔completion correlation (a completion is only meaningful
  * within a bounded horizon of its dispatch;
  * /root/reference/tasks/dispatcher.go:297-309 correlates watch events
  * against in-flight assignments).
  *
  * Scale: both sides are watermarked AND the join carries a time-range
  * predicate, so Spark evicts join state past
  * watermark − range — state is O(events in the horizon), not
  * O(stream history). Join keys shuffle on user_id (high-cardinality,
  * uniform).
  */
object StreamJoin {

  /** Each purchase joined to the same user's clicks from the preceding
    * 10 minutes (inclusive bounds on both ends). */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    p.join(c,
      col("p_uid") === col("c_uid") &&
        col("c_ts") >= col("p_ts") - expr("interval 10 minutes") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_uid").as("user_id"))
  }
}
