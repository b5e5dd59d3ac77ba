package graft

/** Fixture-dtype regression guard (round-5 lesson): the driver regenerated
  * events.parquet with `ts` as timestamp[us] where earlier rounds carried
  * int64 nanoseconds, and the events adapter's analysis exception silently
  * killed 15 queries, the bench, and two specs. These tests make any future
  * fixture regeneration fail FAST in `sbt test` with an attributable
  * message instead of surfacing as driver-time carnage.
  */
class FixtureSchemaSpec extends SparkSuite {

  test("every declared query analyzes against the current fixtures") {
    // .schema forces full analysis (column resolution, type checking) but
    // runs no job — the whole 125-query sweep is seconds, and it guards
    // every table adapter + derivation in one loop.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.next()}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis against $sf:\n" +
        failures.mkString("\n"))
  }

  test("events adapter normalizes ts/ts_ns for both known physical types") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // whatever the fixture carries, the contract holds
    val ev = sources.Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    // and the two columns agree at µs precision
    val bad = ev.filter(expr("unix_micros(ts) * 1000 != ts_ns")).count()
    assert(bad == 0L, s"$bad rows where ts and ts_ns disagree")

    // legacy shape (int64 ns) still adapts identically: rebuild a ns frame
    // from the current fixture and push it through the same branch
    val nsFrame = ev.select(col("event_id"), col("ts_ns").as("ts"))
    val adapted = sources.Tables.adaptEvents(nsFrame)
    assert(adapted.schema("ts").dataType == TimestampType)
    val mismatch = adapted.join(ev.select(col("event_id"), col("ts").as("want")), "event_id")
      .filter(col("ts") =!= col("want")).count()
    assert(mismatch == 0L, s"$mismatch rows differ between ns path and µs path")
  }
}
