package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the layout/curation batch: the Z-order
  * interleave is verified by de-interleaving the aggregated output,
  * the compaction bins by replaying the greedy prefix-sum rule, and
  * chunk/sample results against independent Scala reimplementations.
  * Plan shapes: CDC compaction must aggregate (never window-sort),
  * outlier thresholds must broadcast.
  */
class LayoutOpsSpec extends SparkSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("zorder_layout: de-interleaved z bits bound both dimensions of every bucket") {
    val rows = operators.LayoutOps.zorderLayout(spark, sf).collect()
    assert(rows.nonEmpty)
    def deinterleave(z: Int): (Int, Int) = {
      var x = 0; var y = 0
      for (i <- 0 until 4) {
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
      }
      (x, y)
    }
    rows.foreach { r =>
      val z = r.getAs[Int]("z")
      val (x, y) = deinterleave(z)
      // every custkey in the bucket has custkey % 16 == x
      assert(r.getAs[Long]("min_cust") % 16 == x, s"z=$z min_cust")
      assert(r.getAs[Long]("max_cust") % 16 == x, s"z=$z max_cust")
      // every day in the bucket falls in y's 160-day band (capped at 15)
      def band(d: Int) = math.min(15, d / 160)
      assert(band(r.getAs[Int]("min_day")) == y, s"z=$z min_day")
      assert(band(r.getAs[Int]("max_day")) == y, s"z=$z max_day")
    }
  }

  test("compaction_plan: greedy prefix-sum binning invariants hold per source") {
    val target = 16384L
    operators.LayoutOps.compactionPlan(spark, sf).collect()
      .groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
        val bins = rs.sortBy(_.getAs[Int]("bin"))
        assert(bins.head.getAs[Int]("bin") == 0, s"$src: first bin not 0")
        var cum = 0L
        bins.foreach { b =>
          val bin = b.getAs[Int]("bin")
          // the first doc of bin b saw exactly `cum` chars before it
          assert(cum / target == bin, s"$src bin $bin: prefix $cum")
          cum += b.getAs[Long]("bin_chars")
        }
        // doc-id ranges are disjoint and ordered across bins
        bins.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("max_doc") < b.getAs[Long]("min_doc"))
          case _ =>
        }
      }
  }

  test("chunk_dedup matches an independent Scala chunker") {
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
    val expected = docs.iterator
      .flatMap { r =>
        r.getAs[String]("text").split(" ", -1).grouped(10)
          .map(c => (md5hex(c.mkString(" ")), r.getAs[Long]("doc_id")))
      }
      .toSeq.groupBy(_._1).view
      .mapValues(v => (v.map(_._2).min, v.size.toLong)).toMap
      .filter(_._2._2 > 1)
    val got = operators.TextOps.chunkDedup(spark, sf).collect()
      .map(r => r.getAs[String]("fp") ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_count"))).toMap
    assert(got == expected,
      s"chunk sets differ: ${got.size} vs ${expected.size}")
  }

  test("stratified_sample matches an independent Scala hash-threshold filter") {
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
    val expected = docs.iterator.filter { r =>
      val thr = if (r.getAs[String]("source").drop(3).toInt % 2 == 0) "80" else "29"
      md5hex(r.getAs[Long]("doc_id").toString).take(2) < thr
    }.map(_.getAs[Long]("doc_id")).toSet
    val got = operators.TextOps.stratifiedSample(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected)
    // both strata must actually be sampled at distinct rates
    val bySrcParity = operators.TextOps.stratifiedSample(spark, sf).collect()
      .groupBy(_.getAs[String]("source").drop(3).toInt % 2)
    assert(bySrcParity.keySet == Set(0, 1))
  }

  test("cdc_latest aggregates (no window sort) and keeps the max event per key") {
    val df = operators.EventOps.cdcLatest(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept into the argmax plan:\n$plan")
    // argmax consistency: last_event_id really is the per-key max
    val viaMax = sources.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(max("event_id").as("m"))
    val joined = df.join(viaMax, Seq("user_id", "event_type"))
      .filter(col("last_event_id") =!= col("m")).count()
    assert(joined == 0)
  }

  test("value_outliers broadcasts the per-type threshold dim") {
    val df = operators.EventOps.valueOutliers(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$plan")
  }

  test("pii_redact output contains no digits in redacted props") {
    val bad = operators.TextOps.piiRedact(spark, sf)
      .filter(col("props_redacted").rlike("[0-9]")).count()
    assert(bad == 0)
  }
}
