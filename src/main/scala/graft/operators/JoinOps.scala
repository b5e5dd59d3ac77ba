package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational join / set-op / grouping-set surface over the star schema
  * (SURVEY.md §2.3/2.6 — the reference's join surface is thin, so the
  * full Spark join family is demonstrated on the fixtures, with the
  * task↔worker association as the anchor).
  *
  * Scale: dims (region/nation/supplier) are broadcast; fact-fact joins
  * shuffle on the join key and rely on AQE for skew; money sums use
  * exact integer cents so plans can be AQE-reordered without float
  * nondeterminism.
  */
object JoinOps {

  private def cents(c: String) =
    round(col(c) * 100).cast("long")

  /** Inner equi-join orders ⋈ customer ⋈ nation with broadcast dims:
    * per-nation order count + exact revenue cents. */
  def joinOrdersCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), cents("o_totalprice").as("price_cents"))
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"), sum("price_cents").as("total_cents"))
      .orderBy("n_name")
  }

  /** Left-semi: customers that have at least one urgent order. */
  def semiJoinCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(spark, sfDir)
      .join(urgent, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Scalar-subquery dispatch gate — the reference dispatcher's "is
    * there anything to dispatch" check (tasks/dispatcher.go:394-408:
    * count pending, return early when zero) expressed as SQL a user
    * would actually write: a scalar COUNT subquery in both the
    * projection and the WHERE gate. Catalyst executes each scalar
    * subquery ONCE (a broadcast 1-row plan, shared via
    * ReusedSubquery), never per row — asserted by OperatorPlanSpec. */
  def pendingGate(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.tasks(spark, sfDir).createOrReplaceTempView("graft_tasks")
    spark.sql(
      """SELECT t.id, t.priority,
        |       (SELECT COUNT(*) FROM graft_tasks p WHERE p.status = 0) AS backlog
        |FROM graft_tasks t
        |WHERE t.status = 0
        |  AND (SELECT COUNT(*) FROM graft_tasks p2 WHERE p2.status = 0) > 0
        |ORDER BY t.id""".stripMargin)
  }

  /** Correlated EXISTS / NOT EXISTS (TPC-H Q4 shape): customers with at
    * least one urgent order and no completed ('F') order. Catalyst
    * DECORRELATES both subqueries into left-semi + left-anti hash joins
    * (asserted by OperatorPlanSpec — no per-row subquery execution), so
    * at 100 TB this is two shuffle joins on o_custkey, not |customer|
    * probe queries. */
  def customersWithUrgent(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c.c_custkey, c.c_name
        |FROM graft_customer c
        |WHERE EXISTS (SELECT 1 FROM graft_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM graft_orders f
        |                  WHERE f.o_custkey = c.c_custkey
        |                    AND f.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Per-group correlated SCALAR subquery (TPC-H Q17 shape): lineitems
    * below 20% of their part's average quantity — the "small orders"
    * probe a user writes with a correlated AVG. Generalizes the
    * reference dispatcher's count-gate (tasks/dispatcher.go:394-408)
    * from one global scalar to one scalar PER GROUP. Catalyst's
    * RewriteCorrelatedScalarSubquery turns the per-part AVG into ONE
    * aggregate + left outer join (asserted by OperatorPlanSpec), so at
    * 100 TB this is two passes over lineitem joined on l_partkey — not
    * |lineitem| point queries. Exactness: quantities are integral
    * doubles, so every per-part sum is exact and AVG and the 0.2
    * threshold product are bit-identical across engines; only integer
    * outputs are emitted. */
  def partsBelowAvg(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.part(spark, sfDir).createOrReplaceTempView("graft_part")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_lineitem")
    spark.sql(
      """SELECT p.p_partkey, p.p_brand,
        |       COUNT(*) AS n_small,
        |       CAST(SUM(l.l_quantity) AS BIGINT) AS small_qty
        |FROM graft_part p JOIN graft_lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand = 'Brand#4'
        |  AND l.l_quantity < CAST(0.2 AS DOUBLE) *
        |      (SELECT AVG(l2.l_quantity) FROM graft_lineitem l2
        |       WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY p.p_partkey, p.p_brand
        |ORDER BY p.p_partkey""".stripMargin)
  }

  /** Multi-EXISTS self-correlation (TPC-H Q21 shape): suppliers who
    * were the ONLY supplier with a returned item in a finished
    * multi-supplier order — one positive EXISTS and one negative
    * EXISTS, both correlated on the same fact table with an
    * INEQUALITY on a second column (l2.l_suppkey <> l1.l_suppkey).
    * Catalyst decorrelates both into left-semi/left-anti joins on
    * l_orderkey with the inequality as a join residual (asserted by
    * OperatorPlanSpec) — at 100 TB: three shuffle joins, zero per-row
    * probes. (Adapted to this schema: no receipt/commit dates, so the
    * "failed" predicate is l_returnflag = 'R'.) */
  def suppliersWaiting(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.supplier(spark, sfDir).createOrReplaceTempView("graft_supplier")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM graft_supplier s
        |JOIN graft_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN graft_orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM graft_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM graft_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin)
  }

  /** Uncorrelated scalar subquery + NOT EXISTS in ONE query (TPC-H
    * Q22 shape): per-nation count and balance of customers holding an
    * above-average (among positive-balance customers) balance who have
    * never placed an URGENT order (the fixture assigns every customer
    * some order, so the classic no-orders-at-all predicate is vacuous
    * here). Catalyst evaluates the AVG once as a
    * one-row subquery broadcast into the filter and rewrites the
    * NOT EXISTS into a left-anti join on o_custkey (asserted by
    * OperatorPlanSpec) — at 100 TB: one 1-row scalar plus one
    * shuffle anti-join, zero per-row probes. Balance totals are
    * emitted as exact integer cents like pricing_summary, keeping
    * the cross-engine hash compare float-free. (Adapted to this
    * schema: no phone country code, so the grouping key is
    * c_nationkey.) */
  def idleRichCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT c.c_nationkey, COUNT(*) AS numcust,
        |       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         AS totbal_cents
        |FROM graft_customer c
        |WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM graft_customer c2
        |                     WHERE c2.c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM graft_orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin)
  }

  /** Set op: BUILDING-segment customers ∩ urgent-order customers. */
  def setIntersect(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .intersect(
        Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Set op: BUILDING-segment customers with no orders at all. */
  def setExcept(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .except(Tables.orders(spark, sfDir).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Grouping sets: ROLLUP(status, priority) task counts — declares the
    * cube/rollup capability absent from the reference (SURVEY.md §2.4). */
  def statsRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tasks(spark, sfDir)
      .rollup("status", "priority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("status"), asc_nulls_first("priority"))

  /** Headline wide-scan aggregation (TPC-H Q1 shape): pricing summary
    * over lineitem with exact integer cents — the biggest-table scan
    * in the suite; partial aggregation means the shuffle carries one
    * row per (flag, status) per partition. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
        sum(cents("l_extendedprice")).as("sum_base_c"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("sum_disc_c"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-20 customers by exact revenue cents (TPC-H Q10 shape):
    * fact⋈fact join on o_custkey with a broadcast nation dim, then
    * TakeOrdered(20) — no global sort. */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), cents("o_totalprice").as("price_cents"))
    val c = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum("price_cents").as("revenue_cents"), count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue_cents"), asc("c_custkey"))
      .limit(20)
  }

  /** Multi-way star join with two fact tables: revenue by supplier
    * nation across lineitem ⋈ supplier ⋈ nation, exact cents. */
  def lineitemBySupplierNation(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), cents("l_extendedprice").as("price_cents"))
    val s = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    l.join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"), sum("price_cents").as("revenue_cents"))
      .orderBy("n_name")
  }

  /** TPC-H Q3-shaped shipping priority: BUILDING-segment customers'
    * orders placed before / shipped after the cutoff, top-10 by
    * revenue. The canonical two-fact star join: customer filters to a
    * broadcast-able key set, orders⋈lineitem shuffles on orderkey with
    * both date filters pushed to the scans, and the top-10 compiles to
    * TakeOrderedAndProject. Revenue in exact integer cents. */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = "1995-03-15 00:00:00"
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_cents"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum("rev_cents").as("revenue_cents"))
      .orderBy(desc("revenue_cents"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(10)
  }

  /** Fact-fact join shaped for RUNTIME BLOOM-FILTER pruning: lineitem ⋈
    * (selectively filtered) orders on orderkey, as a shuffle join. At
    * 100 TB neither side broadcasts; Catalyst's InjectRuntimeFilter
    * then builds a bloom filter from the filtered orders keys and
    * pushes `might_contain(l_orderkey)` into the lineitem SCAN, so
    * ~4/5 of the probe rows (the non-urgent share) die before the
    * shuffle instead of after it. The injection is size-gated
    * (creation side < 10 MB, probe scan > 10 GB by default), so the
    * fixture-scale plan doesn't show it; OperatorPlanSpec lowers the
    * gates and asserts the bloom filter appears. The merge hint models
    * the at-scale shuffle plan (a broadcast would subsume the bloom).
    * The bloom is plan-level only — output equals the plain join, which
    * is exactly what the oracle checks. */
  def bloomPruneJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"),
        cents("l_extendedprice").as("price_cents"))
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    li.hint("merge")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), sum("price_cents").as("revenue_cents"))
      .orderBy("l_returnflag")
  }

  /** Salted shuffle join under deliberate key skew. The fact side's
    * join key is skewed by construction (~80% of rows land on key 0 —
    * the "one hot customer" shape that stalls a shuffle join on one
    * reducer at 100 TB). Remedy: the fact row adds a deterministic
    * salt in [0,8); the DIM side explodes ×8, one copy per salt; the
    * join runs on (key, salt) so the hot key's rows spread over 8
    * reducers. Output is identical to the unsalted join (the oracle is
    * the plain join — salting is invisible in the result). AQE's
    * skew-join split is the automatic alternative; explicit salting is
    * the layout-controlled form that also handles skewed AGGREGATION
    * (see workerLoadSalted). Dim explosion is bounded: |dim| × 8 rows.
    * The dim is reduced to ONE row per k before salting (max s_name) so
    * the join is 1:N and `n_orders` genuinely counts orders — a dim with
    * duplicate keys would silently turn the count into order×supplier
    * pairs. */
  def skewJoinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val salts = 8
    val skewKey = when(col("o_orderkey") % 10 < 8, lit(0L))
      .otherwise(col("o_orderkey") % 100)
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), skewKey.as("k"),
        cents("o_totalprice").as("price_cents"),
        pmod(xxhash64(col("o_orderkey")), lit(salts)).as("salt"))
    val dim = Tables.supplier(spark, sfDir)
      .groupBy((col("s_suppkey") % 100).as("k"))
      .agg(max("s_name").as("s_name"))
      .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
      .withColumn("salt", col("salt").cast("bigint"))
    fact.join(dim, Seq("k", "salt"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_orders"), sum("price_cents").as("revenue_cents"),
        max("s_name").as("any_supplier"))
      .orderBy("k")
  }
}
