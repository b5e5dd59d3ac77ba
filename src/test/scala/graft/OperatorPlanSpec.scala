package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Every declared query runs; plan-shape assertions for the
  * scale-critical ones (pushdown reaches the scan, dims broadcast,
  * no accidental cartesian products). */
class OperatorPlanSpec extends SparkSuite {

  test("every SparkEntry query executes and most return rows at sf0.001") {
    val mayBeEmpty = Set("set_except") // BUILDING ⊂ order customers here
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle coverage: every oracleSql key is a declared query") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty, s"oracleSql without queries: $undeclared")
  }

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("filter_status pushes the status predicate into the parquet scan") {
    val plan = graft.operators.TaskOps.filterStatus(spark, sf)
      .queryExecution.executedPlan.toString
    // the derived status is computed from o_orderstatus; the source filter
    // on the scanned column must be pushed
    val optimized = graft.operators.TaskOps.filterStatus(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("PushedFilters") || optimized.contains("isnotnull"),
      s"no pushdown evidence in plan:\n$plan")
  }

  test("worker_tasks_join broadcasts the workers dim (no shuffle of tasks)") {
    val plan = executedPlanString(graft.operators.WorkerOps.workerTasksJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("scan_tasks reads only the projected columns") {
    val plan = graft.operators.TaskOps.scanTasks(spark, sf)
      .queryExecution.executedPlan.toString
    // projection needs 6 source cols; o_totalprice/o_custkey must be pruned
    assert(plan.contains("o_orderkey") && !plan.contains("o_totalprice"),
      s"column pruning failed:\n$plan")
  }

  test("priority_queue uses TakeOrderedAndProject (no global sort)") {
    val plan = graft.operators.TaskOps.priorityQueue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("cosine_topk broadcasts the query side") {
    val plan = executedPlanString(graft.operators.SimilarityOps.cosineTopk(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
  }

  test("round_robin_assign has no unpartitioned Window over the tasks side") {
    // round-18: the corpus-side global rank is the partition-offset
    // idiom (monotonically_increasing_id over the checkpointed sorted
    // frame + subtotal cumsum); the ONLY window is over the
    // per-partition SUBTOTAL frame (≤ explicitParts rows, keyed by a
    // constant) — never over the task corpus
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collectWithSubqueries { case x => x }.flatMap {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          qs +: allNodes(qs.plan)
        case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
        case x => Seq(x)
      }
    val df = graft.operators.AggOps.roundRobinAssign(spark, sf)
    df.collect()
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size <= 1, s"expected at most the subtotal window, got:\n$windows")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "subtotal window unpartitioned")
      // the window's input is the ≤ parts-row subtotal aggregate, not
      // the task corpus: its output must carry the subtotal column
      assert(w.child.output.exists(_.name == "sub"),
        s"window is not over the subtotal frame:\n$w")
    }
  }

  test("priority_balanced_assign: per-class fairness, no corpus-side window") {
    val rows = graft.operators.AggOps.priorityBalancedAssign(spark, sf)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(rows.nonEmpty)
    // every worker's share of EVERY priority class is equal ±1 —
    // the property plain round-robin does not give
    rows.groupBy(_._1).foreach { case (prio, inClass) =>
      val counts = inClass.groupBy(_._2).values.map(_.size)
      assert(counts.max - counts.min <= 1,
        s"priority $prio skew: per-worker counts ${counts.toSeq.sorted}")
    }
    // the only Window is over the (partition, priority) SUBTOTAL frame
    // (32×10 rows, keyed by priority) — never over the task corpus.
    // collectWithSubqueries stops at materialized AQE query stages, so
    // descend into them explicitly.
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p.collectWithSubqueries { case x => x }.flatMap {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          qs +: allNodes(qs.plan)
        case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
        case x => Seq(x)
      }
    val df = graft.operators.AggOps.priorityBalancedAssign(spark, sf)
    df.collect()
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1, s"expected 1 subtotal window, got:\n$windows")
    assert(windows.head.partitionSpec.nonEmpty, "subtotal window unpartitioned")
  }

  test("embedding_dedup joins on tile keys, not label alone") {
    val optimized = graft.operators.SimilarityOps.embeddingDedup(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("ti") && optimized.contains("tj"),
      s"tile keys missing from join:\n$optimized")
    val plan = executedPlanString(graft.operators.SimilarityOps.embeddingDedup(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("ngram_jaccard prefix path has no cartesian and verifies on arrays") {
    val plan = executedPlanString(graft.operators.TextOps.ngramJaccard(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    // round 10: the verify's intersection count is the native
    // sorted-merge kernel, not array_intersect
    assert(plan.contains("sortedintercount") || plan.contains("graft_sorted_icount"),
      s"native array verify missing:\n$plan")
  }

  test("topk_per_worker gets map-side WindowGroupLimit (bounded top-k before the shuffle)") {
    // Catalyst's InferWindowGroupLimit turns the rank<=k filter into a
    // Partial (pre-shuffle) + Final group limit — each mapper ships at
    // most k rows per worker instead of its whole partition. This is
    // why a custom bounded-heap top-k operator is NOT needed here.
    val plan = executedPlanString(graft.operators.WindowOps.topkPerWorker(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"no group limit:\n$plan")
    assert(plan.contains("Partial"), s"no map-side partial group limit:\n$plan")
  }

  test("result_json limits via TakeOrderedAndProject") {
    val plan = graft.operators.TaskOps.resultJson(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bm25_search: top-20 compiles to TakeOrderedAndProject, stats broadcast") {
    val plan = executedPlanString(graft.operators.RetrievalOps.bm25Search(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort instead of top-k:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"corpus stats not broadcast:\n$plan")
  }

  test("tfidf_terms: per-source top-3 gets map-side WindowGroupLimit") {
    val plan = executedPlanString(graft.operators.RetrievalOps.tfidfTerms(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"no group limit:\n$plan")
  }

  test("customers_with_urgent: EXISTS/NOT EXISTS decorrelate to semi + anti joins") {
    val df = graft.operators.JoinOps.customersWithUrgent(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), s"EXISTS not rewritten to semi join:\n$optimized")
    assert(optimized.contains("LeftAnti"), s"NOT EXISTS not rewritten to anti join:\n$optimized")
    // no correlated predicate survives to execution (per-row subquery = death at 100 TB)
    assert(!optimized.contains("exists#"), s"correlated exists survived optimization:\n$optimized")
  }

  test("parts_below_avg: correlated scalar AVG decorrelates to aggregate + join") {
    val df = graft.operators.JoinOps.partsBelowAvg(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // RewriteCorrelatedScalarSubquery: the per-part AVG becomes ONE
    // aggregate joined back — never a per-row subquery probe
    assert(!optimized.contains("scalar-subquery"),
      s"correlated scalar subquery survived optimization:\n$optimized")
    assert(optimized.contains("Aggregate") && optimized.contains("Join"),
      s"decorrelated aggregate+join missing:\n$optimized")
  }

  test("suppliers_waiting: multi-EXISTS self-correlation decorrelates to semi + anti joins") {
    val df = graft.operators.JoinOps.suppliersWaiting(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), s"EXISTS not rewritten to semi join:\n$optimized")
    assert(optimized.contains("LeftAnti"), s"NOT EXISTS not rewritten to anti join:\n$optimized")
    assert(!optimized.contains("exists#"), s"correlated exists survived optimization:\n$optimized")
  }

  test("idle_rich_customers: scalar AVG gate + NOT EXISTS decorrelate to one-shot subquery + anti join") {
    val df = graft.operators.JoinOps.idleRichCustomers(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftAnti"), s"NOT EXISTS not rewritten to anti join:\n$optimized")
    assert(!optimized.contains("exists#"), s"correlated exists survived optimization:\n$optimized")
    // the uncorrelated AVG stays a scalar subquery — evaluated once,
    // never per customer row
    assert(optimized.contains("scalar-subquery"),
      s"one-shot scalar AVG subquery missing:\n$optimized")
  }

  test("pending_gate: scalar count subqueries execute once, not per row") {
    val df = graft.operators.JoinOps.pendingGate(spark, sf)
    val plan = executedPlanString(df)
    // uncorrelated scalar subqueries plan as one-shot SubqueryExec
    // (never a per-row probe); the projection's copy and the gate's
    // copy dedupe via subquery reuse/merging
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"scalar subquery missing:\n$plan")
  }

  test("source_caps: per-source cap gets map-side WindowGroupLimit") {
    val plan = executedPlanString(graft.operators.TextOps.sourceCaps(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"no group limit:\n$plan")
    assert(plan.contains("Partial"), s"no map-side partial group limit:\n$plan")
  }

  test("doc_pack: no corpus window funnel and no driver-side collect") {
    val full = executedPlanString(graft.operators.TextOps.docPack(spark, sf))
    // AQE prints Final + Initial sections; assert on the final plan only
    val plan = full.split("== Initial Plan ==")(0)
    // the ONE allowed window is the exclusive cumsum over the
    // per-(partition, source) SUBTOTAL frame — ordered by partition id
    // `p`, fed by the subtotal HashAggregate. A corpus funnel would
    // order by doc_id.
    val wIdx = plan.indexOf("Window")
    assert(wIdx >= 0, s"subtotal cumsum window missing:\n$plan")
    assert(plan.indexOf("Window", wIdx + 1) < 0,
      s"more than one window in the prefix sum:\n$plan")
    assert(!plan.substring(wIdx).takeWhile(_ != '\n').contains("doc_id"),
      s"window orders by doc_id — corpus funnel crept back:\n$plan")
    assert(plan.indexOf("HashAggregate", wIdx) > wIdx,
      s"window not fed by the subtotal aggregate:\n$plan")
  }

  test("ann_q8_topk: query side broadcast, no cartesian") {
    val plan = executedPlanString(graft.operators.SimilarityOps.annQ8Topk(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }

  test("split_assign is a pure narrow projection (no exchange before the output sort)") {
    val plan = executedPlanString(graft.operators.TextOps.splitAssign(spark, sf))
    // exactly the one range exchange for the deterministic output order
    // (count only the final plan — AQE's string repeats the initial one)
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalPlan).size
    assert(exchanges <= 1, s"expected at most the output-sort exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"split assignment must not join or aggregate:\n$plan")
  }

  test("embedding_coverage: shuffle equi-join once broadcast is off (the 100 TB shape) + partial agg") {
    // at fixture scale the store broadcasts; at 100 TB both sides are
    // corpus-sized, so the plan that matters is the shuffle EQUI-join —
    // disable broadcast to pin that shape (same device as the bloom test)
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = executedPlanString(
        graft.operators.SimilarityOps.embeddingCoverage(spark, sf))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle equi-join:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"non-equi join shape:\n$plan")
      assert(plan.contains("partial_count") || plan.contains("Partial"),
        s"per-source aggregate should collapse map-side:\n$plan")
    } finally saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("bloom_prune_join: runtime bloom filter injected once size gates allow") {
    // The injection is size-gated for real workloads (creation side under
    // ~10 MB, probe scan over ~10 GB); at fixture scale the probe is tiny,
    // so the gates are widened here to prove the plan SHAPE is eligible —
    // shuffle join + selective creation-side filter — which is what makes
    // the 100 TB plan prune the probe scan.
    val conf = spark.conf
    val gates = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      // injection requires a SHUFFLE join: at fixture scale Catalyst would
      // classify both sides broadcast-able, which at 100 TB they are not
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = gates.keys.map(k => k -> conf.getOption(k)).toMap
    try {
      gates.foreach { case (k, v) => conf.set(k, v) }
      val opt = graft.operators.JoinOps.bloomPruneJoin(spark, sf)
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"), s"no bloom filter in plan:\n$opt")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }
}
