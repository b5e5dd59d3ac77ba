package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for STORED OFFLINE ARTIFACTS — the one home for
  * the per-(session, key) caches behind the engine's "build once,
  * probe many" lifecycles: the existing-corpus cluster assignments,
  * banded/cell signature indexes, chunk dictionaries, the PCA basis,
  * and the shared detector pair frames. In production each of these is
  * a parquet artifact written by an offline job (buildSigIndex /
  * buildVecIndex / buildIvfIndex / buildClusterIndex are the real
  * writers); in a single session the memo is the stand-in — DataFrames
  * are localCheckpoint'd so every later consumer reads a materialized
  * table instead of re-running the corpus-sized derivation.
  *
  * STALENESS CONTRACT (explicit, by design): entries are keyed by
  * (session, key-string incl. the fixture dir) with NO data-change
  * invalidation — exactly like a persisted index, which does not
  * rebuild itself when its source table is rewritten. Regenerating
  * fixture data under the SAME path mid-session therefore serves the
  * stale artifact; call [[Memo.invalidate]] (or use a new
  * SparkSession, the test-suite convention) after rewriting a fixture
  * in place.
  *
  * LIFECYCLE: memoized DataFrames hold a strong reference back to
  * their SparkSession (value → key), so the WeakHashMap alone can
  * never collect a stopped session's entries. A SparkListener
  * registered per SparkContext therefore clears every entry owned by
  * that context at application end (and unpersists checkpointed
  * frames), so a JVM cycling many sessions — the test-suite shape —
  * releases driver maps and executor-resident localCheckpoint blocks
  * deterministically.
  */
private[graft] object Memo {

  private val store =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, Cell[_]]]

  // contexts that already carry the cleanup listener (identity by the
  // context's applicationId+startTime via the object itself)
  private val hookedContexts =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean])

  /** ONE-SHOT build cell: `getOrElseUpdate` on the session map elects a
    * single winning cell per key while holding the map lock only for
    * the (cheap, by-name) insertion; the build itself runs with NO
    * monitor held (builds nest — a stored cluster assignment composes
    * a shared pair frame, itself memoized) — losing threads' cells are
    * discarded UNBUILT, so a lost race costs a closure allocation,
    * never a duplicate Spark job or an orphaned localCheckpoint's
    * executor blocks (the round-8 advice item).
    *
    * DEADLOCK FAIL-FAST (round-9 advice): nested `cached()` builds
    * must form an ACYCLIC dependency order. Current builds nest
    * hierarchically (pair frame ← cluster assignment ← index dir), so
    * a cycle cannot occur today — but nothing in the call graph
    * enforces that, and under the old lazy-val scheme thread 1 inside
    * cell A's monitor calling cached(B) while thread 2 inside cell B
    * calls cached(A) would block both FOREVER. [[WaitGraph]] therefore
    * tracks builder/waiter edges and a thread about to wait on a cell
    * whose builder is (transitively) waiting on a cell this thread is
    * building gets an IllegalStateException naming the cycle instead
    * of a silent hang. */
  private final class Cell[T](build: => T) {
    @volatile private[Memo] var built = false
    @volatile private[Memo] var owner: Thread = null
    private var result: AnyRef = null

    def value: T = {
      if (built) return result.asInstanceOf[T]
      val me = Thread.currentThread()
      while (true) {
        if (WaitGraph.claimOrWait(this, me)) {
          // this thread won the build
          try {
            val v = build
            // `built` flips BEFORE owner release: a thread arriving in
            // the gap sees built and returns, never re-claims
            this.synchronized {
              result = v.asInstanceOf[AnyRef]; built = true; this.notifyAll()
            }
            WaitGraph.releaseOwner(this, me)
            return v
          } catch {
            case t: Throwable =>
              // owner cleared BEFORE the notify (round-10 advice): the
              // waiter's recheck is (!built && owner != null), so
              // clearing first makes this notifyAll impossible to miss
              // — waiters wake, see no owner, and re-compete
              WaitGraph.releaseOwner(this, me)
              this.synchronized(this.notifyAll())
              throw t
          }
        } else {
          // another thread is building: UNTIMED wait (round-10 advice —
          // the former 100 ms poll re-took the global WaitGraph lock
          // ~10×/s per blocked thread for the length of a multi-minute
          // build). The builder notifyAlls on BOTH success and failure;
          // the recheck runs under the cell monitor, which the notify
          // also needs, so the wakeup cannot be missed. The wait edge
          // stays registered until the wait truly ends (finally).
          try {
            this.synchronized {
              while (!built && (WaitGraph.ownerOf(this) ne null)) this.wait()
            }
          } finally WaitGraph.clearWait(me)
          if (built) return result.asInstanceOf[T]
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Global builder/waiter graph for [[Cell]] builds: claim a cell's
    * build or register a wait edge, failing fast on a cross-thread
    * cycle (me → cellA's builder → cellB → … → me). All state changes
    * run under one lock, so the cycle walk sees a consistent
    * snapshot. */
  private object WaitGraph {
    private val waitingOn =
      scala.collection.mutable.Map.empty[Thread, Cell[_]]

    /** True = `me` owns the build. False = another thread does and
      * `me`'s wait edge is registered (after passing the cycle
      * check). */
    def claimOrWait(cell: Cell[_], me: Thread): Boolean = synchronized {
      if (cell.built) return false
      cell.owner match {
        case null => cell.owner = me; true
        case `me` => throw new IllegalStateException(
          "re-entrant Memo build: a cached() build requires its own cell")
        case other =>
          var t: Thread = other
          var hops = 0
          while (t ne null) {
            if (t eq me) throw new IllegalStateException(
              s"Memo deadlock averted: cyclic cached() nesting — thread " +
                s"${me.getName} waits on a cell whose builder chain waits " +
                s"back on ${me.getName}'s own build; nested cached() " +
                "builds must be acyclic (see Cell's scaladoc)")
            hops += 1
            // a chain this deep can only be a cycle the walk cannot see
            // (or a pathological nesting) — fail fast rather than wait
            // blind (round-10 advice: falling through could hang)
            if (hops >= 1024) throw new IllegalStateException(
              "Memo wait-graph walk exceeded 1024 hops — builder/waiter " +
                "chain too deep to certify acyclic; refusing to wait")
            t = waitingOn.get(t).map(_.owner).orNull
          }
          waitingOn(me) = cell
          false
      }
    }

    def releaseOwner(cell: Cell[_], me: Thread): Unit = synchronized {
      if (cell.owner eq me) cell.owner = null
    }

    /** Current builder of `cell` under the graph lock — the waiter's
      * recheck predicate (cell monitor → graph lock is the one nesting
      * order used anywhere, so this cannot deadlock). */
    def ownerOf(cell: Cell[_]): Thread = synchronized(cell.owner)

    def clearWait(me: Thread): Unit = synchronized { waitingOn.remove(me) }
  }

  private def perSession(spark: SparkSession)
      : scala.collection.mutable.Map[String, Cell[_]] = store.synchronized {
    var m = store.get(spark)
    if (m == null) {
      m = scala.collection.mutable.Map.empty
      store.put(spark, m)
      hookContext(spark)
    }
    m
  }

  /** Register the end-of-application sweep once per SparkContext:
    * sessions sharing a context die with it (SparkSession.stop stops
    * the context), so applicationEnd is the deterministic point where
    * every entry owned by that context is unreachable-by-use. */
  private def hookContext(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (hookedContexts.add(sc)) {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          releaseContext(sc)
      })
    }
  }

  private def releaseContext(sc: org.apache.spark.SparkContext): Unit = {
    val owned = store.synchronized {
      import scala.jdk.CollectionConverters._
      val dead = store.entrySet().asScala
        .filter(en => en.getKey != null && (en.getKey.sparkContext eq sc))
        .toSeq
      val maps = dead.map(_.getValue)
      dead.foreach(en => store.remove(en.getKey))
      maps
    }
    owned.foreach { m =>
      val cells = m.synchronized { val cs = m.values.toSeq; m.clear(); cs }
      cells.foreach(unpersistCell)
    }
    // Also drain every batch ring owned by this context: ring entries
    // hold strong DataFrame → SparkSession references, so a surviving
    // ring pins the WeakHashMap key forever — the exact driver-side
    // leak this sweep exists to prevent (round-12 advice).
    val rings = batchRing.synchronized {
      import scala.jdk.CollectionConverters._
      val dead = batchRing.entrySet().asScala
        .filter(en => en.getKey != null && (en.getKey.sparkContext eq sc))
        .toSeq
      val rs = dead.map(_.getValue)
      dead.foreach(en => batchRing.remove(en.getKey))
      rs
    }
    rings.foreach(_.valuesIterator.foreach(unpersistRinged))
  }

  private def unpersistRinged(df: DataFrame): Unit =
    try { df.unpersist(false); () } catch { case _: Throwable => () }

  /** Best-effort block release for a BUILT DataFrame cell. Unpersist
    * after the context is stopped is a no-op, but clearing the map
    * alone already drops the driver-side references; on a still-live
    * context (invalidate mid-session) this frees the executor blocks. */
  private def unpersistCell(cell: Cell[_]): Unit =
    // only a BUILT cell is touched — forcing an unbuilt lazy val here
    // would launch the build (a Spark job) during teardown
    if (cell.built)
      try cell.value match {
        case df: org.apache.spark.sql.Dataset[_] => df.unpersist(false); ()
        case _ => ()
      } catch { case _: Throwable => () }

  /** Memoize any driver-side artifact (basis arrays, trained tables).
    * Exactly-once per (session, key): the winner cell runs the build
    * with no lock held (builds NEST — a stored cluster assignment
    * composes a shared pair frame, itself memoized). Nested builds
    * must be ACYCLIC; a cyclic nesting fails fast with
    * IllegalStateException instead of deadlocking (see [[Cell]]). */
  def cached[T](spark: SparkSession, key: String)(build: => T): T = {
    val m = perSession(spark)
    val cell = m.synchronized(
      m.getOrElseUpdate(key, new Cell[T](build))).asInstanceOf[Cell[T]]
    cell.value
  }

  /** Memoize a DataFrame artifact, materialized via localCheckpoint
    * (plan truncation + executor-resident blocks — the in-session
    * analog of the parquet the offline job would have written; set
    * `spark.graft.checkpointDir` consumers use reliable checkpoints
    * for their fixpoints, but a memoized artifact read N times in one
    * session is exactly what local blocks are for). The checkpoint runs
    * inside the winning cell only — a lost race never materializes. */
  def frame(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cached(spark, key)(build.localCheckpoint())

  /** Persist a BATCH-SIZED working frame with a BOUNDED per-session
    * lifecycle (round-11 advice): the incremental verdict paths
    * persist the day's signed batch so its 3–4 plan consumers share
    * one materialization, but a long-lived session processing
    * successive batches through a bare `.persist()` accumulates
    * MEMORY_AND_DISK entries without bound (identical plans dedupe in
    * CacheManager; distinct nightly batches do not). Each frame
    * persisted here joins a small per-session FIFO; beyond
    * [[BatchRingCap]] entries the OLDEST is unpersisted (blocking=
    * false — safe mid-query: Spark recomputes evicted blocks from
    * lineage, so the worst case is a recompute, never a wrong
    * answer). Cap 4 = the live query's frame plus a few in-flight
    * stragglers; a session can run any number of batches.
    *
    * RE-ARM AT RE-INVOCATION (round-18, verdict item 5): before
    * persisting, any PREVIOUS ring entry for the same canonicalized
    * plan is unpersisted — a ringed frame exists to dedupe the 3–4
    * consumers INSIDE one query's invocation, and letting a
    * re-invocation alias the surviving entry (CacheManager matches
    * persist() calls by canonicalized plan) meant the bench's passes
    * 2+ silently measured a warm cache instead of the batch signing
    * they claim to time. Every invocation therefore starts COLD and
    * recomputes from its inputs (MemoSpec pins it: the prior frame's
    * storage level drops to NONE when the plan is re-persisted). This
    * also bounds the round-17 advice hazard of a ringed frame serving
    * stale rows after its batch path is overwritten in-session: the
    * overwriting run's own re-invocation refreshes the entry; only a
    * consumer that never re-invokes the query can still see the stale
    * frame (use [[invalidate]] after an in-place rewrite, the Memo
    * staleness contract). A synchronous drain here — rather than an
    * end-of-action listener — is deliberate: the ExecutionListenerBus
    * is async, and a drain event from query N's action can land after
    * query N+1's construction has already ringed its frames,
    * unpersisting them mid-flight (measured as reappearing multi-scan
    * audit flags). */
  private val BatchRingCap = 4
  private val batchRing =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.LinkedHashMap[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]]

  def batchPersist(spark: SparkSession, df: DataFrame): DataFrame = {
    // ring entries are keyed by CANONICALIZED plan, because the cache
    // itself is: CacheManager dedupes persist() calls by plan, so a
    // surviving same-plan entry would alias the new persist to the
    // OLD (warm) blocks. Drop it FIRST (unpersist removes the
    // CacheManager entry synchronously; block release is async), so
    // the persist below creates a fresh, cold entry.
    val canon = df.queryExecution.analyzed.canonicalized
    val prior = batchRing.synchronized {
      val ring = batchRing.get(spark)
      if (ring == null) None else ring.remove(canon)
    }
    prior.foreach(unpersistRinged)
    val persisted = df.persist()
    val evict = batchRing.synchronized {
      var ring = batchRing.get(spark)
      if (ring == null) {
        ring = scala.collection.mutable.LinkedHashMap.empty
        batchRing.put(spark, ring)
      }
      ring.put(canon, persisted)
      if (ring.size > BatchRingCap) {
        val oldest = ring.head
        ring.remove(oldest._1)
        Some(oldest._2)
      } else None
    }
    evict.foreach(d => try d.unpersist(false) catch { case _: Throwable => () })
    persisted
  }

  /** Drop ONE cached key for this session (releasing a built frame's
    * executor blocks) — the staleness hook for per-store ANALYZE
    * detectors (round-15 advice): the narrow/wide dispatchers memoize
    * their saturation verdict per (session, store) exactly like
    * ANALYZE stats live beside a table, so a long-lived session whose
    * store GROWS past a saturation cut would keep the stale verdict
    * until restart. The maintenance commit point
    * ([[graft.operators.GraphOps.buildClusterIndex]]) clears the
    * detector keys through this, so the next dispatched run re-runs
    * the ANALYZE against the store it will actually probe. */
  def invalidateKey(spark: SparkSession, key: String): Unit = {
    val cell = store.synchronized {
      val m = store.get(spark)
      if (m == null) None else m.synchronized(m.remove(key))
    }
    cell.foreach(unpersistCell)
  }

  /** Drop every artifact cached for this session (and release built
    * frames' blocks) — required after regenerating fixture data under
    * an already-memoized path. */
  def invalidate(spark: SparkSession): Unit = {
    val m = store.synchronized(store.remove(spark))
    if (m != null) {
      val cells = m.synchronized { val cs = m.values.toSeq; m.clear(); cs }
      cells.foreach(unpersistCell)
    }
    // The batch ring too: CacheManager matches by canonicalized plan,
    // so a stale ringed frame would keep serving pre-regeneration
    // blocks to any identical plan after invalidate (round-12 advice).
    val ring = batchRing.synchronized(batchRing.remove(spark))
    if (ring != null) ring.valuesIterator.foreach(unpersistRinged)
  }
}
