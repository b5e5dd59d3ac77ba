package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for STORED OFFLINE ARTIFACTS — the one home for
  * the per-(session, key) caches behind the engine's "build once,
  * probe many" lifecycles: the existing-corpus cluster assignments,
  * banded/cell signature indexes, chunk dictionaries, the PCA basis,
  * and the shared detector pair frames. In production each of these is
  * a parquet artifact written by an offline job (buildSigIndex /
  * buildVecIndex / buildIvfIndex are the real writers); in a single
  * session the memo is the stand-in — DataFrames are localCheckpoint'd
  * so every later consumer reads a materialized table instead of
  * re-running the corpus-sized derivation.
  *
  * STALENESS CONTRACT (explicit, by design): entries are keyed by
  * (session, key-string incl. the fixture dir) with NO data-change
  * invalidation — exactly like a persisted index, which does not
  * rebuild itself when its source table is rewritten. Regenerating
  * fixture data under the SAME path mid-session therefore serves the
  * stale artifact; call [[Memo.invalidate]] (or use a new
  * SparkSession, the test-suite convention) after rewriting a fixture
  * in place. Dead sessions release their entries via the WeakHashMap.
  */
private[graft] object Memo {

  private val store =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, Any]]

  private def perSession(spark: SparkSession)
      : scala.collection.mutable.Map[String, Any] = store.synchronized {
    var m = store.get(spark)
    if (m == null) {
      m = scala.collection.mutable.Map.empty
      store.put(spark, m)
    }
    m
  }

  /** Memoize any driver-side artifact (basis arrays, trained tables).
    * The build runs OUTSIDE the map lock: builds nest (a stored
    * cluster assignment composes a shared pair frame, which is itself
    * memoized), and a reentrant getOrElseUpdate on one mutable map is
    * exactly the corruption shape to avoid. The race this admits —
    * two threads building the same key — wastes one duplicate build
    * (first insert wins); it can never serve a wrong artifact. */
  def cached[T](spark: SparkSession, key: String)(build: => T): T = {
    val m = perSession(spark)
    m.synchronized(m.get(key)) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val v = build
        m.synchronized(m.getOrElseUpdate(key, v)).asInstanceOf[T]
    }
  }

  /** Memoize a DataFrame artifact, materialized via localCheckpoint
    * (plan truncation + executor-resident blocks — the in-session
    * analog of the parquet the offline job would have written; set
    * `spark.graft.checkpointDir` consumers use reliable checkpoints
    * for their fixpoints, but a memoized artifact read N times in one
    * session is exactly what local blocks are for). */
  def frame(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cached(spark, key)(build.localCheckpoint())

  /** Drop every artifact cached for this session — required after
    * regenerating fixture data under an already-memoized path. */
  def invalidate(spark: SparkSession): Unit = store.synchronized {
    val m = store.get(spark)
    if (m != null) m.synchronized(m.clear())
  }
}
