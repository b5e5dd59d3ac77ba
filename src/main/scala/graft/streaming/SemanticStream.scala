package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingestion-time SEMANTIC near-dup detection — the streaming form of
  * [[graft.operators.SimilarityOps.semanticPairs]] (SemDeDup-style
  * embedding dedup), completing the family's third shape: batch
  * (`semantic_dedup`), nightly incremental (`semantic_incremental` +
  * stored index), and this — duplicates caught the moment the second
  * member arrives. Text twin: [[NearDupStream]].
  *
  * Streaming-legal re-expression of the within-cell self-join:
  *  - signature: the SAME native expression as batch
  *    ([[graft.functions.Q8CellSig]] — stateless, so legal on a
  *    streaming frame; shared object, can't fork), so stream and
  *    batch signatures are bit-identical;
  *  - the cell id is the group key; per-cell keyed state holds the
  *    (vec_id, q8, ‖v‖²) of every prior member; an arriving vector
  *    emits a pair per qualifying member (the SAME integer predicate:
  *    dot > 0 ∧ dot²·10⁴ ≥ τ²·‖a‖²·‖b‖²) and appends itself.
  *    Within one micro-batch, arrivals process in vec_id order so
  *    output is deterministic under replay (exactly-once append sink
  *    under checkpoint recovery).
  *
  * Null-element normalization: state encodes q8 as Seq[Long], so null
  * elements map to 0 BEFORE entering state — semantics-preserving by
  * construction (a null element contributes 0 to both dot and ‖v‖² in
  * the batch form), spec-pinned stream ≡ batch.
  *
  * Scale design: state partitions by cell — 256 cells at P=8 is too
  * coarse for a 100 TB store (hot-cell state grows with corpus), so
  * the production deployment raises P the same way the batch side
  * shards cells, and/or bounds the horizon with the watermark variant
  * of [[NearDupStream.bucketStepBounded]] (the trade documented
  * there). The per-pair work is one integer dot — identical to the
  * batch verify.
  */
object SemanticStream {

  case class VecSig(vecId: Long, q8: Seq[Long], na2: Long)
  case class SemPair(a_id: Long, b_id: Long, dot: Long, cos2_e6: Long)

  import graft.operators.SimilarityOps.{SemTauE2 => TauE2}

  private def dotOf(a: Seq[Long], b: Seq[Long]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum

  /** Per-cell state update: emit a pair for every qualifying (prior
    * member, arrival); process arrivals in vec_id order; append
    * arrivals. Pure function of (sorted arrivals, prior state). */
  private[graft] def cellStep(arrivals: Iterator[VecSig],
      state: GroupState[List[VecSig]]): Iterator[SemPair] = {
    var members = state.getOption.getOrElse(Nil)
    val out = List.newBuilder[SemPair]
    arrivals.toSeq.sortBy(_.vecId).foreach { v =>
      members.foreach { m =>
        if (m.vecId != v.vecId) {
          val d = dotOf(m.q8, v.q8)
          if (d > 0 && d * d * 10000L >= TauE2 * TauE2 * m.na2 * v.na2) {
            val (a, b) =
              if (m.vecId < v.vecId) (m.vecId, v.vecId) else (v.vecId, m.vecId)
            out += SemPair(a, b, d, d * d * 1000000L / (m.na2 * v.na2))
          }
        }
      }
      members ::= v
    }
    state.update(members)
    out.result().iterator
  }

  /** The streaming transform. `vecs` is a streaming frame with
    * (vec_id, embedding); output is the append-mode stream of
    * (a_id, b_id, dot, cos2_e6) — the batch pair stage's rows, each
    * surfacing as soon as its second member arrives. */
  def semanticPairsStream(spark: SparkSession, vecs: DataFrame): Dataset[SemPair] = {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    vecs
      .select(col("vec_id"),
        call_function("graft_q8cell", col("embedding")).as("s"))
      .select(col("s.cell").as("cell"), col("vec_id"),
        transform(col("s.q8"), x => coalesce(x, lit(0L))).as("q8"),
        col("s.na2").as("na2"))
      .as[(Long, Long, Seq[Long], Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Seq[Long], Long)],
         state: GroupState[List[VecSig]]) =>
          cellStep(rows.map(r => VecSig(r._2, r._3, r._4)), state)
      }
  }
}
