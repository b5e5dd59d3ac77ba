package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BpeTokenCount, ChunkHamming, CompressionRatio, CosineDotPre, CosineSimilarity, LatticeBands, MinHashSig, VecNorm2, PolyMinHashSig, PolySimHash, PolySimHashWide, Q8CellSig, Q8CellSigWide, Q8Dot, Q8DotBin, Q8L2, Q8Pack, Q8MomentsGen, QueryTermCounts, RepetitionStats, RollingFp, SigMatchCount, SimHash64, SortedInterCount, SpaceTokenCount,SrpBands, StripDict, TokenChunksGen, TokenChunksPosGen, TokenCountsGen, TokenNGramsGen, TokenShingles, TokenShinglesHashedGen}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for the SQL surface. Use either at session build time
  * (`.withExtensions(new GraftExtensions)`) or config
  * (`spark.sql.extensions=graft.GraftExtensions`); [[GraftExtensions.register]]
  * installs the same functions on an already-built session (what the
  * harness queries use, since Verify/Bench own the session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.CountOnlyShingles)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** SQL-template function: the body is parsed once and the call's
    * child expressions are spliced in for `argN` placeholders — pure
    * Catalyst expression trees, fully codegen'd, no UDFs. */
  private def templateFn(name: String, arity: Int, template: String): Descriptor = {
    val parsed = CatalystSqlParser.parseExpression(template)
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity,
          s"$name expects $arity argument(s), got ${children.length}")
        parsed.transform {
          case a: UnresolvedAttribute if a.name.startsWith("arg") =>
            children(a.name.stripPrefix("arg").toInt)
        }
      })
  }

  /** All graft SQL functions: the native cosine Expression plus the
    * reference's utility codecs (status name/code, retry backoff) so
    * pure-SQL users get the same helper surface the DataFrame API has.
    * Semantics mirror graft.functions.Exprs exactly (pinned by
    * ExprsSpec): status name/code per common/constants.go:49-82 (no
    * unknown→PENDING bug), backoff per tasks/worker.go:72-79. */
  /** Second argument of the token-gram functions must be an int literal
    * — it is baked into the expression at plan time (window width /
    * permutation count), not evaluated per row. */
  private def litInt(name: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  private val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("graft_vnorm2"),
      new ExpressionInfo(classOf[VecNorm2].getName, "graft_vnorm2"),
      (children: Seq[Expression]) => VecNorm2(children(0))),
    (FunctionIdentifier("graft_cosine_pre"),
      new ExpressionInfo(classOf[CosineDotPre].getName, "graft_cosine_pre"),
      (children: Seq[Expression]) =>
        CosineDotPre(children(0), children(1), children(2), children(3))),
    (FunctionIdentifier("graft_chunks"),
      new ExpressionInfo(classOf[TokenChunksGen].getName, "graft_chunks"),
      (children: Seq[Expression]) =>
        TokenChunksGen(children(0), litInt("graft_chunks", children(1)))),
    (FunctionIdentifier("graft_chunks_pos"),
      new ExpressionInfo(classOf[TokenChunksPosGen].getName, "graft_chunks_pos"),
      (children: Seq[Expression]) =>
        TokenChunksPosGen(children(0), litInt("graft_chunks_pos", children(1)))),
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[TokenNGramsGen].getName, "graft_ngrams"),
      (children: Seq[Expression]) =>
        TokenNGramsGen(children(0), litInt("graft_ngrams", children(1)))),
    (FunctionIdentifier("graft_repstats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repstats"),
      (children: Seq[Expression]) => RepetitionStats(children(0))),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[TokenShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) =>
        TokenShingles(children(0), litInt("graft_shingles", children(1)))),
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children(0))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) =>
        MinHashSig(children(0), litInt("graft_minhash", children(1)))),
    (FunctionIdentifier("graft_polyminhash"),
      new ExpressionInfo(classOf[PolyMinHashSig].getName, "graft_polyminhash"),
      (children: Seq[Expression]) =>
        PolyMinHashSig(children(0), litInt("graft_polyminhash", children(1)))),
    (FunctionIdentifier("graft_polysimhash"),
      new ExpressionInfo(classOf[PolySimHash].getName, "graft_polysimhash"),
      (children: Seq[Expression]) => PolySimHash(children(0))),
    (FunctionIdentifier("graft_srpbands"),
      new ExpressionInfo(classOf[SrpBands].getName, "graft_srpbands"),
      (children: Seq[Expression]) => SrpBands(children(0), children(1))),
    (FunctionIdentifier("graft_latticebands"),
      new ExpressionInfo(classOf[LatticeBands].getName, "graft_latticebands"),
      (children: Seq[Expression]) => LatticeBands(children(0))),
    (FunctionIdentifier("graft_polysimhash_wide"),
      new ExpressionInfo(classOf[PolySimHashWide].getName,
        "graft_polysimhash_wide"),
      (children: Seq[Expression]) => PolySimHashWide(children(0))),
    (FunctionIdentifier("graft_rollfp"),
      new ExpressionInfo(classOf[RollingFp].getName, "graft_rollfp"),
      (children: Seq[Expression]) => RollingFp(children(0))),
    (FunctionIdentifier("graft_zratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName, "graft_zratio"),
      (children: Seq[Expression]) => CompressionRatio(children(0))),
    (FunctionIdentifier("graft_q8cell"),
      new ExpressionInfo(classOf[Q8CellSig].getName, "graft_q8cell"),
      (children: Seq[Expression]) => Q8CellSig(children(0))),
    (FunctionIdentifier("graft_q8cellw"),
      new ExpressionInfo(classOf[Q8CellSigWide].getName, "graft_q8cellw"),
      (children: Seq[Expression]) => Q8CellSigWide(children(0))),
    (FunctionIdentifier("graft_q8moments"),
      new ExpressionInfo(classOf[Q8MomentsGen].getName, "graft_q8moments"),
      (children: Seq[Expression]) => Q8MomentsGen(children(0))),
    (FunctionIdentifier("graft_q8dot"),
      new ExpressionInfo(classOf[Q8Dot].getName, "graft_q8dot"),
      (children: Seq[Expression]) => Q8Dot(children(0), children(1))),
    (FunctionIdentifier("graft_q8pack"),
      new ExpressionInfo(classOf[Q8Pack].getName, "graft_q8pack"),
      (children: Seq[Expression]) => Q8Pack(children(0))),
    (FunctionIdentifier("graft_q8dotb"),
      new ExpressionInfo(classOf[Q8DotBin].getName, "graft_q8dotb"),
      (children: Seq[Expression]) => Q8DotBin(children(0), children(1))),
    (FunctionIdentifier("graft_q8l2"),
      new ExpressionInfo(classOf[Q8L2].getName, "graft_q8l2"),
      (children: Seq[Expression]) => Q8L2(children(0), children(1))),
    (FunctionIdentifier("graft_hamming_chunks"),
      new ExpressionInfo(classOf[ChunkHamming].getName,
        "graft_hamming_chunks"),
      (children: Seq[Expression]) =>
        ChunkHamming(children(0), children(1))),
    (FunctionIdentifier("graft_strip_dict"),
      new ExpressionInfo(classOf[StripDict].getName, "graft_strip_dict"),
      (children: Seq[Expression]) =>
        StripDict(children(0), children(1),
          litInt("graft_strip_dict", children(2)))),
    // PRECONDITION in the SQL-visible doc (round-10 advice): the merge
    // scan silently undercounts on unsorted/duplicated input, so the
    // caller-owned invariant must be stated where DESCRIBE FUNCTION
    // shows it, not only in the Scaladoc.
    (FunctionIdentifier("graft_sorted_icount"),
      new ExpressionInfo(classOf[SortedInterCount].getName, null,
        "graft_sorted_icount",
        "graft_sorted_icount(a, b) - |a INTERSECT b| for two array<bigint>" +
          " inputs that are BOTH ascending-sorted, duplicate-free and free" +
          " of null elements (e.g. array_sort(array_distinct(...)) of" +
          " xxhash64 values). One two-pointer merge scan, zero allocation." +
          " The precondition is the caller's: on unsorted input or" +
          " duplicates the count is NOT the set intersection (use" +
          " size(array_intersect(a, b)) there); null elements never match." +
          // folded into usage, NOT the 5th ctor arg: that positional
          // slot is `arguments` (verified against the Spark 4.1.2
          // jar), which DESCRIBE renders under an 'Arguments:' heading
          // (round-11 advice)
          " array_sort(array_distinct(x)) produces a valid input.",
        ""),
      (children: Seq[Expression]) => SortedInterCount(children(0), children(1))),
    (FunctionIdentifier("graft_sigmatch"),
      new ExpressionInfo(classOf[SigMatchCount].getName, null,
        "graft_sigmatch",
        "graft_sigmatch(a, b) - number of positions i where a[i] = b[i]" +
          " for two array<bigint> signatures. Positions beyond the shorter" +
          " array and positions where either side is a null element count" +
          " 0 (matching aggregate(zip_with(a, b, (x,y) ->" +
          " if(x = y, 1, 0)), 0, (s,v) -> s + ifnull(v, 0))).",
        ""),
      (children: Seq[Expression]) => SigMatchCount(children(0), children(1))),
    (FunctionIdentifier("graft_tokcount"),
      new ExpressionInfo(classOf[SpaceTokenCount].getName, null,
        "graft_tokcount",
        "graft_tokcount(text) - whitespace token count of single-spaced" +
          " text: (number of 0x20 chars) + 1 as int, null on null —" +
          " identical to length(text) - length(translate(text, ' '," +
          " '')) + 1 without the space-stripped copy per evaluation.",
        ""),
      (children: Seq[Expression]) => SpaceTokenCount(children(0))),
    (FunctionIdentifier("graft_tokcounts"),
      new ExpressionInfo(classOf[TokenCountsGen].getName, null,
        "graft_tokcounts",
        "graft_tokcounts(text) - generator of per-document DISTINCT" +
          " (tok, cnt) pairs of the space-split text: the map-side" +
          " pre-aggregation for corpus term statistics (tf = SUM(cnt)," +
          " df = COUNT(*) per doc), byte-equal to explode(split(text," +
          " ' ')) aggregates with 3-5x fewer shuffle-input rows.",
        ""),
      (children: Seq[Expression]) => TokenCountsGen(children(0))),
    (FunctionIdentifier("graft_shingles_h"),
      new ExpressionInfo(classOf[TokenShinglesHashedGen].getName, null,
        "graft_shingles_h",
        "graft_shingles_h(text, n) - generator of the document's" +
          " DISTINCT n-token shingle xxhash64 values (seed 42), one" +
          " bigint row each; null text emits one null row (the" +
          " explode_outer keep-the-doc convention). Hash currency for" +
          " contamination probes: overlap-by-hash = overlap-by-shingle" +
          " at the engine's accepted 2^-64 collision odds.",
        ""),
      (children: Seq[Expression]) =>
        TokenShinglesHashedGen(children(0),
          litInt("graft_shingles_h", children(1)))),
    (FunctionIdentifier("graft_qterms"),
      new ExpressionInfo(classOf[QueryTermCounts].getName, null,
        "graft_qterms",
        "graft_qterms(text, terms) - [dl, tf(terms[0]), ...] in one" +
          " byte scan: dl = whitespace token count (spaces + 1)," +
          " tf(t) = count of space-split tokens byte-equal to t." +
          " terms must be a foldable array<string>. Byte-equal to" +
          " size(filter(split(text, ' '), x -> x = t)) per term.",
        ""),
      (children: Seq[Expression]) => QueryTermCounts(children(0), children(1))),
    (FunctionIdentifier("graft_bpe_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, null,
        "graft_bpe_count",
        "graft_bpe_count(text, merges) - TRUE-BPE token count of" +
          " single-spaced word text under a rank-ordered merge table" +
          " (foldable flat array<string>: left0, right0, left1, …)." +
          " Byte-exact fusion of the two-pass replace-chain encoder:" +
          " same count as the guarded char-spaced replace chain on any" +
          " input, one compiled pass instead of ~2|merges| string nodes.",
        ""),
      (children: Seq[Expression]) => BpeTokenCount(children(0), children(1))),
    (FunctionIdentifier("graft_pqencode"),
      new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "graft_pqencode"),
      (children: Seq[Expression]) => graft.functions.PqEncode(
        children(0), children(1), litInt("graft_pqencode", children(2)))),
    (FunctionIdentifier("graft_pqadc"),
      new ExpressionInfo(classOf[graft.functions.PqAdcTables].getName, "graft_pqadc"),
      (children: Seq[Expression]) => graft.functions.PqAdcTables(
        children(0), children(1), litInt("graft_pqadc", children(2)))),
    templateFn("graft_status_name", 1,
      """CASE WHEN arg0 = 0 THEN 'pending' WHEN arg0 = 1 THEN 'processing'
        |     WHEN arg0 = 2 THEN 'completed' WHEN arg0 = 3 THEN 'failed'
        |     WHEN arg0 = 4 THEN 'delayed' ELSE 'unknown' END""".stripMargin),
    templateFn("graft_status_code", 1,
      """CASE WHEN arg0 = 'pending' THEN 0 WHEN arg0 = 'processing' THEN 1
        |     WHEN arg0 = 'completed' THEN 2 WHEN arg0 = 'failed' THEN 3
        |     WHEN arg0 = 'delayed' THEN 4 ELSE CAST(NULL AS INT) END""".stripMargin),
    templateFn("graft_backoff_sec", 1,
      "CASE WHEN arg0 <= 0 THEN 0 ELSE CAST(2 * POW(2, arg0 - 1) AS INT) END"))

  /** Sessions already registered — lets [[register]] be called from hot
    * chokepoints ([[graft.sources.Tables.table]] calls it on every
    * fixture read, so NO query builder depends on its caller having
    * registered; round-16 advice: builders reaching Exprs.tokenCount on
    * a foreign session threw AnalysisException). Weak keys: dead
    * sessions release their marker. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register graft functions + optimizer rules on a live
    * session (experimentalMethods is the post-build injection point —
    * same rule object the extensions class injects at build time).
    * Constant-time after the first call per session. */
  def register(spark: SparkSession): Unit = {
    if (registered.containsKey(spark)) return
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val ex = spark.experimental
    if (!ex.extraOptimizations.contains(graft.plans.CountOnlyShingles))
      ex.extraOptimizations = ex.extraOptimizations :+ graft.plans.CountOnlyShingles
    registered.put(spark, java.lang.Boolean.TRUE)
  }
}
