package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding similarity search + fuzzy-dedup signatures over the
  * `embeddings`/`documents` fixtures (north-star LLM-pipeline operators,
  * SURVEY.md §7.4).
  *
  * Scale design:
  *  - brute-force cosine top-k: broadcast the (small) query set against
  *    the full corpus — one corpus scan, no corpus shuffle;
  *  - LSH path (annLshTopk): sign-random-projection buckets cut the
  *    candidate set before the exact re-rank — the 100 TB shape where
  *    the corpus×query cross product is infeasible;
  *  - MinHash/SimHash: shuffle only (doc_id, signature) rows — never raw
  *    text — then self-join on band buckets.
  *
  * All arithmetic is double (cast up from float32) folded sequentially
  * with the `aggregate` HOF — deterministic, codegen'd, no UDFs.
  */
object SimilarityOps {

  /** Dot product of two double arrays via zip_with + aggregate. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Horner fold of a 0/1 bit array (most-significant first) into a
    * LongType value via shift+or — bitwise, so safe from ANSI overflow
    * when bit 63 is set. */
  private def bitsToLong(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b.cast("long")))

  /** Brute-force cosine top-k: for each query vector (vec_id < 5), the
    * 10 nearest neighbors by cosine, emitted as exact integer e4. */
  def cosineTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cos = dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id"), col("rank").cast("int").as("rank"),
        round(col("cos") * 10000).cast("long").as("cos_e4"))
      .orderBy("query_id", "rank")
  }

  /** ANN via multi-table sign-random-projection LSH: 8 hash tables × 4
    * hyperplane bits. A candidate is any vector sharing a (table,
    * bucket) cell with the query; candidates are deduped then exactly
    * re-ranked by cosine. Multi-table (OR-amplified) LSH trades a small
    * candidate-set growth for recall — a single fine-grained bucket set
    * has near-zero recall on a uniform corpus. Recall vs brute force is
    * measured in SimilaritySpec. */
  def annLshTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val nTables = 8
    val bitsPerTable = 4
    val dim = 64
    // Deterministic hyperplanes from a seeded PRNG, shipped as a literal
    // array-of-arrays (tiny) — broadcast by value with the plan.
    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nTables * bitsPerTable)(Seq.fill(dim)(rnd.nextGaussian()))
    def signBits(v: Column): Column =
      transform(typedlit(planes), plane => when(dot(plane, v) >= 0, 1).otherwise(0))
    def buckets(bits: Column): Column =
      transform(sequence(lit(0), lit(nTables - 1)),
        t => bitsToLong(slice(bits, t * bitsPerTable + 1, lit(bitsPerTable))))
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // materialize the 32 plane signs once per row; buckets only slice
      .withColumn("bits", signBits(col("v")))
      .select(col("vec_id"), col("v"), posexplode(buckets(col("bits"))))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("table"), col("bucket"))
    val cos = dot(col("qv"), col("v")) / (norm(col("qv")) * norm(col("v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    // candidate dedup on (query_id, vec_id) ids only, vectors joined
    // back after — the distinct never shuffles 64-double arrays
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val qvecs = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    e.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
      .join(vecs, Seq("vec_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .withColumn("cos", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id"), col("rank").cast("int").as("rank"),
        round(col("cos") * 10000).cast("long").as("cos_e4"))
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-dup pairs: same-label vector pairs above a
    * cosine threshold. Blocking key = label (the production analog:
    * a coarse cluster/bucket id), so the pair space is |label-block|²,
    * not |corpus|². Threshold compares the *rounded integer* e4 value —
    * exact in both engines, no float knife-edges in the oracle. */
  def embeddingDedup(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b,
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_e4",
        round(call_function("cosine_sim", col("a.v"), col("b.v")) * 10000)
          .cast("long"))
      .filter(col("cos_e4") >= 2500)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        col("a.label").as("label"), col("cos_e4"))
      .orderBy("a_id", "b_id")
  }

  private val MinhashPerms = 32
  private val Bands = 8 // 8 bands × 4 rows

  /** Typed UDAF: elementwise minimum of fixed-width long vectors —
    * reduces one 32-hash array per shingle into the per-doc signature
    * with partial (map-side) aggregation, instead of exploding
    * 32 rows/shingle through the shuffle. */
  object ElementwiseMin extends Aggregator[(Long, Seq[Long]), Array[Long], Seq[Long]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Array[Long] = Array.fill(MinhashPerms)(Long.MaxValue)
    def reduce(b: Array[Long], in: (Long, Seq[Long])): Array[Long] = {
      var i = 0
      val v = in._2
      while (i < b.length) { if (v(i) < b(i)) b(i) = v(i); i += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** MinHash signatures over word 3-shingles: per-doc array of 32
    * permutation minima, h_i = min over shingles of xxhash64(shingle, i).
    * One row per shingle enters the aggregation; map-side combine means
    * the shuffle carries one 32-long vector per (partition, doc). */
  def minhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shingleArray(col("text"), 3)).as("shingle"))
      .select(col("doc_id"), transform(sequence(lit(0), lit(MinhashPerms - 1)),
        i => xxhash64(col("shingle"), i)).as("hs"))
      .toDF("_1", "_2")
      .as[(Long, Seq[Long])]
      .groupByKey(_._1)
      .agg(ElementwiseMin.toColumn.name("signature"))
      .select(col("key").as("doc_id"), col("signature"))
  }

  /** MinHash+LSH near-dup pairs: docs sharing any band bucket, with
    * estimated Jaccard = fraction of matching permutation minima. */
  def minhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = minhashSignatures(spark, sfDir)
    val rowsPerBand = MinhashPerms / Bands
    val banded = sigs.select(col("doc_id"), col("signature"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("signature"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .select(col("doc_id"), col("signature"),
        col("pos").as("band"), col("col").as("bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val est = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / MinhashPerms
    // the distinct carries the two signatures with the pair ids: wider
    // shuffle rows, but the signature pipeline is computed exactly
    // twice (once per join side). An ids-only distinct + signature
    // rejoin re-derives the pipeline 4x — measured 10x slower.
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.signature").as("sa"), col("b.signature").as("sb"))
      .distinct()
      .withColumn("est_jaccard_milli", round(est * 1000).cast("long"))
      .select("a_id", "b_id", "est_jaccard_milli")
      .orderBy("a_id", "b_id")
  }

  /** 64-bit SimHash per doc from token hashes; near-dup pairs at
    * Hamming distance ≤ 8 within the same source. */
  def simhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = simhashes(spark, sfDir)
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b,
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("hamming") <= 8)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("a_id", "b_id")
  }

  /** Typed UDAF: elementwise sum of 64-long bit-weight vectors (the
    * SimHash accumulator) with map-side combine — replaces a 64
    * rows/token explode through the shuffle. */
  object ElementwiseSum extends Aggregator[((Long, String), Seq[Long]), Array[Long], Seq[Long]] {
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Array[Long] = Array.fill(64)(0L)
    def reduce(b: Array[Long], in: ((Long, String), Seq[Long])): Array[Long] = {
      var i = 0
      val v = in._2
      while (i < b.length) { b(i) += v(i); i += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Per-doc 64-bit SimHash: per-token xxhash64 expanded to a ±1 weight
    * vector (bit 63 first), summed elementwise per doc, sign bits
    * Horner-folded into one long. */
  def simhashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val weights = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .select(struct(col("doc_id").as("_1"), col("source").as("_2")).as("_1"),
        expr("transform(sequence(63, 0, -1), bit -> " +
          "CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1L ELSE -1L END)").as("_2"))
      .as[((Long, String), Seq[Long])]
    weights
      .groupByKey(_._1)
      .agg(ElementwiseSum.toColumn.name("sums"))
      .select(col("key._1").as("doc_id"), col("key._2").as("source"),
        bitsToLong(transform(col("sums"),
          s => when(s > 0, 1).otherwise(0))).as("simhash"))
  }

  /** Word n-gram shingles of `text` as a distinct array column. */
  private def shingleArray(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => s =!= ""))
  }
}
