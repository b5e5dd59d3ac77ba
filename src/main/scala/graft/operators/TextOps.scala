package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.Exprs

/** Text-analysis operators for a training-data pipeline over the
  * `documents` fixture: exact dedup, token stats, quality scoring,
  * language-ID heuristic, fingerprinting. All built from codegen'd
  * built-ins (length/replace arithmetic instead of regex so the DuckDB
  * oracle is byte-identical — see Exprs.occurrences).
  *
  * Scale: every query is a single scan + single hash aggregation on
  * doc_id or text-hash; dedup groups by the text value itself, which at
  * 100 TB would group by a 128-bit fingerprint (xxhash64 pair / md5)
  * instead to keep shuffle rows narrow — demonstrated by
  * fingerprintRolling.
  */
object TextOps {

  /** Exact dedup: group identical texts, keep min doc_id as canonical.
    * (Hash-groupBy — the 100 TB form shuffles md5(text), not text.) */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")
      .orderBy("doc_id")

  /** Token count via single-space arithmetic (fixture docs are
    * single-spaced ASCII; production would use a tokenizer UDF). */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), Exprs.tokenCount(col("text")).as("n_tokens"))
      .orderBy("doc_id")

  private def padded: Column = concat(lit(" "), col("text"), lit(" "))

  /** Quality scoring: length, token count, avg token length (scaled to
    * exact integer millis), stopword ratio, and a keep/drop flag. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val nTokens = Exprs.tokenCount(col("text"))
    val nChars = length(col("text"))
    val nonSpace = nChars - (nTokens - 1)
    val theHits = Exprs.occurrences(padded, " the ")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nChars.cast("int").as("n_chars"),
        nTokens.as("n_tokens"),
        round(lit(1000.0) * nonSpace / nTokens).cast("long").as("avg_token_len_milli"),
        round(lit(1000.0) * theHits / nTokens).cast("long").as("stopword_milli"),
        (nTokens >= 10 && nTokens <= 10000 && (nonSpace / nTokens) <= 20)
          .as("keep"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: per-language stopword occurrence counts with
    * a deterministic argmax precedence (en > de > fr > es > unknown). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val en = Exprs.occurrences(padded, " the ")
    val de = Exprs.occurrences(padded, " der ")
    val fr = Exprs.occurrences(padded, " le ")
    val es = Exprs.occurrences(padded, " el ")
    val best = greatest(en, de, fr, es)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        when(best === 0, "unknown")
          .when(en === best, "en")
          .when(de === best, "de")
          .when(fr === best, "fr")
          .otherwise("es").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Corpus word frequency: explode tokens → count → top 50 with a
    * total order (the generator/explode surface as a first-class
    * oracle-checked query; TakeOrdered, no global sort). */
  def tokenFreq(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("tok"))
      .limit(50)

  /** Document fingerprint: md5 content hash (cross-engine exact). */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Rolling polynomial hash (h = h*31 + chr mod 2^61-1) computed with
    * the `aggregate` higher-order function — fully codegen-compatible,
    * no UDF. Not oracle-checked (DuckDB lacks an equivalent fold);
    * spec-tested against a Scala reference implementation. */
  def fingerprintRolling(spark: SparkSession, sfDir: String): DataFrame = {
    // 1e9+7: keeps acc*31+255 far below 2^63 (ANSI overflow-safe).
    val prime = 1000000007L
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        aggregate(
          split(col("text"), ""),
          lit(0L),
          (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), lit(prime)))
          .as("rolling_fp"))
      .orderBy("doc_id")
  }

  /** Word-3-gram Jaccard near-dup detection: doc pairs within the same
    * source whose distinct-shingle Jaccard ≥ 0.5. The threshold compare
    * is exact integer arithmetic (2*|A∩B| >= |A∪B|); the reported
    * similarity is scaled to millis. */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    // join key is the shingle's xxhash64, not the string: the shuffle
    // carries 8 bytes per shingle instead of ~20+ chars (collision odds
    // ~|shingles|²/2⁶⁴ — immaterial)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        explode(shingles3(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"), xxhash64(col("tok")).as("tok_h"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = toks.alias("a")
    val b = toks.alias("b")
    // the exploded token table is |docs|×|shingles| rows — never
    // broadcast it (Catalyst's width-based estimate undershoots after
    // the 8-byte hash projection); shuffle-hash co-locates both sides
    // on (source, tok_h)
    val inter = a.hint("shuffle_hash").join(b,
        col("a.source") === col("b.source") &&
        col("a.tok_h") === col("b.tok_h") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    // sizes is one row per doc — same cardinality as documents, so NOT
    // broadcast (AQE picks the strategy; at fixture scale it broadcasts
    // on its own, at 100 TB it must shuffle).
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("sz", "a_sz"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("sz", "b_sz"), Seq("b_id"))
      .filter(lit(2) * col("inter") >= col("a_sz") + col("b_sz") - col("inter"))
      .select(col("a_id"), col("b_id"),
        round(lit(1000.0) * col("inter") /
          (col("a_sz") + col("b_sz") - col("inter"))).cast("long")
          .as("jaccard_milli"))
      .orderBy("a_id", "b_id")
  }

  /** Distinct word 3-gram shingles (docs shorter than 3 tokens yield
    * their full text as the single shingle) — mirrored in the oracle's
    * list-slice CTE. */
  private def shingles3(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
  }
}
