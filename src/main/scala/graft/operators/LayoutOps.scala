package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exprs
import graft.sources.Tables

/** Physical-layout planning operators — the table-maintenance side of a
  * 100 TB lakehouse: Z-order clustering diagnostics and small-file
  * compaction binning. The reference engine has no layout layer (etcd
  * holds KBs); these are the operations its data would need once it
  * lands in parquet at scale.
  *
  * Scale: both queries are a single scan plus one aggregation; the
  * compaction window partitions by `source` (bounded partitions — a
  * real table would window per file-listing partition, never globally).
  */
object LayoutOps {

  /** Z-order clustering diagnostic. Maps each order to a 2-D Z-value
    * interleaving 4 customer-bucket bits with 4 date-bucket bits, then
    * reports per-Z-bucket min/max of BOTH dimensions — the data-skipping
    * ranges a Z-ordered file layout would give. Writing with
    * `repartitionByRange(z)` + `sortWithinPartitions(z)` yields files
    * whose min/max stats bound both columns at once, so predicates on
    * EITHER dimension prune files (linear-order sorts only prune the
    * leading column). Pure bit arithmetic — codegen'd, no shuffle
    * beyond the final bounded aggregation (256 groups).
    */
  /** Orders with their 2-D Z-value — the single derivation shared by
    * the diagnostic aggregate ([[zorderLayout]]) and the executed
    * rewrite ([[writeZOrdered]]), so the plan can never drift from
    * what actually lands on disk. */
  private def ordersZ(spark: SparkSession, sfDir: String): DataFrame = {
    val dd = datediff(col("o_orderdate"), lit("1992-01-01"))
    // interleave: z = sum_i xbit_i*4^i + ybit_i*2*4^i (x even bits, y odd)
    val z = (0 until 4)
      .map { i =>
        shiftleft(shiftright(col("xb"), i).bitwiseAND(lit(1)), 2 * i) +
          shiftleft(shiftright(col("yb"), i).bitwiseAND(lit(1)), 2 * i + 1)
      }
      .reduce(_ + _)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        (col("o_custkey") % 16).cast("int").as("xb"),
        least(lit(15), floor(dd / 160).cast("int")).cast("int").as("yb"),
        dd.cast("int").as("dd"))
      .withColumn("z", z)
  }

  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    ordersZ(spark, sfDir)
      .groupBy("z")
      .agg(count(lit(1)).as("n"),
        min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"),
        min("dd").cast("int").as("min_day"), max("dd").cast("int").as("max_day"))
      .select(col("z").cast("int").as("z"), col("n"), col("min_cust"),
        col("max_cust"), col("min_day"), col("max_day"))
      .orderBy("z")
  }

  /** Small-file compaction plan: greedy streaming binning of documents
    * (standing in for data files, sized by n_chars) into ~16 KiB output
    * bins per source. bin = floor(running-size-before / target) — the
    * single-pass assignment a compactor uses so every bin except the
    * last is ≥ target. The window partitions by source and orders by
    * doc_id: partitions are bounded (one source's file listing), never
    * a global window. */
  private val CompactionTarget = 16384L

  /** Documents with their compaction bin — shared by the plan
    * aggregate ([[compactionPlan]]) and the executed rewrite
    * ([[writeCompacted]]). */
  private def docsBinned(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cum_before", coalesce(sum("n_chars").over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / CompactionTarget).cast("int"))
  }

  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame =
    docsBinned(spark, sfDir)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bin_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("source", "bin")

  // ------------------------------------------------------------------
  // EXECUTED rewrites — the plans above actually land on disk, and the
  // payoff (files a predicate scan can skip) is measured by LayoutOpsSpec
  // from the written files' real column ranges. A layout that is never
  // executed is a slideware index (the reference's analog: the keyspace
  // layout IS its index, common/constants.go:5-14).
  // ------------------------------------------------------------------

  /** Write orders Z-CLUSTERED: range-partition on the Z-value then sort
    * within partitions, so each output file's (custkey, date) min/max
    * envelope is tight on BOTH dimensions and predicates on EITHER
    * column skip files. `nFiles` stands in for the at-scale file count;
    * the writer shape (repartitionByRange + sortWithinPartitions +
    * plain parquet write) is exactly what a 1000-executor rewrite job
    * runs — no driver-side anything. */
  def writeZOrdered(spark: SparkSession, sfDir: String, outDir: String,
      nFiles: Int = 16): Unit =
    ordersZ(spark, sfDir)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(outDir)

  /** The comparison layout: linearly clustered on the leading column
    * only (custkey) — what a naive "sort by primary key" rewrite
    * produces. Prunes custkey predicates but leaves every file spanning
    * the full date range. */
  def writeLinear(spark: SparkSession, sfDir: String, outDir: String,
      nFiles: Int = 16): Unit =
    ordersZ(spark, sfDir)
      .repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(outDir)

  /** EXECUTE the compaction plan: co-locate each (source, bin) with a
    * hash repartition — a bin lands wholly in one task, so the
    * partitioned write emits exactly ONE data file per bin, each
    * ≥ target chars except a source's last. Layout on disk =
    * hive-partitioned by (source, bin). */
  def writeCompacted(spark: SparkSession, sfDir: String, outDir: String): Unit =
    docsBinned(spark, sfDir)
      .select("doc_id", "source", "n_chars", "bin")
      .repartition(col("source"), col("bin"))
      .write.mode("overwrite").partitionBy("source", "bin").parquet(outDir)

  /** Deterministic training-shard plan — the LAST stage of a curation
    * pipeline: pseudo-shuffle the corpus under a FIXED seed and assign
    * every document a (shard, position), so N writer tasks emit
    * byte-reproducible shards and a dataloader streams them in a
    * stable pseudo-random document order (re-running the pipeline, or
    * resuming a crashed write, reproduces the identical layout — the
    * property `df.orderBy(rand())` cannot give).
    *
    * The shuffle key is a seeded integer hash built ONLY from ops both
    * engines evaluate identically on int64 (+ * % xor >>), so the
    * DuckDB oracle reproduces it bit-for-bit: affine seed mix, then
    * xor-shift/Lehmer rounds (x ^= x>>k between multiplies). The
    * xor-shift folds are load-bearing: randomAssign's plain 2-round
    * multiplicative chain looks random but its LOW bits are lattice-
    * structured — measured: `h % 32` left every shard ≡ 0 (mod 4)
    * EMPTY over the fixture's sequential doc_ids. Fine for that
    * query's `% n_workers` with worker counts off the lattice, fatal
    * for a power-of-two shard split. Position = rank of the hash
    * within the shard (doc_id tiebreak for the rare collision).
    *
    * Scale: the per-shard rank window is partitioned by shard — at
    * 100 TB shard count is sized so corpus/N fits a writer task (tens
    * of thousands of shards), and each window partition is exactly the
    * sort the shard's writer performs anyway (`repartition(N, shard) +
    * sortWithinPartitions(h)` is the write-side twin of this plan); no
    * global window, no driver state. Token counts ride along so the
    * plan doubles as the per-shard token-budget manifest. */
  def shardPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val nShards = 32
    val seed = 20260814L
    def fold(c: Column, k: Int): Column = c.bitwiseXOR(shiftright(c, k))
    val w = Window.partitionBy("shard").orderBy(asc("h"), asc("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Exprs.tokenCount(col("text")).cast("long").as("n_tokens"))
      // id pre-fold into the Mersenne field — identity for ids < 2³¹−1
      // (every driver fixture: oracle hashes unchanged) but keeps
      // full-range 64-bit fingerprint ids inside int64 at the multiply
      // (the round-14 real-corpus smoke measured the ANSI overflow)
      .withColumn("id0", pmod(fold(col("doc_id"), 31), lit(2147483647L)))
      .withColumn("h0",
        pmod(col("id0") * lit(2654435761L) + lit(seed), lit(2147483647L)))
      .withColumn("h2", pmod(fold(col("h0"), 16) * lit(48271L),
        lit(2147483647L)))
      .withColumn("h4", pmod(fold(col("h2"), 13) * lit(69621L),
        lit(2147483647L)))
      .withColumn("h", fold(col("h4"), 11))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select("doc_id", "shard", "pos", "n_tokens")
      .orderBy("doc_id")
  }

  /** EXECUTE the shard plan: one data file per shard, rows inside each
    * file in the plan's position order — the write-side twin of
    * [[shardPlan]] (LayoutOpsSpec pins file contents ≡ the plan's
    * (shard, pos) assignment). */
  def writeSharded(spark: SparkSession, sfDir: String, outDir: String): Unit =
    shardPlan(spark, sfDir)
      .repartition(Tables.explicitParts(spark), col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
