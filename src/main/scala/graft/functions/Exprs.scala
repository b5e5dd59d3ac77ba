package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable scalar expression helpers (SURVEY.md §2.8). All built from
  * codegen'd `org.apache.spark.sql.functions` — no Scala UDFs — so every
  * query stays inside whole-stage codegen.
  */
object Exprs {

  /** Status int → name; unknown → "unknown". Mirrors the reference's
    * TaskStatus.String() (/root/reference/common/constants.go:49-63),
    * deliberately NOT reproducing the from-string unknown→PENDING bug
    * (/root/reference/common/constants.go:79-80, SURVEY.md §7.5). */
  def statusName(status: Column): Column =
    when(status === 0, "pending")
      .when(status === 1, "processing")
      .when(status === 2, "completed")
      .when(status === 3, "failed")
      .when(status === 4, "delayed")
      .otherwise("unknown")

  /** Name → status int; unknown → null (not PENDING — see above). */
  def statusCode(name: Column): Column =
    when(name === "pending", 0)
      .when(name === "processing", 1)
      .when(name === "completed", 2)
      .when(name === "failed", 3)
      .when(name === "delayed", 4)
      .otherwise(lit(null).cast("int"))

  /** Exponential retry backoff in seconds: 2s * 2^(n-1), n >= 1
    * (/root/reference/tasks/worker.go:72-79). The reference adds up to
    * 30% random jitter; jitter is excluded here for oracle determinism
    * (SURVEY.md §5.1) — the streaming engine applies it at runtime. */
  def backoffSec(retryCount: Column): Column =
    when(retryCount <= 0, lit(0))
      .otherwise((lit(2) * pow(lit(2), retryCount - 1)).cast("int"))

  /** Epoch seconds (floor) — the cross-engine-safe timestamp projection.
    * events.ts is nanosecond parquet: Spark truncates to micros while
    * DuckDB keeps ns, so raw event timestamps must never be emitted from
    * an oracle-checked query; floor-seconds agree in both engines. */
  def epochSec(ts: Column): Column = unix_timestamp(ts)

  /** Occurrence count of literal `needle` in `haystack` via
    * length/replace arithmetic — byte-identical across Spark and DuckDB
    * (regex-free on purpose: the engines' regex dialects differ). */
  def occurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(call_function("replace", haystack, lit(needle), lit("")))) / needle.length).cast("int")

  /** Whitespace token count for single-space-separated text:
    * spaces + 1. (Fixture documents are single-spaced ASCII.)
    * Round-16: the NATIVE zero-alloc byte scan
    * ([[graft.functions.SpaceTokenCount]]) — the translate-based
    * column form allocated a space-stripped copy of the text per
    * evaluation; byte-identical result (space is one UTF-8 byte).
    * Resolves in every [[graft.GraftSession]]-built session (the
    * extensions config installs the functions at birth); foreign
    * sessions need `GraftExtensions.register` first. */
  def tokenCount(text: Column): Column =
    call_function("graft_tokcount", text)
}
