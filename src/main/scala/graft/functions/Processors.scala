package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** X1 — the processor-plugin registry in its engine-grade form: task
  * processors are REGISTERED as named session UDFs (`spark.udf.register`)
  * and the dispatch expression is derived from the registry's keys, so
  * adding a processor is one `register` call — exactly the reference's
  * `RegisterProcessor` map (/root/reference/tasks/worker.go:16-18,30-32)
  * with the registry-miss → failed path
  * (/root/reference/tasks/worker.go:241-251) intact.
  *
  * Scale note: a registered Scala UDF is an opaque (non-codegen) call —
  * the right trade for the PLUGIN path, where user code must run
  * arbitrary logic per task. The CASE-over-type form
  * ([[graft.operators.TaskOps.processDispatch]]) stays as the built-in
  * comparison pair (fully codegen'd), like cosine_topk vs native.
  * Dispatch itself is still one narrow projection — the per-type branch
  * tree is built ONCE at plan time from the registry, never a per-row
  * lookup on the driver.
  */
object Processors {

  /** Processor implementations, one per UDF NAME (so a name can never
    * be registered twice with diverging bodies — the map key enforces
    * uniqueness structurally). Bodies mirror TaskOps.processDispatch's
    * CASE so the two forms share one oracle. */
  val processors: Map[String, String => String] = Map(
    "graft_proc_spider" -> (id => s"spider:row $id processed"),
    "graft_proc_wechat" -> (id => s"wechat:row $id processed"),
    "graft_proc_noop" -> (id => s"noop:$id"))

  /** Task type → registered processor name (worker.go's registry map). */
  val typeToProcessor: Seq[(String, String)] = Seq(
    "1-URGENT" -> "graft_proc_spider",
    "2-HIGH" -> "graft_proc_wechat",
    "3-MEDIUM" -> "graft_proc_noop",
    "4-NOT SPECIFIED" -> "graft_proc_noop",
    "5-LOW" -> "graft_proc_noop")
  require(typeToProcessor.forall { case (_, n) => processors.contains(n) },
    "typeToProcessor references an unregistered processor")

  /** Idempotently register every processor UDF on the session. */
  def register(spark: SparkSession): Unit =
    processors.foreach { case (name, f) => spark.udf.register(name, udf(f)) }

  /** UDF name for a user-registered processor. INJECTIVE per
    * (owner, exact task type): the readable sanitized form alone would
    * collide ("etl-v1.0" vs "etl v1 0", or any two symbol-only types),
    * silently making the last registration's body process both types —
    * so an md5 prefix of the raw type string disambiguates, and the
    * owner tag isolates registries sharing one SparkSession (session
    * UDF names are global; without the tag two TaskHive instances
    * registering the same type would clobber each other's body).
    * Re-registering the same (owner, type) still replaces the same UDF
    * (last-wins, like the reference's Go map assignment). */
  def userProcName(ownerTag: String, taskType: String): String = {
    val readable = taskType.toLowerCase.replaceAll("[^a-z0-9]+", "_")
    val exact = java.security.MessageDigest.getInstance("MD5")
      .digest(taskType.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    s"graft_proc_user_${ownerTag}_${readable}_$exact"
  }

  /** Dispatch expression derived from a registry mapping: CASE over the
    * registered types calling each type's UDF; unregistered → miss.
    * `mapping` defaults to the built-ins; [[graft.TaskHive.processTasks]]
    * passes built-ins ++ user registrations. */
  def dispatch(idCol: Column, typeCol: Column,
      mapping: Seq[(String, String)] = typeToProcessor): Column =
    mapping.foldLeft(when(lit(false), lit(""))) {
      case (acc, (taskType, fnName)) =>
        acc.when(typeCol === taskType, call_function(fnName, idCol))
    }.otherwise(lit("error: no processor registered"))

  /** Post-dispatch status, also registry-derived (hit → completed,
    * miss → failed), matching worker.go:241-251. */
  def newStatus(typeCol: Column,
      mapping: Seq[(String, String)] = typeToProcessor): Column = {
    import graft.sources.Tables
    when(typeCol.isin(mapping.map(_._1): _*), lit(Tables.Completed))
      .otherwise(lit(Tables.Failed)).cast("int")
  }
}
