package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for the SQL surface. Use either at session build time
  * (`.withExtensions(new GraftExtensions)`) or config
  * (`spark.sql.extensions=graft.GraftExtensions`); [[GraftExtensions.register]]
  * installs the same functions on an already-built session (what the
  * harness queries use, since Verify/Bench own the session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.Expression

  private val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  /** Idempotently register graft functions on a live session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineSimDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
