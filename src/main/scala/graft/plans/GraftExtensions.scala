package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Session extension registering graft's native Catalyst expressions as
  * SQL functions. Two installation paths:
  *
  *   - cluster config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  *   - runtime: [[GraftExtensions.ensureRegistered]] on any live
  *     session (used by the library's own operators so callers need no
  *     setup).
  *
  * After either, `graft_cosine(a, b)` is callable from SQL and from
  * the DataFrame API via `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineFn)
    e.injectPlannerStrategy(_ => IntervalJoinStrategy)
    e.injectOptimizerRule(_ => PruneIntervalJoinColumns)
  }
}

object GraftExtensions {

  private[plans] val cosineFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine(a, b) takes two arguments")
      CosineSimilarityExpr(children.head, children(1))
    })

  /** Idempotently register the functions on a live session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val registry = castToImpl(spark).sessionState.functionRegistry
    if (!registry.functionExists(cosineFn._1)) {
      registry.registerFunction(cosineFn._1, cosineFn._2, cosineFn._3)
    }
  }

  /** Native cosine similarity Column (registers on first use). */
  def cosine(spark: SparkSession)(a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }
}
