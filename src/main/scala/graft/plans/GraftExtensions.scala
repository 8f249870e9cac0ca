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
    e.injectFunction(GraftExtensions.packedL1Fn)
    e.injectFunction(GraftExtensions.bloomAggFn)
    e.injectFunction(GraftExtensions.mightContainFn)
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

  private[plans] val packedL1Fn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_packed_l1"),
    new ExpressionInfo(classOf[PackedCountL1Expr].getName, "graft_packed_l1"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_packed_l1(a, b) takes two arguments")
      PackedCountL1Expr(children.head, children(1))
    })

  // Spark ships a codegen'd bloom filter pair (BloomFilterAggregate /
  // BloomFilterMightContain) but registers them only for its internal
  // runtime-filter rewrite — they are not SQL-callable. Re-expose them
  // under graft names: the build side is a mergeable TypedImperative
  // aggregate (map-side partials), the probe side a scalar predicate
  // over a LITERAL sketch, so a corpus can be pre-filtered map-side
  // against a driver-bounded membership artifact with zero shuffle.
  private[plans] val bloomAggFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_bloom_agg(value, estimatedItems, numBits) takes three arguments")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        children(0), children(1), children(2))
    })

  private[plans] val mightContainFn: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_might_contain"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_might_contain(bloom, value) takes two arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0), children(1))
    })

  /** Idempotently register the functions on a live session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val registry = castToImpl(spark).sessionState.functionRegistry
    Seq(cosineFn, packedL1Fn, bloomAggFn, mightContainFn).foreach { fn =>
      if (!registry.functionExists(fn._1)) {
        registry.registerFunction(fn._1, fn._2, fn._3)
      }
    }
  }

  /** Native cosine similarity Column (registers on first use). */
  def cosine(spark: SparkSession)(a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }
}
