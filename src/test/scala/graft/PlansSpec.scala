package graft

import org.apache.spark.sql.functions._
import graft.functions.cosineSimilarity
import graft.plans.GraftExtensions

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("graft_cosine ≡ composable cosine on float and double arrays") {
    GraftExtensions.ensureRegistered(spark)
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map(_ =>
      (Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    val out = df.select(
      call_function("graft_cosine", $"a", $"b").as("native"),
      cosineSimilarity($"a", $"b").as("composed"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, c) => assert(n == c, s"native $n != composed $c") }
  }

  test("graft_cosine null semantics: null array, length mismatch, null element") {
    GraftExtensions.ensureRegistered(spark)
    val df = Seq(
      (Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](1.0, 2.0, 3.0))),
      (None, Some(Seq[java.lang.Double](1.0, 2.0))),
      (Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](1.0, 2.0))))
      .toDF("a", "b")
    val out = df.select(call_function("graft_cosine", $"a", $"b"))
      .as[Option[Double]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("graft_cosine callable from SQL after registration") {
    GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))").as[Double].head
    assert(r == 1.0)
  }

  test("GraftExtensions installs via withExtensions") {
    // separate session builder path: config-based extension injection
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("ext-test")
      .getOrCreate()
    try {
      val r = s2.sql("SELECT graft_cosine(array(3.0d, 4.0d), array(3.0d, 4.0d))")
        .collect()(0).getDouble(0)
      assert(math.abs(r - 1.0) < 1e-15)
    } finally s2.stop()
  }
}
