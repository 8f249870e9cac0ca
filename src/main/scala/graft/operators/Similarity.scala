package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>` / `array<double>`).
  *
  * Two tiers:
  *   - [[bruteForceKnn]] — exact top-k by cosine; the correctness
  *     baseline. The query set is broadcast, the corpus is scanned
  *     once; per-query ranking shuffles |corpus|·|queries| scored rows,
  *     so it is for small query sets / validation only.
  *   - [[lshKnn]] — random-hyperplane LSH: corpus and queries are
  *     bucketed by sign-bit signatures; only same-bucket pairs are
  *     scored. Sub-linear candidate sets at the cost of recall, the
  *     100 TB path. Multiple signature tables (`tables`) trade compute
  *     for recall.
  *
  * Hyperplane weights are md5-derived pseudo-randoms, so signatures are
  * deterministic and reproducible across engines and runs (production
  * note: a broadcast precomputed plane matrix avoids the per-element
  * hash; the md5 form is kept for cross-engine verifiability).
  */
object Similarity {

  /** Deterministic pseudo-random weight in [-1, 1] for (plane, dim):
    * md5("tag:plane:dim") → first 15 hex digits → mod 2001, centered.
    * Computed driver-side (it depends on constants only, never on
    * data), so signatures cost zero per-row hashing; the identical
    * formula is reproducible in any engine with md5
    * (`('0x'||substr(md5(s),1,15))::BIGINT % 2001` in DuckDB).
    */
  def planeWeight(tag: String, plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$plane:$dim".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000d
  }

  /** Sign-bit signature of `vec` (fixed dimension `dims`) against
    * `planes` deterministic random hyperplanes; returns a compact
    * integer bucket key. Plane weights are literal arrays — the dot
    * products are pure codegen'd arithmetic over the vector.
    */
  def hyperplaneSignature(vec: Column, planes: Int, dims: Int, tag: String = "hp"): Column = {
    val bits = (0 until planes).map { p =>
      val w = array((0 until dims).map(j => lit(planeWeight(tag, p, j))): _*)
      val dot = aggregate(
        zip_with(vec, w, (x, wj) => x.cast("double") * wj),
        lit(0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Infer embedding dimensionality from the first row (cheap probe;
    * pass `dims` explicitly to avoid the extra job).
    */
  private def inferDims(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Exact cosine top-k: for each row of `queries`, the `k` most
    * similar rows of `corpus` (excluding identical ids when both sides
    * share the id space). Deterministic tie-break on corpus id.
    */
  def bruteForceKnn(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // norms cancel out of the ranking, but cosine is part of the
    // operator contract; the fused native kernel computes dot + both
    // norms in one allocation-free pass (graft.plans.CosineSimilarityExpr)
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val scored = c.crossJoin(q)
      // excludeSelf only applies when corpus and queries share an id
      // space; pass false when they are unrelated tables
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", call_function("graft_cosine", col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: candidates = same (table, signature) bucket in
    * any of `tables` independent hyperplane sets; exact cosine ranks
    * candidates, top-k per query. Recall < 1 by construction.
    */
  def lshKnn(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      planes: Int = 8, tables: Int = 2, dims: Int = -1,
      excludeSelf: Boolean = true): DataFrame = {

    val dim = if (dims > 0) dims else inferDims(corpus, vecCol)

    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)

    def signed(df: DataFrame, id: String): DataFrame =
      df.select(
        col(idCol).as(id), col(vecCol).as(s"${id}_vec"),
        explode(array((0 until tables).map { t =>
          struct(
            lit(t).as("table"),
            hyperplaneSignature(col(vecCol), planes, dim, s"hp$t").as("sig"))
        }: _*)).as("bk"))
        .select(col(id), col(s"${id}_vec"), col("bk.table"), col("bk.sig"))

    val c = signed(corpus, "neighbor_id")
    val q = broadcast(signed(queries, "query_id"))
    val candidates = c.join(q, Seq("table", "sig"))
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
      .distinct() // collapse multi-table collisions
      .withColumn("cosine",
        call_function("graft_cosine", col("query_id_vec"), col("neighbor_id_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
