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

  // -------------------------------------------------------------- IVF

  /** Unit-normalize a centroid (zero vectors pass through). */
  private def normalize(c: Array[Double]): Array[Double] = {
    val n = math.sqrt(c.map(x => x * x).sum)
    if (n == 0d) c else c.map(_ / n)
  }

  /** Dot product of `vecD` (array<double>) against each pre-normalized
    * centroid literal, as `(score, list)` structs. For NEAREST-centroid
    * selection the row's own norm is constant across centroids, so
    * dot-with-normalized-centroid ranks identically to cosine at half
    * the arithmetic (and without a divide-by-zero hazard on zero
    * vectors). Pure codegen'd arithmetic, no shuffle.
    */
  private def centroidScores(vecD: Column, cents: Array[Array[Double]]): Column = {
    // ONE literal holding every centroid: an array<struct<cvec,list>>
    // traversed with transform. Embedding each centroid as its own
    // literal subtree multiplies analyzer/optimizer work by nLists ×
    // |subtree| and made k-means planning-bound (seconds per round);
    // a single literal keeps the expression tree tiny regardless of
    // nLists. The cast pins struct field names (aliases on
    // higher-order-function children are dropped in lambda resolution).
    val centsLit = typedLit(
      cents.zipWithIndex.map { case (c, i) => (normalize(c).toSeq, i) }.toSeq)
      .cast("array<struct<cvec:array<double>,list:int>>")
    transform(centsLit, c =>
      struct(
        aggregate(zip_with(vecD, c.getField("cvec"), (x, w) => x * w),
          lit(0d), (acc, v) => acc + v),
        c.getField("list")).cast("struct<s:double,list:int>"))
  }

  /** The `nProbe` nearest centroid list-ids for `vec` (descending
    * cosine, ties to the lower list id — deterministic).
    */
  def nearestLists(vec: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    transform(
      slice(
        array_sort(centroidScores(vec.cast("array<double>"), cents), (a, b) =>
          when(a.getField("s") > b.getField("s"), -1)
            .when(a.getField("s") < b.getField("s"), 1)
            .otherwise(a.getField("list") - b.getField("list"))),
        1, nProbe),
      e => e.getField("list"))

  /** Lloyd k-means over the embedding column, driver-looped:
    * init = the vectors of the `nLists` smallest ids (deterministic),
    * then `iters` rounds of {assign via codegen'd argmax over centroid
    * literals; re-estimate via posexplode + per-(list, dim) avg —
    * one narrow pass + one slim shuffle per round}. Centroids live on
    * the driver (nLists × dims doubles — metadata scale); empty lists
    * keep their previous centroid.
    *
    * The quantizer trains on a BOUNDED deterministic sample: the
    * `trainCap` vectors with the smallest `md5("km:" || id)` — the
    * standard IVF practice (FAISS trains its coarse quantizer on a
    * fixed-size sample, not the corpus). Fitting 8–64 centroids needs
    * thousands of vectors, not billions; training on the full corpus
    * would cost `iters`+1 full scans per build at 100 TB. The sampled
    * form costs ONE full-corpus pass (a TakeOrdered whose map-side
    * top-k is `trainCap`-bounded), caches the sample, and iterates on
    * it — corpus-pass count is independent of `iters`. The md5 rule is
    * SQL-expressible, so the DuckDB oracles replay it exactly; when the
    * corpus is at-or-under `trainCap` (every gate SF) the sample IS the
    * corpus and the result is bit-identical to full-corpus training.
    */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      nLists: Int, iters: Int = 3, dims: Int = -1,
      trainCap: Int = 262144): Array[Array[Double]] = {
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val dim = if (dims > 0) dims else inferDims(corpus, vecCol)
    val train = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("_vd"))
      .orderBy(md5(concat_ws(":", lit("km"), col(idCol).cast("string"))))
      .limit(trainCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Double]] = train
        .orderBy(col(idCol)).limit(nLists)
        .select(col("_vd")).collect()
        .map(_.getSeq[Double](0).toArray)
      require(cents.length == nLists,
        s"corpus has fewer rows (${cents.length}) than nLists=$nLists")
      for (_ <- 1 to iters) {
        // staged projection: the argmax assignment must materialize
        // BELOW the generator — inlined next to posexplode it would be
        // re-evaluated once per exploded dimension (64× the work)
        val assigned = train
          .select(
            element_at(nearestLists(col("_vd"), cents, 1), 1).as("list"),
            col("_vd"))
          .select(col("list"), posexplode(col("_vd")).as(Seq("pos", "v")))
        val means = assigned.groupBy("list", "pos").agg(avg(col("v")).as("m"))
          .collect()
        val next = cents.map(_.clone())
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        cents = next
      }
      cents
    } finally train.unpersist(false)
  }

  /** IVF (inverted-file) ANN — the learned-partition scale path: a
    * k-means coarse quantizer splits the corpus into `nLists` inverted
    * lists; each query probes only its `nProbe` nearest lists and
    * re-ranks candidates with exact cosine. Candidates travel through
    * a plain equi-join on the list id (queries broadcast), so the scan
    * touches |corpus|·nProbe/nLists rows per query in expectation —
    * sub-linear like [[lshKnn]], but with data-adaptive partitions
    * (learned centroids follow the embedding distribution; random
    * hyperplanes don't). Recall < 1 by construction; raise `nProbe`
    * to trade compute for recall.
    */
  def ivfKnn(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 3, dims: Int = -1,
      excludeSelf: Boolean = true, trainCap: Int = 262144): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val dim = if (dims > 0) dims else inferDims(corpus, vecCol)
    val cents = kmeansCentroids(corpus, vecCol, idCol, nLists, iters, dim,
      trainCap)
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      element_at(nearestLists(col(vecCol), cents, 1), 1).as("list"))
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearestLists(col(vecCol), cents, nProbe)).as("list")))
    val candidates = c.join(q, "list")
      .where(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", call_function("graft_cosine", col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Per-group embedding outliers — the semantic-filtering signal a
    * curation pipeline uses to spot mislabeled / off-distribution
    * documents (the SemDeDup/centroid-distance family): the `k` rows
    * of each group least similar (cosine) to their own group's mean
    * vector. One narrow posexplode + per-(group, dim) avg builds the
    * centroids (map-side combinable — the shuffle carries (group, dim,
    * partial sums), never vectors); centroids are group-count-sized
    * metadata, so the join back is a broadcast at any corpus scale.
    */
  def centroidOutliers(emb: DataFrame, vecCol: String, idCol: String,
      groupCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(emb.sparkSession)
    val e = emb.select(col(idCol), col(groupCol),
      col(vecCol).cast("array<double>").as("v"))
    val cents = e.select(col(groupCol), posexplode(col("v")))
      .groupBy(groupCol, "pos").agg(avg("col").as("m"))
      .groupBy(groupCol)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("c"))
    val scored = e.join(broadcast(cents), groupCol)
      .withColumn("cosine", call_function("graft_cosine", col("v"), col("c")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cosine").asc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(groupCol), col(idCol),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
