package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic scale-up of a testdata SF directory — the
  * decade-higher tier the scaling sweep re-times against, proving the
  * measured exponents hold one more order of magnitude (sf0.1 → "sf1")
  * without a driver-provided sf1 corpus.
  *
  * Each table is the union of `factor` replicas of the source. Replica
  * 0 is the source verbatim; replica r shifts every key column by a
  * disjoint offset so FK joins stay consistent WITHIN a replica and
  * groups keyed by non-key attributes (priority, names, time windows)
  * grow ×factor in rows — the realistic shape of a bigger corpus.
  * Content columns are decorrelated across replicas so similarity
  * structure repeats instead of exploding (a real 10× corpus has 10×
  * the near-dup families, not every document gaining 9 cross-corpus
  * twins):
  *
  *   - documents.text: every alphanumeric token is prefixed with a
  *     replica tag INSIDE the token (`quick` → `zz3qquick`), keeping
  *     token counts and shingle structure identical per replica while
  *     making the replica vocabularies pairwise disjoint;
  *   - embeddings.embedding: per-(replica, dimension) deterministic
  *     sign flips — norms and within-replica geometry preserved,
  *     cross-replica cosines ≈ 0 in expectation.
  *
  * Generation is idempotent: a meta marker records (source, factor)
  * and a complete prior output is reused.
  */
object ScaleUp {

  private val B = 1000000000L // bigint key offset per replica
  private val I = 1000000 // int key offset per replica

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** All (or `only` the named) tables scaled; returns `outDir` ready
    * for `Tables.*` reads of the generated tables. `only` exists for
    * the deep tiers (e.g. the 100× century tier drives five
    * documents/embeddings queries — replicating lineitem 100× would
    * cost gigabytes of parquet nothing reads).
    */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int = 10, only: Seq[String] = Nil): String = {
    require(factor >= 1)
    val tables = if (only.isEmpty) AllTables else {
      val bad = only.filterNot(AllTables.contains)
      require(bad.isEmpty, s"unknown tables: $bad")
      AllTables.filter(only.contains)
    }
    val meta = new java.io.File(outDir, "_GRAFT_SCALEUP")
    val want = s"src=$srcDir factor=$factor v2 tables=${tables.mkString(",")}"
    val complete = meta.isFile &&
      new String(java.nio.file.Files.readAllBytes(meta.toPath)) == want &&
      tables.forall(t => new java.io.File(s"$outDir/$t.parquet/_SUCCESS").isFile)
    if (complete) return outDir

    def src(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def shiftL(c: String, r: Int): Column = col(c) + lit(r.toLong * B)
    def shiftI(c: String, r: Int): Column = col(c) + lit(r * I)

    def replicate(t: String)(tx: (DataFrame, Int) => DataFrame): Unit =
      if (tables.contains(t)) {
        val base = src(t)
        (0 until factor).map(r => tx(base, r))
          .reduce(_.unionByName(_))
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }

    replicate("region") { (d, r) =>
      d.withColumn("r_regionkey", shiftI("r_regionkey", r))
    }
    replicate("nation") { (d, r) =>
      d.withColumn("n_nationkey", shiftI("n_nationkey", r))
        .withColumn("n_regionkey", shiftI("n_regionkey", r))
    }
    replicate("customer") { (d, r) =>
      d.withColumn("c_custkey", shiftL("c_custkey", r))
        .withColumn("c_nationkey", shiftI("c_nationkey", r))
    }
    replicate("supplier") { (d, r) =>
      d.withColumn("s_suppkey", shiftL("s_suppkey", r))
        .withColumn("s_nationkey", shiftI("s_nationkey", r))
    }
    replicate("part") { (d, r) =>
      d.withColumn("p_partkey", shiftL("p_partkey", r))
    }
    replicate("orders") { (d, r) =>
      d.withColumn("o_orderkey", shiftL("o_orderkey", r))
        .withColumn("o_custkey", shiftL("o_custkey", r))
    }
    replicate("lineitem") { (d, r) =>
      d.withColumn("l_orderkey", shiftL("l_orderkey", r))
        .withColumn("l_partkey", shiftL("l_partkey", r))
        .withColumn("l_suppkey", shiftL("l_suppkey", r))
    }
    replicate("events") { (d, r) =>
      d.withColumn("event_id", shiftL("event_id", r))
        .withColumn("user_id", shiftL("user_id", r))
    }
    replicate("documents") { (d, r) =>
      val shifted = d.withColumn("doc_id", shiftL("doc_id", r))
      if (r == 0) shifted
      else shifted
        .withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"zz${r}q$$1"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (d, r) =>
      val shifted = d.withColumn("vec_id", shiftL("vec_id", r))
      if (r == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          x * (lit(1) - lit(2) * pmod(hash(i, lit(r)), lit(2))).cast("float")))
    }

    java.nio.file.Files.write(meta.toPath, want.getBytes("UTF-8"))
    outDir
  }
}
