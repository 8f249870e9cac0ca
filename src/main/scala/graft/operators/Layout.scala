package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * technique lakehouse table formats use (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders) to make parquet min/max statistics prune on
  * MORE THAN ONE column. Sorting by the bit-interleaved Z-value keeps
  * rows close in BOTH dimensions close in the file order, so a
  * selective filter on either column (or both) touches a small band of
  * row groups instead of the whole table — the property a plain sort
  * only gives its leading column.
  *
  * The Z-value is a pure column expression (shift/mask/or — codegen'd,
  * and exactly replicable in any engine with integer bit ops).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * int columns: result bit `2i+1` is bit `i` of `x`, bit `2i` is
    * bit `i` of `y`. `bits` ≤ 31 keeps everything in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL over expressions `x`/`y`
    * (DuckDB/engine-portable), for oracle parity checks.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i + 1}) | (((($y) >> $i) & 1) << ${2 * i})"
    }.mkString("(", " | ", ")")

  /** Report from [[compact]]: file counts and bytes before/after. */
  final case class CompactionReport(
      filesBefore: Int, filesAfter: Int, bytes: Long, rows: Long)

  /** Small-file compaction — the table-maintenance pass every
    * long-lived 100 TB warehouse needs: streaming ingest and
    * fine-grained partitioning accumulate thousands of KB-scale
    * parquet files whose per-file open/footer cost dominates scans.
    * Rewrites a parquet directory into `ceil(bytes / targetBytes)`
    * files (optionally sorted within files to restore clustering),
    * then atomically swaps the rewrite into place (write to a sibling
    * temp dir → rename old aside → rename new in → drop old).
    * Coalesce, not repartition, when only merging: no shuffle.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L << 20,
      sortWithinFiles: Seq[String] = Nil): CompactionReport = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(path).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    require(files.nonEmpty, s"no parquet files under $dir")
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val shaped =
      if (sortWithinFiles.nonEmpty)
        df.repartition(nOut).sortWithinPartitions(
          sortWithinFiles.head, sortWithinFiles.tail: _*)
      else df.coalesce(nOut)
    val tmp = new Path(dir + "__compact_tmp")
    shaped.write.mode("overwrite").parquet(tmp.toString)
    swapInPlace(fs, tmp, path)
    val after = fs.listStatus(path)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    CompactionReport(files.length, after, bytes, rows)
  }

  /** Install `tmp` at `path` atomically-ish: rename the old dir aside,
    * rename the rewrite in, drop the old (rolling back on failure).
    */
  private def swapInPlace(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, path: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(path.toString + "__swap_old")
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"swap: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"swap: cannot install $tmp")
    }
    fs.delete(old, true)
  }

  /** Rewrite-based upsert (MERGE) into a parquet directory: rows of
    * `updates` replace existing rows sharing the same key, the rest
    * insert — the slowly-changing-table maintenance op a plain
    * parquet warehouse expresses as anti-join + union + swap (a table
    * format does the same rewrite under a transaction log; the join
    * shape — existing LEFT ANTI updates on the key — is identical).
    * The updates side is usually tiny and broadcasts; the payload is
    * rewritten once, never shuffled (anti join build side is the
    * update keys). Returns (rowsBefore, rowsUpserted, rowsAfter).
    */
  def upsert(spark: org.apache.spark.sql.SparkSession, dir: String,
      updates: DataFrame, keyCols: Seq[String]): (Long, Long, Long) = {
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val existing = spark.read.parquet(dir)
    val before = existing.count()
    val nUp = updates.count()
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val merged = existing
      .join(broadcast(keys), keyCols, "left_anti")
      .unionByName(updates.select(existing.columns.map(col): _*))
    val tmp = new Path(dir + "__upsert_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    swapInPlace(fs, tmp, path)
    (before, nUp, spark.read.parquet(dir).count())
  }

  /** Apply a CDC change log to a base snapshot — the lakehouse MERGE
    * that [[upsert]] (insert/replace only) doesn't cover: `changes`
    * carries the base's payload columns plus an op column
    * (`I`/`U`/`D`) and a monotone sequence column (LSN, commit ts).
    * Per key, the highest-sequence change wins (ties broken by op
    * descending — `U` over `I` over `D` is impossible to hit with a
    * well-formed log, but the rule keeps the operator deterministic on
    * malformed input); a winning `D` removes the key, a winning
    * `I`/`U` replaces-or-inserts the payload, and untouched base rows
    * pass through. Exactly Delta/Iceberg `MERGE`
    * `WHEN MATCHED [AND op='D'] DELETE / UPDATE / WHEN NOT MATCHED
    * INSERT` semantics, computed as a plain DataFrame.
    *
    * Scale shape: the per-key latest-change reduction is a
    * `row_number` window over the CHANGE LOG only (a day's deltas, not
    * the snapshot), with its `rank = 1` filter running map-side as a
    * partial WindowGroupLimit; the base is touched by one left-anti
    * equi-join on the (typically broadcastable — AQE decides) distinct
    * changed-key set plus a union. The 100 TB snapshot is never
    * shuffled on anything but the join key, and only its changed keys
    * move.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    base
      .join(latest.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_anti")
      .unionByName(
        latest.where(col(opCol) =!= "D")
          .select(base.columns.map(col): _*))
  }

  /** Row-level diff between two versions of a dataset — the curation-
    * iteration primitive next to [[upsert]]: every id classified as
    * `added` / `removed` / `changed` / `unchanged`, where "changed"
    * compares an md5 fingerprint of `fpCols` (null-safe: nulls encode
    * as a reserved byte, columns join on an unprintable separator, so
    * `("a",null)` never collides with `("a","")` or `(null,"a")`).
    *
    * Scale shape: fingerprints are map-side projections — the wide
    * payload columns never travel; the one shuffle is the full-outer
    * equi-join on (id, fp) pairs, ~40 bytes/row regardless of row
    * width. Diffing two 100 TB snapshots moves 2×|ids| fingerprint
    * pairs, not the corpora.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      fpCols: Seq[String]): DataFrame = {
    require(fpCols.nonEmpty, "need at least one fingerprint column")
    def fp(df: DataFrame, as: String) = df.select(
      col(idCol).as("id"),
      md5(concat_ws("\u0001",
        fpCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
        .as(as))
    fp(oldDf, "fp_old").join(fp(newDf, "fp_new"), Seq("id"), "full_outer")
      .withColumn("change",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select("id", "change")
  }

  /** Rewrite `df` into a Z-ordered layout over two dimension columns:
    * range-partition on the Z-value (balanced output files even when
    * the dimensions are skewed — range boundaries come from a sampled
    * sketch), then sort within each partition, so every output file
    * covers a compact Z-range ⇒ compact ranges in BOTH dimensions ⇒
    * parquet/scan-level min-max pruning works for either predicate.
    */
  def zorder(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Consistent-hash ring resize audit — how many keys MOVE when the
    * shard ring grows from `nBefore` to `nBefore`+1 nodes (theory:
    * ~1/(n+1); naive mod-N hashing moves ~n/(n+1) — this report is the
    * argument for ring placement in any shard/cache layout). Ring
    * positions are md5 of "node:i", key positions md5 of "key:"||key
    * — both SQL-replayable; a key lands on the clockwise successor.
    * One row: `(n_keys, moved, moved_frac, expected_frac)`.
    *
    * Scale shape: key dedup is the only corpus-grain shuffle; both
    * ring assignments are row-local folds over an (n+1)-entry literal.
    */
  def consistentHashMovement(df: DataFrame, keyCol: String,
      nBefore: Int): DataFrame = {
    def pos(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def ringLit(n: Int) = typedLit(
      (0 until n).map(i => (pos(s"node:$i"), i)).sortBy(_._1))
      .cast("array<struct<p:bigint,node:int>>")
    def assign(ring: Column, kp: Column): Column = {
      val ge = filter(ring, s => s.getField("p") >= kp)
      when(size(ge) > 0, element_at(ge, 1).getField("node"))
        .otherwise(element_at(ring, 1).getField("node"))
    }
    val keys = df.select(col(keyCol).as("k")).distinct()
      .withColumn("__kp", graft.functions.md5Long(
        concat_ws(":", lit("key"), col("k").cast("string"))))
    keys
      .select(
        assign(ringLit(nBefore), col("__kp")).as("__nb"),
        assign(ringLit(nBefore + 1), col("__kp")).as("__na"))
      .agg(count(lit(1)).as("n_keys"),
        count(when(col("__nb") =!= col("__na"), lit(1))).as("moved"))
      .select(col("n_keys"), col("moved"),
        round(col("moved").cast("double") / col("n_keys"), 6)
          .as("moved_frac"),
        round(lit(1d) / (nBefore + 1), 6).as("expected_frac"))
  }

  /** Incremental aggregate maintenance — merge a new batch's PARTIAL
    * aggregate into the existing aggregate state without touching the
    * historical corpus: for algebraic aggregates (count/sum/min/max —
    * anything with a combine), state ⊎ partial(batch) re-grouped on the
    * keys IS the full recompute. This is how a 100 TB rollup absorbs a
    * daily partition: cost is O(batch + |state|), not O(corpus); the
    * q256 gate proves merged ≡ full-recompute against the oracle.
    * `sums` are the columns combined by SUM (counts are sums of
    * partial counts).
    */
  def mergeAggState(state: DataFrame, batchPartial: DataFrame,
      keys: Seq[String], sums: Seq[String]): DataFrame = {
    val aggs = sums.map(c => sum(col(c)).as(c))
    state.unionByName(batchPartial)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Bucketed co-located join — the shuffle-elimination layout for a
    * join both sides of which are re-read many times (fact⨝fact on a
    * shared key): each side is written ONCE as a bucketed+sorted table
    * (`bucketBy(buckets, key).sortBy(key)`), after which every join on
    * that key plans as a SortMergeJoin with NO Exchange and NO Sort on
    * either side — the shuffle was paid at write time, amortized over
    * every subsequent join. This is the generic-table sibling of the
    * geno write's variant_id bucketing (`VcfBuild`), and the layout a
    * 100 TB star-schema pipeline uses for its recurring fact joins.
    * `ScaleSpec` pins the exchange-free plan.
    *
    * Both writes are idempotent overwrites into the session catalog;
    * re-invocation within the same driver replaces them. The table
    * names (and their warehouse paths) carry the driver's sanitized
    * `applicationId`, so two CONCURRENT drivers invoking the same
    * logical `name` write disjoint tables/paths instead of racing on a
    * shared one; [[dropBucketedTables]] removes a pair once its join
    * result has been consumed.
    */
  def bucketedCoLocatedJoin(left: DataFrame, right: DataFrame,
      key: String, buckets: Int, name: String): DataFrame = {
    val spark = left.sparkSession
    val uniq = tableSuffix(spark)
    def save(df: DataFrame, t: String): DataFrame = {
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$t")
        .format("parquet").saveAsTable(t)
      spark.table(t)
    }
    save(left, s"${name}_${uniq}_l")
      .join(save(right, s"${name}_${uniq}_r"), Seq(key))
  }

  /** Drop the catalog tables (and their files) a
    * [[bucketedCoLocatedJoin]] invocation of `name` created in THIS
    * driver, once the returned DataFrame has been fully consumed —
    * the cleanup half of the per-driver-unique naming contract.
    */
  def dropBucketedTables(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    val uniq = tableSuffix(spark)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(s"${name}_${uniq}_l", s"${name}_${uniq}_r").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      // [[bucketedCoLocatedJoin]] writes through an explicit `path`
      // option (external table), so DROP TABLE removes only the catalog
      // entry — the files need this sweep. Hadoop FileSystem (not
      // java.io.File) so any warehouse scheme — file://, hdfs://,
      // s3a:// — works; both the as-written casing and the catalog's
      // lowercased form are tried. Best-effort per table: a sweep
      // failure must not leave the OTHER table undropped.
      try {
        val conf = spark.sessionState.newHadoopConf()
        Seq(t, t.toLowerCase(java.util.Locale.ROOT)).distinct.foreach { d =>
          val p = new org.apache.hadoop.fs.Path(wh, d)
          val fs = p.getFileSystem(conf)
          if (fs.exists(p)) { fs.delete(p, true); () }
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Per-driver-unique, catalog-identifier-safe suffix derived from
    * the Spark `applicationId` (e.g. `local-1700000000001` →
    * `local_1700000000001`) — stable within a driver (so re-invocation
    * stays an idempotent overwrite), distinct across concurrent ones.
    */
  private def tableSuffix(spark: org.apache.spark.sql.SparkSession): String =
    spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
}
