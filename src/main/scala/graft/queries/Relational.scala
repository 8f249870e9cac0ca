package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._
import graft.operators.RangeJoin

/** Relational operator surface (SURVEY.md §2.1–§2.8), expressed over the
  * driver testdata. Each query has a DuckDB oracle in [[oracle]]; column
  * names/aliases match exactly (the driver hash-compares by sorted
  * column name).
  *
  * Determinism conventions shared by every query:
  *   - explicit ORDER BY on output keys on both sides;
  *   - double aggregates rounded (2dp for sums, 4dp for means) so
  *     engine-specific fp accumulation order can't flip the hash;
  *   - no rand(): pseudo-random choices derive from md5 (cross-engine).
  */
object Relational {

  /** q300/q306/q310 shared oracle prefix: the dirtied-registry and
    * blocked-candidate-pair CTEs, verbatim.
    */
  private val LinkagePairsCte: String =
    """dirty AS (
            SELECT c_custkey AS dirty_id,
              CASE WHEN ('0x' || substr(md5('rl:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 3 = 0
                THEN upper(c_name) ELSE c_name END AS d_name,
              CASE WHEN ('0x' || substr(md5('rb:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 5 = 0
                THEN c_acctbal + 100.25 ELSE c_acctbal END AS d_bal,
              c_nationkey, c_mktsegment
            FROM customer),
          pairs AS (
            SELECT l.c_custkey, r.dirty_id,
              levenshtein(lower(l.c_name), lower(r.d_name)) <= 2 AS agree_name,
              l.c_name = r.d_name AS agree_name_exact,
              abs(l.c_acctbal - r.d_bal) <= 1.0 AS agree_balance
            FROM customer l JOIN dirty r
              ON l.c_nationkey = r.c_nationkey
             AND l.c_mktsegment = r.c_mktsegment)"""

  /** q310's EM oracle: the exact integer-micro-weight EM replay
    * ([[graft.operators.Linkage.estimateMU]]'s determinism contract)
    * unrolled as one MATERIALIZED CTE per iteration.
    */
  private def linkageEmSql(iters: Int): String = {
    val k = 3
    def caseProd(p: String, pref: String) = (0 until k).map(i =>
      s"(CASE WHEN g$i THEN $p.$pref$i ELSE 1 - $p.$pref$i END)")
      .mkString(" * ")
    def clamp(x: String) =
      s"least(greatest(round($x, 12), 1e-6), 1 - 1e-6)"
    val its = (1 to iters).map { t =>
      val prev = s"it${t - 1}"
      // c is cast to HUGEINT BEFORE the multiply: c·W is otherwise
      // evaluated in BIGINT ahead of DuckDB's HUGEINT sum, and with W
      // up to 1e12 any pattern count above ~9.2e6 pairs overflows —
      // the Spark side uses BigInt for exactly this (r9 ADVICE)
      val ms = (0 until k).map(i => clamp(
        s"CAST(sum(CASE WHEN g$i THEN CAST(c AS HUGEINT) * W ELSE 0 END) AS DOUBLE) / CAST(sum(CAST(c AS HUGEINT) * W) AS DOUBLE)") +
        s" AS m$i").mkString(",\n              ")
      val us = (0 until k).map(i => clamp(
        s"CAST(sum(CASE WHEN g$i THEN CAST(c AS HUGEINT) * (1000000000000 - W) ELSE 0 END) AS DOUBLE) / CAST(sum(CAST(c AS HUGEINT) * (1000000000000 - W)) AS DOUBLE)") +
        s" AS u$i").mkString(",\n              ")
      s"""it$t AS MATERIALIZED (
            SELECT
              ${clamp("CAST(sum(CAST(c AS HUGEINT) * W) AS DOUBLE) / (CAST(sum(c) AS DOUBLE) * 1e12)")} AS lam,
              $ms,
              $us
            FROM (
              SELECT g0, g1, g2, c,
                CAST(floor(pm / (pm + pu) * 1e12 + 0.5) AS BIGINT) AS W
              FROM (
                SELECT g0, g1, g2, c,
                  p.lam * ${caseProd("p", "m")} AS pm,
                  (1 - p.lam) * ${caseProd("p", "u")} AS pu
                FROM pats, $prev p)))"""
    }.mkString(",\n          ")
    val names = Seq("agree_name", "agree_name_exact", "agree_balance")
    val finalSel = names.zipWithIndex.map { case (n, i) =>
      s"""SELECT '$n' AS comparator, m$i AS m, u$i AS u,
             round(ln(m$i / u$i), 6) AS agree_weight,
             round(ln((1 - m$i) / (1 - u$i)), 6) AS disagree_weight,
             lam
           FROM it$iters"""
    }.mkString("\n           UNION ALL\n           ")
    s"""WITH $LinkagePairsCte,
          pats AS MATERIALIZED (
            SELECT coalesce(agree_name, false) AS g0,
              coalesce(agree_name_exact, false) AS g1,
              coalesce(agree_balance, false) AS g2,
              count(*) AS c
            FROM pairs GROUP BY 1, 2, 3),
          it0 AS (
            SELECT CAST(0.1 AS DOUBLE) AS lam,
              CAST(0.9 AS DOUBLE) AS m0, CAST(0.9 AS DOUBLE) AS m1,
              CAST(0.9 AS DOUBLE) AS m2,
              CAST(0.1 AS DOUBLE) AS u0, CAST(0.1 AS DOUBLE) AS u1,
              CAST(0.1 AS DOUBLE) AS u2),
          $its
         SELECT * FROM (
           $finalSel)
         ORDER BY comparator"""
  }

  /** q300/q306 shared stage: Fellegi–Sunter-scored candidate pairs
    * between customer and a deterministically-dirtied copy of itself.
    */
  /** The deterministically-dirtied customer copy shared by the
    * linkage-tier gates (q300/q306/q310/q321).
    */
  private def linkageDirty(s: SparkSession, d: String): DataFrame =
    cust(s, d).select(
      col("c_custkey").as("dirty_id"),
      when(pmod(graft.functions.md5Long(
          concat(lit("rl:"), col("c_custkey").cast("string"))), lit(3)) === 0,
        upper(col("c_name"))).otherwise(col("c_name")).as("d_name"),
      when(pmod(graft.functions.md5Long(
          concat(lit("rb:"), col("c_custkey").cast("string"))), lit(5)) === 0,
        col("c_acctbal") + lit(100.25)).otherwise(col("c_acctbal"))
        .as("d_bal"),
      col("c_nationkey"), col("c_mktsegment"))

  private def linkageScored(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Linkage
    val c = cust(s, d)
    val dirty = linkageDirty(s, d)
    Linkage.fellegiSunter(
      // lower() staged per ROW — inside the comparator it would run
      // once per blocked PAIR (×|block| string allocations)
      c.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"), col("c_mktsegment"),
        lower(col("c_name")).as("c_lname")),
      dirty.withColumn("d_lname", lower(col("d_name"))),
      "c_custkey", "dirty_id",
      blockCols = Seq("c_nationkey", "c_mktsegment"),
      comparators = Seq(
        Linkage.Comparator("name",
          // bounded form: O(k·n) with early exit, returns −1 above the
          // threshold — ≥ 0 ⇔ distance ≤ 2, same verdict as the
          // oracle's unbounded levenshtein(...) <= 2
          levenshtein(col("l.c_lname"), col("r.d_lname"), 2) >= 0,
          6.0, -3.0),
        Linkage.Comparator("name_exact",
          col("l.c_name") === col("r.d_name"), 4.0, -1.0),
        Linkage.Comparator("balance",
          abs(col("l.c_acctbal") - col("r.d_bal")) <= 1.0, 5.0, -2.0)),
      linkThreshold = 10.0, nonLinkThreshold = 0.0)
  }

  /** q330's oracle: Luby MIS unrolled round by round over the
    * consecutive-custkey chain graph — winners across rounds are
    * disjoint, exhausted rounds are empty no-ops (the fixpoint-within-
    * maxRounds contract [[graft.operators.Graph.maximalIndependentSet]]
    * enforces).
    */
  private def misSql(rounds: Int): String = {
    def p(src: String, salt: String) =
      s"('0x' || substr(md5('$salt:' || CAST($src AS VARCHAR)), 1, 15))::BIGINT"
    val its = (1 to rounds).map { k =>
      val prev = s"u${k - 1}"
      s"""p$k AS MATERIALIZED (
            SELECT id, ${p("id", s"mis$k")} AS p FROM $prev),
          n$k AS MATERIALIZED (
            SELECT s.src AS id, min(pd.p) AS nm
            FROM sym s
            JOIN p$k ps ON ps.id = s.src
            JOIN p$k pd ON pd.id = s.dst
            GROUP BY s.src),
          w$k AS MATERIALIZED (
            SELECT u.id FROM p$k u LEFT JOIN n$k n USING (id)
            WHERE n.nm IS NULL OR u.p < n.nm),
          d$k AS MATERIALIZED (
            SELECT id FROM w$k
            UNION
            SELECT s.dst AS id FROM sym s JOIN w$k w ON w.id = s.src),
          u$k AS MATERIALIZED (
            SELECT id FROM $prev EXCEPT SELECT id FROM d$k)"""
    }.mkString(",\n          ")
    val unionAll = (1 to rounds).map(k => s"SELECT id FROM w$k")
      .mkString("\n           UNION ALL\n           ")
    s"""WITH hit AS (
            SELECT c_custkey AS k FROM customer
            WHERE ${p("c_custkey", "mise")} % 3 = 0),
          e0 AS (
            SELECT h.k AS src, h.k + 1 AS dst FROM hit h
            JOIN customer c ON c.c_custkey = h.k + 1),
          sym AS MATERIALIZED (
            SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
          u0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym),
          $its
         SELECT id FROM (
           $unionAll)
         ORDER BY id"""
  }

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- two-feature OLS per returnflag (closed-form Cramer solve
    //      of the normal equations over exact integer-grid moments) ----
    "q370_ols2" -> ((s, d) => {
      graft.operators.Eval.ols2(Tables.lineitem(s, d), "l_returnflag",
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        floor(col("l_quantity") * 100 + 0.5).cast("long"),
        floor(col("l_discount") * 10000 + 0.5).cast("long"))
    }),

    // ---- CART decision stump: best Gini split of price cents
    //      against the returned flag over 32 equal-width buckets ----
    "q371_best_split" -> ((s, d) => {
      graft.operators.Eval.giniSplit(Tables.lineitem(s, d),
        floor(col("l_extendedprice") * 100 + 0.5),
        col("l_returnflag") === "R", bins = 32)
    }),

    // ---- Simpson's-paradox audit: per-returnflag vs pooled sign of
    //      the discount↔price association (exact integer covariance) ----
    "q383_simpsons" -> ((s, d) => {
      graft.operators.Eval.simpsonsAudit(Tables.lineitem(s, d),
        "l_returnflag",
        floor(col("l_discount") * 10000 + 0.5).cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
    }),

    // ---- stratified IPW treatment-effect estimate: returned-flag
    //      "treatment" on price, linestatus strata propensities ----
    "q398_ipw" -> ((s, d) => {
      graft.operators.Eval.ipwEffect(Tables.lineitem(s, d),
        "l_linestatus", col("l_returnflag") === "R",
        floor(col("l_extendedprice") * 100 + 0.5))
    }),

    // ---- aggregation core (A-*, P1): TPC-H Q1 shape ----
    "q01_pricing_summary" -> ((s, d) => {
      li(s, d)
        .filter(col("l_shipdate") <= lit("2000-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- F1 equality filter + P1 projection (pushdown) ----
    "q02_filter_eq" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_brand") === "Brand#13")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    }),

    // ---- F2 range + F5 conjunction ----
    "q03_filter_range" -> ((s, d) => {
      li(s, d)
        .filter(col("l_quantity") >= 45 && col("l_quantity") <= 50 && col("l_discount") < 0.02)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- F3 IN-list ----
    "q04_filter_in" -> ((s, d) => {
      ord(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // ---- J1 multi-way inner equi-join + agg (TPC-H Q5 shape);
    //      nation/region are broadcast (small dims) ----
    "q05_join_revenue_by_nation" -> ((s, d) => {
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"))
        .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // ---- J2 left outer join + null predicate ----
    "q06_left_join_no_orders" -> ((s, d) => {
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
        .filter(col("o_orderkey").isNull)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // ---- left-semi join (EXISTS) ----
    "q07_semi_join_big_orders" -> ((s, d) => {
      val big = ord(s, d).filter(col("o_totalprice") > 400000).select("o_orderkey")
      li(s, d)
        .join(big, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // ---- left-anti join (NOT EXISTS) ----
    "q08_anti_join_quiet_customers" -> ((s, d) => {
      val active = ord(s, d).filter(col("o_totalprice") > 250000).select("o_custkey")
      cust(s, d)
        .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // ---- J7 cross join ----
    "q09_cross_join" -> ((s, d) => {
      Tables.region(s, d).filter(col("r_regionkey") <= 2)
        .crossJoin(Tables.nation(s, d).filter(col("n_nationkey") <= 5))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    }),

    // ---- J6 union all + agg ----
    "q10_union_entities" -> ((s, d) => {
      val c = cust(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .withColumn("kind", lit("customer"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey"))
        .withColumn("kind", lit("supplier"))
      c.unionByName(su)
        .groupBy("nationkey")
        .agg(count(lit(1)).as("n_entities"), countDistinct("kind").as("n_kinds"))
        .orderBy("nationkey")
    }),

    // ---- A1 distinct ----
    "q11_distinct_flags" -> ((s, d) => {
      li(s, d).select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- top-k (TakeOrderedAndProject) ----
    "q12_topk_orders" -> ((s, d) => {
      ord(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // ---- window: row_number, latest order per customer ----
    "q13_window_latest_order" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      ord(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("last_order_date"))
        .orderBy("o_custkey")
    }),

    // ---- window: running aggregate per customer ----
    "q14_window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord(s, d)
        .withColumn("running_spend", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- multi-stat aggregate ----
    "q15_agg_stats" -> ((s, d) => {
      li(s, d)
        .groupBy("l_returnflag")
        .agg(
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(stddev_samp("l_extendedprice"), 2).as("sd_price"),
          countDistinct("l_partkey").as("n_parts"))
        .orderBy("l_returnflag")
    }),

    // ---- rollup (grouping sets) ----
    "q16_rollup" -> ((s, d) => {
      li(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // ---- X9 pivot (long → wide) ----
    "q17_pivot_returnflag" -> ((s, d) => {
      li(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_linestatus")
    }),

    // ---- X7 unpivot (wide → long) ----
    "q18_unpivot_measures" -> ((s, d) => {
      val agg = li(s, d).agg(
        round(sum("l_quantity"), 2).as("qty"),
        round(sum("l_extendedprice"), 2).as("price"),
        round(sum("l_discount"), 2).as("discount"),
        round(sum("l_tax"), 2).as("tax"))
      agg.unpivot(Array.empty, Array(col("qty"), col("price"), col("discount"), col("tax")),
          "measure", "total")
        .orderBy("measure")
    }),

    // ---- X1 fixed-width binning ----
    "q19_price_histogram" -> ((s, d) => {
      ord(s, d)
        .withColumn("bin", floor(col("o_totalprice") / 50000).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("bin")
    }),

    // ---- Benford first-digit audit of the price column (χ² data-
    //      quality screen; digits from the exact cents INTEGER) ----
    "q182_benford" -> ((s, d) => {
      graft.operators.Eval.benfordAudit(li(s, d),
          round(col("l_extendedprice") * 100).cast("long"))
        .orderBy("digit")
    }),

    // ---- CSV sink/source round-trip (K3): write documents as quoted
    //      CSV, read back with the same schema — the identity oracle
    //      proves quoting/escaping fidelity byte-for-byte ----
    "q209_csv_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val out = s"${sys.props("java.io.tmpdir")}/graft_csv_${math.abs(d.hashCode)}"
      docs.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(out)
      s.read
        .option("header", "true").option("escape", "\"")
        .option("multiLine", "true")
        .schema(docs.schema)
        .csv(out)
        .orderBy("doc_id")
    }),

    // ---- JSON-lines sink/source round-trip: the semi-structured
    //      sibling of q209 — newlines/quotes in text survive as JSON
    //      string escapes; schema-on-read restores exact types ----
    "q227_jsonl_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val out = s"${sys.props("java.io.tmpdir")}/graft_jsonl_${math.abs(d.hashCode)}"
      docs.write.mode("overwrite").json(out)
      s.read.schema(docs.schema).json(out).orderBy("doc_id")
    }),

    // ---- ORC sink/source round-trip: the Hive-ecosystem columnar
    //      sibling of parquet — stripe stats, predicate pushdown and
    //      schema-on-read come with Spark's built-in orc source ----
    "q297_orc_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val out = s"${sys.props("java.io.tmpdir")}/graft_orc_${math.abs(d.hashCode)}"
      docs.write.mode("overwrite").orc(out)
      s.read.schema(docs.schema).orc(out).orderBy("doc_id")
    }),

    // ---- Fellegi–Sunter record linkage: the customer registry linked
    //      against a deterministically dirtied re-entry of itself
    //      (upper-cased names, corrupted phone digits, truncated
    //      addresses) — blocked on (nation, segment), three weighted
    //      field comparators, link/possible/non_link verdicts ----
    "q300_record_linkage" -> ((s, d) => {
      linkageScored(s, d)
        .where(col("verdict") =!= "non_link")
        .orderBy("c_custkey", "dirty_id")
    }),

    // ---- reciprocal-best-match 1:1 assignment over the q300 scored
    //      pairs: a pair survives iff best for BOTH its ids (ties by
    //      ascending partner id) — no id appears twice ----
    "q306_linkage_one_to_one" -> ((s, d) => {
      graft.operators.Linkage.oneToOne(
          linkageScored(s, d).where(col("verdict") =!= "non_link"),
          "c_custkey", "dirty_id", "score")
        .select("c_custkey", "dirty_id", "score")
        .orderBy("c_custkey")
    }),

    // ---- weight-of-evidence encoding + IV terms of event_type
    //      against the high-value label ----
    "q312_woe_encoding" -> ((s, d) => {
      graft.operators.Eval.woeEncode(
          Tables.events(s, d), "event_type",
          (col("value") > 50).cast("int"))
        .orderBy("category")
    }),

    // ---- schema-evolving union: unionByName(allowMissingColumns) —
    //      the heterogeneous-batch append every long-lived ingest
    //      pipeline needs (absent columns NULL-padded by NAME) ----
    "q332_union_by_name" -> ((s, d) => {
      val a = cust(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .where(col("c_custkey") % 7 === 0)
        .withColumn("src", lit("a"))
      val b = cust(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .where(col("c_custkey") % 11 === 0)
        .withColumn("src", lit("b"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("c_custkey", "src")
    }),

    // ---- bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep the
    //      per-customer order MULTIPLICITY q77's set forms collapse ----
    "q329_set_ops_all" -> ((s, d) => {
      val o = ord(s, d)
      val y96 = o.where(year(col("o_orderdate")) === 1996)
        .select("o_custkey")
      val y97 = o.where(year(col("o_orderdate")) === 1997)
        .select("o_custkey")
      y96.intersectAll(y97).withColumn("tag", lit("both"))
        .unionAll(y96.exceptAll(y97).withColumn("tag", lit("only_1996")))
        .groupBy("tag", "o_custkey")
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy("tag", "o_custkey")
    }),

    // ---- Luby maximal independent set over the consecutive-custkey
    //      chain graph: the "mutually unrelated / non-duplicate
    //      representative set" selection, all-integer priorities ----
    "q330_mis" -> ((s, d) => {
      val keys = cust(s, d).select(col("c_custkey"))
      val hit = keys.where(pmod(graft.functions.md5Long(
        concat(lit("mise:"), col("c_custkey").cast("string"))),
        lit(3)) === 0)
      val e = hit.select(col("c_custkey").as("a"),
          (col("c_custkey") + 1L).as("b"))
        .join(keys.select(col("c_custkey").as("b")), Seq("b"), "left_semi")
      graft.operators.Graph.maximalIndependentSet(e, "a", "b",
        maxRounds = 8).orderBy("id")
    }),

    // ---- PERMISSIVE corrupt-record ingest audit: the dirty-CSV
    //      behavior a 100 TB web-scrape ingest depends on — malformed
    //      rows land in _corrupt_record instead of failing the job ----
    "q325_csv_corrupt_audit" -> ((s, _) => {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_corrupt_csv"
      val lines = Seq(
        "id,qty,name",
        "1,10,alpha",
        "2,notanum,beta", // unparseable INT → corrupt
        "3,30,gamma",
        "4,40", // missing trailing column
        "5,50,delta,extra", // extra column → corrupt
        "6,60,zeta")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part.csv"),
        lines.mkString("\n").getBytes("UTF-8"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id INT, qty INT, name STRING, _corrupt_record STRING")
      // Spark disallows referencing ONLY the corrupt column of a raw
      // scan — cache() materializes the full rows first (the
      // documented workaround)
      val df = s.read.option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema).csv(dir).cache()
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col("_corrupt_record")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("qty")))
          .cast("long").as("qty_clean_sum"),
        count(when(col("_corrupt_record").isNull && col("id").isNotNull,
          lit(1))).as("n_clean"))
    }),

    // ---- Benjamini–Hochberg FDR over md5-derived p-values (u³ —
    //      skewed toward 0 so the rejection region is non-trivial) ----
    "q326_fdr_bh" -> ((s, d) => {
      val u = (pmod(graft.functions.md5Long(
          concat(lit("bh:"), col("c_custkey").cast("string"))),
        lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000d)
      graft.operators.Eval.fdrBH(
          cust(s, d).withColumn("p_raw", u * u * u)
            .select("c_custkey", "p_raw"),
          "c_custkey", "p_raw", alpha = 0.05)
        .orderBy("rank")
    }),

    // ---- Holm step-down FWER adjustment over the same p-value family
    //      as q326 — the rejection set every genome-wide report quotes
    //      when false DISCOVERIES (not rate) must be controlled ----
    "q423_holm" -> ((s, d) => {
      val u = (pmod(graft.functions.md5Long(
          concat(lit("bh:"), col("c_custkey").cast("string"))),
        lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000d)
      graft.operators.Eval.holmAdjust(
          cust(s, d).withColumn("p_raw", u * u * u)
            .select("c_custkey", "p_raw"),
          "c_custkey", "p_raw", alpha = 0.05)
        .orderBy("rank")
    }),

    // ---- blocking-quality report for the q300 linkage blocking:
    //      RR from block-count statistics (no pair materialization),
    //      PC = 1 since dirtying never touches the block keys ----
    "q321_blocking_quality" -> ((s, d) => {
      graft.operators.Linkage.blockingQuality(
        cust(s, d).select("c_custkey", "c_nationkey", "c_mktsegment"),
        linkageDirty(s, d),
        Seq("c_nationkey", "c_mktsegment"), "c_custkey", "dirty_id")
    }),

    // ---- t-closeness audit: (segment, nation) classes vs the global
    //      2k-binned balance distribution (ordered EMD) ----
    "q317_t_closeness" -> ((s, d) => {
      graft.operators.Privacy.tClosenessAudit(
          Tables.customer(s, d), Seq("c_mktsegment", "c_nationkey"),
          floor(col("c_acctbal") / 2000d).cast("long"), t = 0.3)
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // ---- ε-DP noisy per-type value sums (clipped Laplace) ----
    "q313_dp_noisy_sums" -> ((s, d) => {
      graft.operators.Privacy.dpNoisySums(
          Tables.events(s, d), "event_type", "value",
          lo = 0d, hi = 100d, epsilon = 0.5)
        .orderBy("event_type")
    }),

    // ---- EM estimation of the Fellegi–Sunter m/u/λ parameters over
    //      the q300 blocked pairs (10 iterations, integer
    //      micro-weight determinism contract) ----
    "q310_linkage_em" -> ((s, d) => {
      graft.operators.Linkage.estimateMU(
          linkageScored(s, d),
          Seq("agree_name", "agree_name_exact", "agree_balance"),
          iters = 10)
        .orderBy("comparator")
    }),

    // ---- CDC MERGE apply: latest-per-key change log (U/D/I, two
    //      sequence waves — a seq-2 U overrides and can resurrect a
    //      seq-1 D) applied to the orders snapshot ----
    "q307_cdc_apply" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val h = graft.functions.md5Long(
        concat(lit("cdc:"), col("o_orderkey").cast("string")))
      val touched = base.where(pmod(h, lit(10)) === 0)
      val wave1 = touched.select(
        col("o_orderkey"), lit(1L).as("seq"),
        when(pmod(h, lit(3)) === 0, lit("D")).otherwise(lit("U")).as("op"),
        lit("X").as("o_orderstatus"),
        round(col("o_totalprice") + 1000d, 2).as("o_totalprice"))
      val wave2 = touched.where(pmod(h, lit(20)) === 0).select(
        col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"),
        lit("Y").as("o_orderstatus"),
        round(col("o_totalprice") + 2000d, 2).as("o_totalprice"))
      val inserts = base.where(pmod(h, lit(17)) === 0).select(
        (col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit(1L).as("seq"), lit("I").as("op"),
        lit("N").as("o_orderstatus"), lit(1.5d).as("o_totalprice"))
      val changes = wave1.unionByName(wave2).unionByName(inserts)
      graft.operators.Layout.cdcApply(
          base, changes, Seq("o_orderkey"), "seq", "op")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("sum_price"),
          sum("o_orderkey").as("sum_key"))
        .orderBy("o_orderstatus")
    }),

    // ---- hive-partitioned layout + pruned read: events written
    //      partitioned by event_type, ONE partition read back — the
    //      scan lists only that directory (the layout lever that turns
    //      a 100 TB full scan into a per-key seek; OperatorsSpec pins
    //      the inputFiles set to the single partition) ----
    "q298_partition_prune" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val out = s"${sys.props("java.io.tmpdir")}/graft_part_${math.abs(d.hashCode)}"
      ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
      s.read.parquet(out)
        .where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 4).as("sum_value"))
        .orderBy("user_id")
    }),

    // ---- C5-C8 string functions ----
    "q20_string_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")
    }),

    // ---- C1/C4 gt2snp dosage recode (reference parity on synthesized GTs) ----
    "q21_gt2snp_recode" -> ((s, d) => {
      val gts = Seq("0/0", "0|0", "0/1", "1|0", "1/1", "1|1", "./.", "./1")
      li(s, d)
        .withColumn("gt_raw",
          element_at(
            array(gts.map(lit): _*),
            (pmod(col("l_orderkey") * 10 + col("l_linenumber"), lit(8)) + 1).cast("int")))
        .withColumn("dosage", coalesce(gt2snp(col("gt_raw")), lit(-1d)))
        .groupBy("gt_raw", "dosage")
        .agg(count(lit(1)).as("n"))
        .orderBy("gt_raw")
    }),

    // ---- C10/C11 null handling ----
    "q22_null_handling" -> ((s, d) => {
      ord(s, d)
        .withColumn("status_or_null",
          when(col("o_orderstatus") === "P", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
        .withColumn("status_filled", coalesce(col("status_or_null"), lit("PENDING")))
        .groupBy("status_filled")
        .agg(count(lit(1)).as("n"),
          count(col("status_or_null")).as("n_nonnull"))
        .orderBy("status_filled")
    }),

    // ---- C9 casts ----
    "q23_casts" -> ((s, d) => {
      li(s, d)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("okey_str"),
          col("l_shipdate").cast("date").as("ship_date"),
          round(col("l_tax") * 100, 0).cast("int").as("tax_pct"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- A5 deterministic stratified sample (md5 order stands in for rand) ----
    "q24_stratified_sample" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(md5(col("o_orderkey").cast("string")).asc, col("o_orderkey").asc)
      ord(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("o_orderpriority", "rn", "o_orderkey")
        .orderBy("o_orderpriority", "rn")
    }),

    // ---- A4/X12 grouped collect (sorted, stringified for comparability) ----
    "q25_collect_sorted" -> ((s, d) => {
      li(s, d)
        .groupBy("l_returnflag")
        .agg(concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // ---- exact percentiles (interpolated order statistics) ----
    // window-sort implementation, NOT the built-in percentile()
    // aggregate: identical values, but bounded executor memory at any
    // group size (the built-in buffers whole groups on the heap)
    // ---- five-table star join: nation revenue share within
    //      (region, year); bounded dims broadcast ----
    "q254_market_share" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"),
          col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"))
      // share of the (region, year) total, from the ROUNDED revenues
      val w = Window.partitionBy("r_name", "yr")
      rev.withColumn("share",
          round(col("revenue") / sum("revenue").over(w), 6))
        .orderBy("r_name", "yr", "n_name")
    }),

    // ---- correlated scalar subquery: customers above their nation's
    //      average spend (exercises spark.sql + decorrelation) ----
    "q255_above_avg" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      s.sql("""
        WITH spend AS (
          SELECT o_custkey, sum(o_totalprice) AS sp
          FROM orders_v GROUP BY o_custkey),
        cs AS (
          SELECT c_custkey, c_nationkey, sp
          FROM customer_v JOIN spend ON c_custkey = o_custkey)
        SELECT cs.c_custkey, n_name, round(sp, 2) AS spend
        FROM cs JOIN nation_v ON n_nationkey = c_nationkey
        WHERE sp > (SELECT avg(sp) FROM cs cs2
                    WHERE cs2.c_nationkey = cs.c_nationkey)
        ORDER BY n_name, c_custkey""")
    }),

    // ---- incremental aggregate maintenance: state ⊎ partial(batch)
    //      must equal the full recompute (the oracle IS the full) ----
    "q256_incremental_agg" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      val state = partial(ev.where(pmod(col("event_id"), lit(2)) === 0))
      val batch = partial(ev.where(pmod(col("event_id"), lit(2)) === 1))
      graft.operators.Layout
        .mergeAggState(state, batch, Seq("event_type"), Seq("n", "sum_value"))
        .select(col("event_type"), col("n"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // ---- referential-integrity audit (orphan rows per FK edge) ----
    "q261_fk_audit" -> ((s, d) => {
      val lo = Tables.lineitem(s, d).select("l_orderkey")
        .join(Tables.orders(s, d).select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("lineitem_rows"),
          count(when(col("o_orderkey").isNull, lit(1)))
            .as("lineitem_orphans"))
      val oc = Tables.orders(s, d).select("o_custkey")
        .join(Tables.customer(s, d).select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("orders_rows"),
          count(when(col("c_custkey").isNull, lit(1)))
            .as("orders_orphans"))
      lo.crossJoin(oc)
        .withColumn("fk_lineitem_ok", col("lineitem_orphans") === 0L)
        .withColumn("fk_orders_ok", col("orders_orphans") === 0L)
    }),

    // ---- CUPED variance reduction on per-user event value ----
    "q263_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(expr("(min(ts) + max(ts)) div 2").as("__mid"))
      graft.operators.Eval.cuped(ev.crossJoin(broadcast(mid)), "user_id",
        col("ts") < col("__mid"), "value")
    }),

    // ---- schema evolution: two writer generations (the second adds a
    //      column), one mergeSchema read; missing values surface as
    //      NULLs and aggregates stay consistent ----
    "q259_schema_evolution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val out = s"${sys.props("java.io.tmpdir")}/graft_schevo_${math.abs(d.hashCode)}"
      // generation 1: original schema (no props); generation 2 adds it
      ev.where(pmod(col("event_id"), lit(2)) === 0)
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$out/g=1")
      ev.where(pmod(col("event_id"), lit(2)) === 1)
        .select("event_id", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$out/g=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("props")).as("n_with_props"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // ---- idempotent re-ingest: a replayed overlap batch collapses
    //      under event_id dedup, so counts equal the pristine source ----
    "q260_idempotent_ingest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val replayed = ev.unionByName(
        ev.where(pmod(col("event_id"), lit(3)) === 0)) // 1/3 re-delivered
      replayed.dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    }),

    // ---- calendar revenue rollup with month-over-month delta ----
    "q251_ship_calendar" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).as("yr"),
          month(col("l_shipdate")).as("mo"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
            2).as("revenue"))
      // bounded window: one row per calendar month
      val w = Window.orderBy("yr", "mo")
      base
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("mom_delta",
          round(col("revenue") - col("prev_revenue"), 2))
        .orderBy("yr", "mo")
    }),

    // ---- quantity-weighted price quantiles (inverse-CDF, exact) ----
    "q242_weighted_median" -> ((s, d) => {
      graft.operators.Percentiles.weightedQuantiles(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice",
          "l_quantity", Seq(0.5 -> "wp50", 0.9 -> "wp90"))
        .orderBy("l_returnflag")
    }),

    // ---- join-key skew audit on orders.o_custkey ----
    "q244_key_skew" -> ((s, d) => {
      graft.operators.Eval.keySkew(Tables.orders(s, d), "o_custkey")
        .orderBy("bucket")
    }),

    // ---- bucketed co-located fact⨝fact join (shuffle paid at write
    //      time; ScaleSpec pins the exchange-free plan) ----
    "q248_bucketed_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      graft.operators.Layout.bucketedCoLocatedJoin(o, l, "k", 8,
          s"graft_blj_${math.abs(d.hashCode)}")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("rev"), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // ---- deliberately Zipfian join key at bench scale: ~90% of
    //      lineitem rows collapse onto key 0; the auto probe must fire
    //      and the salted plan must still equal the plain join the
    //      oracle computes (ScaleSpec pins the probe decision) ----
    "q285_skewed_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d).select(
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(1000))).as("k"),
        col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val dim = s.range(0, 1000).select(col("id").as("k"),
        concat(lit("seg"), pmod(col("id"), lit(7)).cast("string")).as("segment"))
      graft.operators.Skew.saltedJoinAuto(l, dim, Seq("k"), "l_orderkey")
        .groupBy("segment")
        .agg(count(lit(1)).as("n"), round(sum("rev"), 2).as("revenue"))
        .orderBy("segment")
    }),

    // ---- CMS inner-product join-size estimate vs the exact equi-join
    //      cardinality: the sketch an optimizer consults before
    //      committing to a join strategy; never undercounts ----
    "q290_cms_join_size" -> ((s, d) => {
      graft.operators.Sketches.cmsJoinSize(
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey", depth = 4, width = 512)
    }),

    // ---- split-conformal coverage audit: OLS price ~ quantity on the
    //      md5 calibration half, conformal quantile of |residual|,
    //      ≥ 90% held-out coverage (integer cents keep the fit exact
    //      cross-engine) ----
    "q291_conformal" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      graft.operators.Eval.conformalAudit(li,
        concat(col("l_orderkey"), lit("-"), col("l_linenumber")),
        round(col("l_quantity")),
        round(col("l_extendedprice") * 100))
    }),

    "q51_percentiles" -> ((s, d) => {
      graft.operators.Percentiles.exact(
          ord(s, d), Seq("o_orderpriority"), "o_totalprice",
          Seq(0.5 -> "p50", 0.9 -> "p90"))
        .select(col("o_orderpriority"),
          round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"),
          col("n_values").as("n"))
        .orderBy("o_orderpriority")
    }),

    // ---- sketch percentiles, gated against their own rank contract ----
    // percentile_approx (GK sketch) per group; the *_ok flags assert the
    // sketch value sits within its guaranteed ±(n/accuracy) rank window
    // of the exact order statistics, so the gate pins the contract, not
    // a sketch-implementation-specific value
    "q51b_approx_percentiles" -> ((s, d) => {
      graft.operators.Percentiles.approxWithBounds(
          ord(s, d), Seq("o_orderpriority"), "o_totalprice",
          Seq(0.5 -> "p50", 0.9 -> "p90"))
        .select(col("o_orderpriority"),
          col("p50_ok"), col("p90_ok"),
          col("n_values").as("n"))
        .orderBy("o_orderpriority")
    }),

    // ---- cube (full grouping-set lattice) ----
    "q52_cube" -> ((s, d) => {
      li(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // ---- lead/lag window navigation ----
    "q53_lead_lag" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      ord(s, d)
        .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 2))
        .withColumn("next_price", round(lead("o_totalprice", 1).over(w), 2))
        .filter(col("o_custkey") < 50)
        .select("o_custkey", "o_orderkey", "prev_price", "next_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- rank-family windows beyond row_number/lead/lag:
    //      dense_rank / ntile / percent_rank / cume_dist ----
    "q90_window_ranks" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      ord(s, d).where(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- GROUPING SETS beyond rollup/cube: explicit set list ----
    "q86_grouping_sets" -> ((s, d) => {
      li(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    }),

    // ---- higher-order array functions (transform/filter/aggregate/
    //      zip_with) over the embedding vectors — the codegen'd
    //      array-math layer the similarity tier builds on ----
    "q87_array_hof" -> ((s, d) => {
      Tables.embeddings(s, d)
        .where(col("vec_id") < 20)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("_e"))
        .select(col("vec_id"),
          round(sqrt(aggregate(col("_e"), lit(0.0), (a, x) => a + x * x)), 4)
            .as("l2_norm"),
          size(filter(col("_e"), x => x > 0)).as("n_pos"),
          round(array_max(transform(col("_e"), x => abs(x))), 4).as("max_abs"),
          round(aggregate(zip_with(col("_e"), reverse(col("_e")), (a, b) => a * b),
            lit(0.0), (a, x) => a + x), 4).as("rev_dot"))
        .orderBy("vec_id")
    }),

    // ---- set operations: INTERSECT / EXCEPT (distinct semantics) ----
    "q77_set_ops" -> ((s, d) => {
      val o = ord(s, d)
      val y96 = o.where(year(col("o_orderdate")) === 1996).select("o_custkey")
      val y97 = o.where(year(col("o_orderdate")) === 1997).select("o_custkey")
      y96.intersect(y97).withColumn("tag", lit("both"))
        .unionAll(y96.except(y97).withColumn("tag", lit("only_1996")))
        .orderBy("tag", "o_custkey")
    }),

    // ---- Z-order (Morton) clustering value — the multi-dimension
    //      layout key (Layout.zorder sorts/writes by it; the pruning
    //      property is pinned in ScaleSpec) ----
    "q80_zorder" -> ((s, d) => {
      cust(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          graft.operators.Layout.zValue(
            pmod(col("c_custkey"), lit(256)),
            pmod(col("c_nationkey"), lit(256)), bits = 8).as("zval"))
        .where(col("c_custkey") < 200)
        .orderBy("zval", "c_custkey")
    }),

    // ---- §4.3 range-overlap join via the custom Catalyst operator
    //      (BroadcastIntervalJoinExec) — same oracle as the binned
    //      decomposition, different physical path ----
    "q55_range_join_exec" -> ((s, d) => {
      val points = ord(s, d).select(
        col("o_orderkey"),
        col("o_totalprice").as("pstart"),
        (col("o_totalprice") + 5000d).as("pend"))
      val ranges = Tables.supplier(s, d).select(
        col("s_suppkey"),
        (col("s_suppkey") * 40000d).as("rstart"),
        (col("s_suppkey") * 40000d + 60000d).as("rend"))
      RangeJoin.overlapExec(points, ranges, Seq.empty,
          "pstart", "pend", "rstart", "rend")
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("s_suppkey")
    }),

    // ---- §4.3 range-overlap join via binning decomposition ----
    "q26_range_overlap_join" -> ((s, d) => {
      val points = ord(s, d).select(
        col("o_orderkey"),
        col("o_totalprice").as("pstart"),
        (col("o_totalprice") + 5000d).as("pend"))
      val ranges = Tables.supplier(s, d).select(
        col("s_suppkey"),
        (col("s_suppkey") * 40000d).as("rstart"),
        (col("s_suppkey") * 40000d + 60000d).as("rend"))
      RangeJoin.overlap(points, ranges, Seq.empty,
          "pstart", "pend", "rstart", "rend", binWidth = 10000L)
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("s_suppkey")
    }))

  val oracle: Map[String, String] = Map(
    // the determinant expansions are rendered by the operator's own
    // ols2Det3Sql, so both engines run the same IEEE op sequence
    "q370_ols2" -> {
      import graft.operators.Eval.ols2Det3Sql
      val dd = ols2Det3Sql("nd", "sx1", "sx2", "sx1", "sx11", "sx12",
        "sx2", "sx12", "sx22")
      val d0 = ols2Det3Sql("sy", "sx1", "sx2", "sx1y", "sx11", "sx12",
        "sx2y", "sx12", "sx22")
      val d1 = ols2Det3Sql("nd", "sy", "sx2", "sx1", "sx1y", "sx12",
        "sx2", "sx2y", "sx22")
      val d2 = ols2Det3Sql("nd", "sx1", "sy", "sx1", "sx11", "sx1y",
        "sx2", "sx12", "sx2y")
      s"""WITH base AS (
            SELECT l_returnflag AS grp,
              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
              CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x1,
              CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
              AND l_discount IS NOT NULL),
          per AS (
            SELECT grp, count(*) AS n,
              CAST(sum(x1) AS BIGINT) AS sx1i,
              CAST(sum(x2) AS BIGINT) AS sx2i,
              CAST(sum(y) AS BIGINT) AS syi,
              sum(CAST(x1 AS HUGEINT) * x1) AS sx11h,
              sum(CAST(x1 AS HUGEINT) * x2) AS sx12h,
              sum(CAST(x2 AS HUGEINT) * x2) AS sx22h,
              sum(CAST(x1 AS HUGEINT) * y) AS sx1yh,
              sum(CAST(x2 AS HUGEINT) * y) AS sx2yh,
              sum(CAST(y AS HUGEINT) * y) AS syyh
            FROM base GROUP BY grp),
          dbl AS (
            SELECT grp, n, CAST(n AS DOUBLE) AS nd,
              CAST(sx1i AS DOUBLE) AS sx1, CAST(sx2i AS DOUBLE) AS sx2,
              CAST(syi AS DOUBLE) AS sy,
              CAST(sx11h AS DOUBLE) AS sx11,
              CAST(sx12h AS DOUBLE) AS sx12,
              CAST(sx22h AS DOUBLE) AS sx22,
              CAST(sx1yh AS DOUBLE) AS sx1y,
              CAST(sx2yh AS DOUBLE) AS sx2y,
              CAST(syyh AS DOUBLE) AS syy
            FROM per),
          dets AS (
            SELECT *, $dd AS dd, $d0 AS det0, $d1 AS det1, $d2 AS det2
            FROM dbl),
          betas AS (
            SELECT *, det0 / dd AS b0, det1 / dd AS b1, det2 / dd AS b2
            FROM dets),
          fin AS (
            SELECT grp, n, dd, b0, b1, b2,
              syy - (b0 * sy + b1 * sx1y + b2 * sx2y) AS sse,
              syy - sy * sy / nd AS sst
            FROM betas)
         SELECT grp AS "group", n,
           CASE WHEN dd <> 0 THEN CASE WHEN b0 >= 0
             THEN floor(b0 * 1e6 + 0.5) ELSE -floor(-b0 * 1e6 + 0.5) END
             / 1e6 + 0.0 END AS b0,
           CASE WHEN dd <> 0 THEN CASE WHEN b1 >= 0
             THEN floor(b1 * 1e6 + 0.5) ELSE -floor(-b1 * 1e6 + 0.5) END
             / 1e6 + 0.0 END AS b1,
           CASE WHEN dd <> 0 THEN CASE WHEN b2 >= 0
             THEN floor(b2 * 1e6 + 0.5) ELSE -floor(-b2 * 1e6 + 0.5) END
             / 1e6 + 0.0 END AS b2,
           CASE WHEN dd <> 0 AND sst > 0 THEN CASE WHEN 1 - sse / sst >= 0
             THEN floor((1 - sse / sst) * 1e6 + 0.5)
             ELSE -floor(-(1 - sse / sst) * 1e6 + 0.5) END
             / 1e6 + 0.0 END AS r2
         FROM fin ORDER BY grp"""
    },
    // stratum propensities are exact rationals ⇒ the weighted sums
    // reduce to integer algebra; per-stratum terms 1e-6-quantized
    "q398_ipw" ->
      """WITH base AS (
            SELECT l_linestatus AS st,
              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS t,
              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
            FROM lineitem WHERE l_extendedprice IS NOT NULL),
          per AS (
            SELECT st, count(*) AS n, CAST(sum(t) AS BIGINT) AS nt,
              CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT)
                AS yt,
              CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT)
                AS yc
            FROM base GROUP BY st),
          folded AS (
            SELECT
              CAST(sum(CASE WHEN nt > 0 AND nt < n THEN n ELSE 0 END)
                AS BIGINT) AS n,
              CAST(sum(CASE WHEN nt > 0 AND nt < n THEN nt ELSE 0 END)
                AS BIGINT) AS n_treated,
              CAST(sum(CASE WHEN NOT (nt > 0 AND nt < n) THEN 1
                ELSE 0 END) AS BIGINT) AS n_excluded_strata,
              CAST(sum(CASE WHEN nt > 0 AND nt < n THEN yt ELSE 0 END)
                AS BIGINT) AS syt,
              CAST(sum(CASE WHEN nt > 0 AND nt < n THEN yc ELSE 0 END)
                AS BIGINT) AS syc,
              CAST(sum(CASE WHEN nt > 0 AND nt < n THEN
                CASE WHEN CAST(yt AS DOUBLE) * n / nt >= 0 THEN
                  CAST(floor(CAST(yt AS DOUBLE) * n / nt * 1e6 + 0.5)
                    AS BIGINT)
                ELSE -CAST(floor(-(CAST(yt AS DOUBLE) * n / nt) * 1e6
                    + 0.5) AS BIGINT) END ELSE 0 END) AS BIGINT)
                AS wt6,
              CAST(sum(CASE WHEN nt > 0 AND nt < n THEN
                CASE WHEN CAST(yc AS DOUBLE) * n / (n - nt) >= 0 THEN
                  CAST(floor(CAST(yc AS DOUBLE) * n / (n - nt) * 1e6
                    + 0.5) AS BIGINT)
                ELSE -CAST(floor(-(CAST(yc AS DOUBLE) * n / (n - nt))
                    * 1e6 + 0.5) AS BIGINT) END ELSE 0 END) AS BIGINT)
                AS wc6
            FROM per)
         SELECT n, n_treated, n_excluded_strata,
           CASE WHEN n_treated > 0 AND n > n_treated THEN
             CASE WHEN CAST(syt AS DOUBLE) / n_treated
                 - CAST(syc AS DOUBLE) / (n - n_treated) >= 0 THEN
               floor((CAST(syt AS DOUBLE) / n_treated
                 - CAST(syc AS DOUBLE) / (n - n_treated)) * 1e6 + 0.5)
             ELSE -floor(-(CAST(syt AS DOUBLE) / n_treated
                 - CAST(syc AS DOUBLE) / (n - n_treated)) * 1e6 + 0.5)
             END / 1e6 + 0.0 END AS naive_diff,
           CASE WHEN n > 0 THEN
             CASE WHEN (CAST(wt6 AS DOUBLE) / 1e6
                 - CAST(wc6 AS DOUBLE) / 1e6) / n >= 0 THEN
               floor((CAST(wt6 AS DOUBLE) / 1e6
                 - CAST(wc6 AS DOUBLE) / 1e6) / n * 1e6 + 0.5)
             ELSE -floor(-((CAST(wt6 AS DOUBLE) / 1e6
                 - CAST(wc6 AS DOUBLE) / 1e6) / n) * 1e6 + 0.5)
             END / 1e6 + 0.0 END AS ipw_ate
         FROM folded""",
    // covariance signs from exact integer numerators (HUGEINT ↔
    // decimal(38,0)); the pooled row folds the same moments
    "q383_simpsons" ->
      """WITH base AS (
            SELECT l_returnflag AS st,
              CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x,
              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
            FROM lineitem
            WHERE l_discount IS NOT NULL
              AND l_extendedprice IS NOT NULL),
          per AS (
            SELECT st, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM base GROUP BY st),
          pooled AS (
            SELECT '__all' AS st, CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(sx) AS BIGINT) AS sx,
              CAST(sum(sy) AS BIGINT) AS sy,
              CAST(sum(sxy) AS HUGEINT) AS sxy,
              CAST(sum(sxx) AS HUGEINT) AS sxx,
              CAST(sum(syy) AS HUGEINT) AS syy
            FROM per),
          allr AS (SELECT * FROM per UNION ALL SELECT * FROM pooled),
          calc AS (
            SELECT st, n,
              CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                AS cov,
              CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                AS dx,
              CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
                AS dy
            FROM allr),
          scored AS (
            SELECT st AS stratum, n,
              CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END
                AS cov_sign,
              CASE WHEN dx > 0 AND dy > 0 THEN
                CASE WHEN CAST(cov AS DOUBLE) / (sqrt(CAST(dx AS
                    DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) >= 0 THEN
                  floor(CAST(cov AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE))
                    * sqrt(CAST(dy AS DOUBLE))) * 1e6 + 0.5)
                ELSE -floor(-(CAST(cov AS DOUBLE)
                    / (sqrt(CAST(dx AS DOUBLE))
                      * sqrt(CAST(dy AS DOUBLE)))) * 1e6 + 0.5)
                END / 1e6 + 0.0 END AS r
            FROM calc),
          ps AS (SELECT cov_sign AS p FROM scored
            WHERE stratum = '__all')
         SELECT stratum, n, cov_sign, r,
           (cov_sign <> 0 AND p <> 0 AND cov_sign <> p)
             AS reverses_pooled
         FROM scored, ps ORDER BY stratum""",
    // cumulative pos/neg over the 32-bucket grid; argmin by
    // (impurity-9-grid, threshold)
    "q371_best_split" ->
      """WITH base AS (
            SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                AS x,
              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS yy
            FROM lineitem WHERE l_extendedprice IS NOT NULL),
          mm AS (SELECT min(x) AS mn, max(x) AS mx FROM base),
          binned AS (
            SELECT ((x - mn) * 32) // (mx - mn + 1) AS b, x, yy
            FROM base, mm),
          per AS (
            SELECT b, count(*) AS c, CAST(sum(yy) AS BIGINT) AS p,
              max(x) AS thr
            FROM binned GROUP BY b),
          tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(p) AS BIGINT) AS np FROM per),
          cum AS (
            SELECT per.*,
              CAST(sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cl,
              CAST(sum(p) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS pl
            FROM per),
          calc AS (
            SELECT n, np, thr, cl, CAST(cl AS DOUBLE) AS nl,
              CAST(n AS DOUBLE) - CAST(cl AS DOUBLE) AS nr,
              CAST(pl AS DOUBLE) AS pld,
              CAST(np AS DOUBLE) - CAST(pl AS DOUBLE) AS prd
            FROM cum, tot WHERE cl < n),
          gcalc AS (
            SELECT *,
              1 - (pld / nl) * (pld / nl)
                - ((nl - pld) / nl) * ((nl - pld) / nl) AS gl,
              1 - (prd / nr) * (prd / nr)
                - ((nr - prd) / nr) * ((nr - prd) / nr) AS gr
            FROM calc),
          scored AS (
            SELECT n, np, thr, cl,
              CAST(floor((nl / CAST(n AS DOUBLE) * gl
                + nr / CAST(n AS DOUBLE) * gr) * 1e9 + 0.5) AS BIGINT)
                AS w9
            FROM gcalc),
          best AS (SELECT * FROM scored ORDER BY w9, thr LIMIT 1)
         SELECT n, np AS n_pos, thr AS best_threshold, cl AS n_left,
           floor((1 - (CAST(np AS DOUBLE) / n) * (CAST(np AS DOUBLE) / n)
             - ((CAST(n AS DOUBLE) - np) / n)
               * ((CAST(n AS DOUBLE) - np) / n)) * 1e6 + 0.5) / 1e6
             AS gini_root,
           floor(CAST(w9 AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6
             AS gini_split,
           floor(((1 - (CAST(np AS DOUBLE) / n) * (CAST(np AS DOUBLE) / n)
             - ((CAST(n AS DOUBLE) - np) / n)
               * ((CAST(n AS DOUBLE) - np) / n))
             - CAST(w9 AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS gain
         FROM best""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-06-30'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_eq" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         WHERE p_brand = 'Brand#13' ORDER BY p_partkey""",
    "q03_filter_range" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         WHERE l_quantity >= 45 AND l_quantity <= 50 AND l_discount < 0.02
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q04_filter_in" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_join_revenue_by_nation" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q06_left_join_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         WHERE o_orderkey IS NULL
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q07_semi_join_big_orders" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q08_anti_join_quiet_customers" ->
      """SELECT c_mktsegment, count(*) AS n_customers
         FROM customer
         WHERE NOT EXISTS (
           SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 250000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q09_cross_join" ->
      """SELECT r_name, n_name
         FROM (SELECT * FROM region WHERE r_regionkey <= 2) r
         CROSS JOIN (SELECT * FROM nation WHERE n_nationkey <= 5) n
         ORDER BY r_name, n_name""",
    "q10_union_entities" ->
      """SELECT nationkey, count(*) AS n_entities, count(DISTINCT kind) AS n_kinds
         FROM (
           SELECT CAST(c_nationkey AS INTEGER) AS nationkey, 'customer' AS kind FROM customer
           UNION ALL
           SELECT CAST(s_nationkey AS INTEGER) AS nationkey, 'supplier' AS kind FROM supplier)
         GROUP BY nationkey ORDER BY nationkey""",
    "q11_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q12_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q13_window_latest_order" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",
    "q14_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q15_agg_stats" ->
      """SELECT l_returnflag,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(stddev_samp(l_extendedprice), 2) AS sd_price,
         count(DISTINCT l_partkey) AS n_parts
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q16_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q17_pivot_returnflag" ->
      """SELECT l_linestatus,
         round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
         round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
         round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q18_unpivot_measures" ->
      """SELECT measure, total FROM (
           SELECT 'qty' AS measure, round(sum(l_quantity), 2) AS total FROM lineitem
           UNION ALL
           SELECT 'price', round(sum(l_extendedprice), 2) FROM lineitem
           UNION ALL
           SELECT 'discount', round(sum(l_discount), 2) FROM lineitem
           UNION ALL
           SELECT 'tax', round(sum(l_tax), 2) FROM lineitem)
         ORDER BY measure""",
    "q19_price_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
         count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1 ORDER BY bin""",
    // identity: the round-tripped CSV must reproduce the source table
    "q209_csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""",
    // identity: the round-tripped JSON lines must reproduce the source
    "q227_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""",
    // identity: the ORC round-trip must reproduce the source exactly
    "q297_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""",
    // full reproduction: same dirty derivation (md5-parity case folds,
    // last-digit corruption, truncation), same blocks, same weights
    "q300_record_linkage" ->
      """WITH dirty AS (
            SELECT c_custkey AS dirty_id,
              CASE WHEN ('0x' || substr(md5('rl:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 3 = 0
                THEN upper(c_name) ELSE c_name END AS d_name,
              CASE WHEN ('0x' || substr(md5('rb:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 5 = 0
                THEN c_acctbal + 100.25 ELSE c_acctbal END AS d_bal,
              c_nationkey, c_mktsegment
            FROM customer),
          pairs AS (
            SELECT l.c_custkey, r.dirty_id,
              levenshtein(lower(l.c_name), lower(r.d_name)) <= 2 AS agree_name,
              l.c_name = r.d_name AS agree_name_exact,
              abs(l.c_acctbal - r.d_bal) <= 1.0 AS agree_balance
            FROM customer l JOIN dirty r
              ON l.c_nationkey = r.c_nationkey
             AND l.c_mktsegment = r.c_mktsegment),
          scored AS (
            SELECT *,
              round((CASE WHEN agree_name THEN 6.0 ELSE -3.0 END
                  + CASE WHEN agree_name_exact THEN 4.0 ELSE -1.0 END
                  + CASE WHEN agree_balance THEN 5.0 ELSE -2.0 END)::DOUBLE, 4)
                AS score
            FROM pairs)
         SELECT c_custkey, dirty_id, agree_name, agree_name_exact,
           agree_balance, score,
           CASE WHEN score >= 10.0 THEN 'link'
                WHEN score > 0.0 THEN 'possible'
                ELSE 'non_link' END AS verdict
         FROM scored
         WHERE NOT (score <= 0.0)
         ORDER BY c_custkey, dirty_id""",
    // the q300 chain + two mutual-best row_number windows
    "q306_linkage_one_to_one" ->
      """WITH dirty AS (
            SELECT c_custkey AS dirty_id,
              CASE WHEN ('0x' || substr(md5('rl:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 3 = 0
                THEN upper(c_name) ELSE c_name END AS d_name,
              CASE WHEN ('0x' || substr(md5('rb:' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 5 = 0
                THEN c_acctbal + 100.25 ELSE c_acctbal END AS d_bal,
              c_nationkey, c_mktsegment
            FROM customer),
          pairs AS (
            SELECT l.c_custkey, r.dirty_id,
              levenshtein(lower(l.c_name), lower(r.d_name)) <= 2 AS agree_name,
              l.c_name = r.d_name AS agree_name_exact,
              abs(l.c_acctbal - r.d_bal) <= 1.0 AS agree_balance
            FROM customer l JOIN dirty r
              ON l.c_nationkey = r.c_nationkey
             AND l.c_mktsegment = r.c_mktsegment),
          scored AS (
            SELECT c_custkey, dirty_id,
              round((CASE WHEN agree_name THEN 6.0 ELSE -3.0 END
                  + CASE WHEN agree_name_exact THEN 4.0 ELSE -1.0 END
                  + CASE WHEN agree_balance THEN 5.0 ELSE -2.0 END)::DOUBLE, 4)
                AS score
            FROM pairs),
          kept AS (SELECT * FROM scored WHERE NOT (score <= 0.0)),
          rk AS (
            SELECT *,
              row_number() OVER (PARTITION BY c_custkey
                ORDER BY score DESC, dirty_id) AS rl,
              row_number() OVER (PARTITION BY dirty_id
                ORDER BY score DESC, c_custkey) AS rr
            FROM kept)
         SELECT c_custkey, dirty_id, score FROM rk
         WHERE rl = 1 AND rr = 1
         ORDER BY c_custkey""",
    // exact EM replay: integer micro-weights, 12dp/clamp per step
    "q310_linkage_em" -> linkageEmSql(10),
    // Laplace-smoothed WOE/IV: identical division structure per side
    "q312_woe_encoding" ->
      """WITH per AS (
            SELECT event_type AS category,
              count(*) FILTER (WHERE NOT (value > 50)) AS n0,
              count(*) FILTER (WHERE value > 50) AS n1
            FROM events GROUP BY 1),
          tot AS (
            SELECT CAST(sum(n0) AS BIGINT) AS t0,
              CAST(sum(n1) AS BIGINT) AS t1, count(*) AS k
            FROM per)
         SELECT category, n0, n1,
           round(ln(((n1 + CAST(0.5 AS DOUBLE)) / (t1 + k * CAST(0.5 AS DOUBLE)))
               / ((n0 + CAST(0.5 AS DOUBLE)) / (t0 + k * CAST(0.5 AS DOUBLE)))), 6) AS woe,
           round((((n1 + CAST(0.5 AS DOUBLE)) / (t1 + k * CAST(0.5 AS DOUBLE)))
               - ((n0 + CAST(0.5 AS DOUBLE)) / (t0 + k * CAST(0.5 AS DOUBLE))))
             * ln(((n1 + CAST(0.5 AS DOUBLE)) / (t1 + k * CAST(0.5 AS DOUBLE)))
               / ((n0 + CAST(0.5 AS DOUBLE)) / (t0 + k * CAST(0.5 AS DOUBLE)))), 6)
             AS iv_term
         FROM per CROSS JOIN tot
         ORDER BY category""",
    // NULL-padded by-name union
    "q332_union_by_name" ->
      """SELECT * FROM (
           SELECT c_custkey, c_name, c_acctbal, 'a' AS src
           FROM customer WHERE c_custkey % 7 = 0
           UNION ALL BY NAME
           SELECT c_custkey, c_mktsegment, 'b' AS src
           FROM customer WHERE c_custkey % 11 = 0)
         ORDER BY c_custkey, src""",
    // bag-semantics multiplicities
    "q329_set_ops_all" ->
      """WITH y96 AS (SELECT o_custkey FROM orders
            WHERE year(o_orderdate) = 1996),
          y97 AS (SELECT o_custkey FROM orders
            WHERE year(o_orderdate) = 1997),
          u AS (
            SELECT 'both' AS tag, o_custkey FROM (
              SELECT o_custkey FROM y96
              INTERSECT ALL
              SELECT o_custkey FROM y97)
            UNION ALL
            SELECT 'only_1996' AS tag, o_custkey FROM (
              SELECT o_custkey FROM y96
              EXCEPT ALL
              SELECT o_custkey FROM y97))
         SELECT tag, o_custkey, count(*) AS multiplicity
         FROM u GROUP BY tag, o_custkey
         ORDER BY tag, o_custkey""",
    // Luby MIS unrolled 8 rounds (winners disjoint per round)
    "q330_mis" -> misSql(8),
    // pinned PERMISSIVE semantics: bad-type, under-length and
    // over-length rows all corrupt; clean qty = 10+30+60
    "q325_csv_corrupt_audit" ->
      """SELECT CAST(6 AS BIGINT) AS n_rows, CAST(3 AS BIGINT) AS n_corrupt,
            CAST(100 AS BIGINT) AS qty_clean_sum,
            CAST(3 AS BIGINT) AS n_clean""",
    // BH step-up replay: rank window + bottom-up running-min q-values
    "q326_fdr_bh" ->
      """WITH t AS (
            SELECT c_custkey AS id,
              ((('0x' || substr(md5('bh:' || CAST(c_custkey AS VARCHAR)),
                  1, 15))::BIGINT % 1000000 + 0.5) / 1000000.0) AS u
            FROM customer),
          t2 AS (SELECT id, u * u * u AS p FROM t),
          mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM t2),
          r AS (SELECT id, p,
              CAST(row_number() OVER (ORDER BY p, id) AS INTEGER) AS rank
            FROM t2),
          r2 AS (SELECT id, p, rank,
              min(CAST(m.m AS DOUBLE) * p / rank) OVER (
                ORDER BY rank DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS qraw,
              p <= rank * 0.05 / m.m AS pass
            FROM r, mm m),
          cut AS (SELECT coalesce(max(CASE WHEN pass THEN rank END), 0)
              AS c FROM r2)
         SELECT id AS c_custkey, p, rank,
           floor(least(qraw, 1.0) * 1e6 + 0.5) / 1e6 AS q_value,
           rank <= cut.c AS significant
         FROM r2, cut ORDER BY rank""",
    // running MAX of identical doubles over ascending ranks —
    // order-free, so the step-down replays exactly
    "q423_holm" ->
      """WITH t AS (
            SELECT c_custkey AS id,
              ((('0x' || substr(md5('bh:' || CAST(c_custkey AS VARCHAR)),
                  1, 15))::BIGINT % 1000000 + 0.5) / 1000000.0) AS u
            FROM customer),
          t2 AS (SELECT id, u * u * u AS p FROM t),
          mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM t2),
          r AS (SELECT id, p,
              CAST(row_number() OVER (ORDER BY p, id) AS INTEGER) AS rank
            FROM t2),
          r2 AS (SELECT id, p, rank,
              max(least(CAST(m.m - rank + 1 AS DOUBLE) * p, 1.0)) OVER (
                ORDER BY rank ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS hraw
            FROM r, mm m)
         SELECT id AS c_custkey, p, rank,
           floor(hraw * 1e6 + 0.5) / 1e6 AS p_holm,
           hraw <= 0.05 AS significant
         FROM r2 ORDER BY rank""",
    // RR/PC from block stats; truth = custkey identity
    "q321_blocking_quality" ->
      """WITH dirty AS (
            SELECT c_custkey AS dirty_id, c_nationkey, c_mktsegment
            FROM customer),
          ls AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS nl
            FROM customer GROUP BY 1, 2),
          rs AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS nr
            FROM dirty GROUP BY 1, 2),
          cand AS (
            SELECT CAST(coalesce(sum(nl * nr), 0) AS BIGINT)
              AS n_candidates
            FROM ls JOIN rs USING (c_nationkey, c_mktsegment)),
          sides AS (
            SELECT (SELECT count(*) FROM customer) AS n_left,
              (SELECT count(*) FROM dirty) AS n_right),
          tr AS (
            SELECT count(*) AS n_true,
              CAST(coalesce(sum(CASE WHEN l.c_nationkey IS NOT DISTINCT
                  FROM r.c_nationkey AND l.c_mktsegment IS NOT DISTINCT
                  FROM r.c_mktsegment THEN 1 ELSE 0 END), 0) AS BIGINT)
                AS n_retained
            FROM customer l JOIN dirty r ON l.c_custkey = r.dirty_id)
         SELECT n_left, n_right, n_candidates,
           round(1 - CAST(n_candidates AS DOUBLE)
             / (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)), 6)
             AS reduction_ratio,
           n_true, n_retained,
           CASE WHEN n_true > 0 THEN
             round(CAST(n_retained AS DOUBLE) / n_true, 6) END
             AS pair_completeness
         FROM sides, cand, tr""",
    // ordered-EMD t-closeness: integer cumulative differences
    // cnt·N − g·class_n, one division at the end
    "q317_t_closeness" ->
      """WITH rws AS (
            SELECT c_mktsegment, c_nationkey,
              CAST(floor(c_acctbal / 2000) AS BIGINT) AS v
            FROM customer WHERE c_acctbal IS NOT NULL),
          cells AS (
            SELECT c_mktsegment, c_nationkey, v, count(*) AS cnt
            FROM rws GROUP BY 1, 2, 3),
          classes AS (
            SELECT c_mktsegment, c_nationkey, count(*) AS class_n
            FROM rws GROUP BY 1, 2),
          vals AS (SELECT v, count(*) AS g FROM rws GROUP BY v),
          tot AS (
            SELECT CAST(sum(g) AS BIGINT) AS N,
              CAST(count(*) AS BIGINT) AS m FROM vals),
          grid AS (
            SELECT c.c_mktsegment, c.c_nationkey, c.class_n, va.v,
              (coalesce(ce.cnt, 0) * t.N - va.g * c.class_n) AS diff,
              t.m, t.N
            FROM classes c CROSS JOIN vals va CROSS JOIN tot t
            LEFT JOIN cells ce ON ce.c_mktsegment = c.c_mktsegment
              AND ce.c_nationkey = c.c_nationkey AND ce.v = va.v),
          cum AS (
            SELECT c_mktsegment, c_nationkey, class_n, m, N,
              CAST(sum(diff) OVER (
                PARTITION BY c_mktsegment, c_nationkey
                ORDER BY v) AS BIGINT) AS cumv
            FROM grid),
          agg AS (
            SELECT c_mktsegment, c_nationkey, class_n,
              CASE WHEN m > 1 THEN
                round(CAST(CAST(sum(abs(cumv)) AS BIGINT) AS DOUBLE)
                  / (CAST(class_n AS DOUBLE) * CAST(N AS DOUBLE)
                    * CAST(m - 1 AS DOUBLE)), 6)
                ELSE CAST(0 AS DOUBLE) END AS t_closeness
            FROM cum GROUP BY c_mktsegment, c_nationkey, class_n, m, N)
         SELECT c_mktsegment, c_nationkey, class_n, t_closeness,
           t_closeness > 0.3 AS violating
         FROM agg ORDER BY c_mktsegment, c_nationkey""",
    // clipped-Laplace DP sums: md5-seeded inverse CDF, Δ/ε = 200
    "q313_dp_noisy_sums" ->
      """WITH per AS (
            SELECT event_type, count(*) AS n,
              sum(least(greatest(value, CAST(0 AS DOUBLE)),
                CAST(100 AS DOUBLE))) AS s,
              ('0x' || substr(md5('3:' || event_type), 1, 15))::BIGINT
                % 1000000 AS m
            FROM events GROUP BY event_type),
          lap AS (
            SELECT event_type, n, s,
              CAST(-200 AS DOUBLE)
                * CAST(sign((CAST(m AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / CAST(1000000 AS DOUBLE) - CAST(0.5 AS DOUBLE)) AS DOUBLE)
                * ln(1 - 2 * abs((CAST(m AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / CAST(1000000 AS DOUBLE) - CAST(0.5 AS DOUBLE)))
                AS noise_raw
            FROM per)
         SELECT event_type, n, round(s, 4) AS clipped_sum,
           round(noise_raw, 4) AS noise,
           round(s + noise_raw, 4) AS noisy_sum
         FROM lap ORDER BY event_type""",
    // MERGE replay: latest change per key (seq desc, op desc), D
    // deletes, U/I replace-or-insert, untouched base rows pass
    "q307_cdc_apply" ->
      """WITH h AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
              ('0x' || substr(md5('cdc:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
            FROM orders),
          wave1 AS (
            SELECT o_orderkey, CAST(1 AS BIGINT) AS seq,
              CASE WHEN hv % 3 = 0 THEN 'D' ELSE 'U' END AS op,
              'X' AS o_orderstatus,
              round(o_totalprice + 1000, 2) AS o_totalprice
            FROM h WHERE hv % 10 = 0),
          wave2 AS (
            SELECT o_orderkey, CAST(2 AS BIGINT) AS seq, 'U' AS op,
              'Y' AS o_orderstatus,
              round(o_totalprice + 2000, 2) AS o_totalprice
            FROM h WHERE hv % 20 = 0),
          ins AS (
            SELECT o_orderkey + 100000000 AS o_orderkey,
              CAST(1 AS BIGINT) AS seq, 'I' AS op,
              'N' AS o_orderstatus, CAST(1.5 AS DOUBLE) AS o_totalprice
            FROM h WHERE hv % 17 = 0),
          changes AS (
            SELECT * FROM wave1 UNION ALL
            SELECT * FROM wave2 UNION ALL
            SELECT * FROM ins),
          latest AS (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
              ORDER BY seq DESC, op DESC) AS rn
            FROM changes),
          l1 AS (SELECT * FROM latest WHERE rn = 1),
          merged AS (
            SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
            FROM orders b
            WHERE NOT EXISTS (
              SELECT 1 FROM l1 WHERE l1.o_orderkey = b.o_orderkey)
            UNION ALL
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM l1 WHERE op <> 'D')
         SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key
         FROM merged GROUP BY o_orderstatus
         ORDER BY o_orderstatus""",
    // the pruned-partition read must equal a plain filtered aggregate
    "q298_partition_prune" ->
      """SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS sum_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    // leading digit from the exact cents integer's decimal string
    // (never float formatting); expected p via ln ratios exactly as
    // the Spark side computes log(10, ·)
    "q182_benford" ->
      """WITH d AS (
            SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
              AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM lineitem),
          c AS (SELECT digit, count(*) AS n FROM d WHERE digit >= 1 GROUP BY 1),
          t AS (SELECT sum(n)::DOUBLE AS tot FROM c),
          w AS (
            SELECT digit, n, n / t.tot AS obs_p,
              ln(1.0 + 1.0 / digit) / ln(10.0) AS exp_p, t.tot
            FROM c CROSS JOIN t),
          x AS (
            SELECT sum(pow(n - tot * exp_p, 2) / (tot * exp_p)) AS chi2 FROM w)
         SELECT digit, CAST(n AS BIGINT) AS n, round(obs_p, 6) AS obs_p,
           round(exp_p, 6) AS exp_p, round(x.chi2, 6) AS chi2
         FROM w CROSS JOIN x ORDER BY digit""",
    "q20_string_funcs" ->
      """SELECT p_partkey,
         upper(p_brand) AS brand_u,
         lower(p_type) AS type_l,
         concat_ws('-', p_brand, p_type) AS brand_type,
         regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
         substr(p_name, 1, 5) AS name_pfx,
         length(p_name) AS name_len
         FROM part ORDER BY p_partkey""",
    "q21_gt2snp_recode" ->
      """SELECT gt_raw,
         CAST(CASE
           WHEN regexp_matches(gt_raw, '0/\.|\./0|0/0|0\|0|^0$') THEN 0.0
           WHEN regexp_matches(gt_raw, '0/1|1/0|0\|1|1\|0|\./1|1/\.|\.\|1|1\|\.|^1$') THEN 1.0
           WHEN regexp_matches(gt_raw, '1/1|1\|1') THEN 2.0
           ELSE -1.0
         END AS DOUBLE) AS dosage,
         count(*) AS n
         FROM (
           SELECT (['0/0','0|0','0/1','1|0','1/1','1|1','./.','./1'])
                  [CAST((l_orderkey * 10 + l_linenumber) % 8 AS INTEGER) + 1] AS gt_raw
           FROM lineitem)
         GROUP BY gt_raw, dosage ORDER BY gt_raw""",
    "q22_null_handling" ->
      """SELECT coalesce(status_or_null, 'PENDING') AS status_filled,
         count(*) AS n, count(status_or_null) AS n_nonnull
         FROM (SELECT nullif(o_orderstatus, 'P') AS status_or_null FROM orders)
         GROUP BY 1 ORDER BY status_filled""",
    "q23_casts" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS INTEGER) AS qty_int,
         CAST(l_orderkey AS VARCHAR) AS okey_str,
         CAST(l_shipdate AS DATE) AS ship_date,
         CAST(round(l_tax * 100, 0) AS INTEGER) AS tax_pct
         FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""",
    "q24_stratified_sample" ->
      """SELECT o_orderpriority, rn, o_orderkey
         FROM (SELECT o_orderpriority, o_orderkey,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC, o_orderkey ASC) AS rn
               FROM orders)
         WHERE rn <= 5 ORDER BY o_orderpriority, rn""",
    "q25_collect_sorted" ->
      """SELECT l_returnflag,
         string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // running weight in price order; a tie block shares one value, so
    // intra-tie window order cannot change the picked quantile
    "q242_weighted_median" ->
      """WITH c AS (
           SELECT l_returnflag AS k, l_extendedprice AS v,
             sum(l_quantity) OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
           FROM lineitem)
        SELECT k AS l_returnflag, min(tw) AS w_total,
          min(CASE WHEN cw >= 0.5 * tw THEN v END) AS wp50,
          min(CASE WHEN cw >= 0.9 * tw THEN v END) AS wp90
        FROM c GROUP BY k ORDER BY l_returnflag""",
    // identical two-stage rounding: revenue rounds at 2dp, the share
    // divides the rounded values
    "q254_market_share" ->
      """WITH rev AS (
           SELECT r_name, year(o_orderdate) AS yr, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2, 3)
        SELECT r_name, yr, n_name, revenue,
          round(revenue / sum(revenue) OVER (PARTITION BY r_name, yr), 6)
            AS share
        FROM rev ORDER BY r_name, yr, n_name""",
    // the same correlated scalar subquery, same decorrelation target
    "q255_above_avg" ->
      """WITH spend AS (
           SELECT o_custkey, sum(o_totalprice) AS sp
           FROM orders GROUP BY o_custkey),
         cs AS (
           SELECT c_custkey, c_nationkey, sp
           FROM customer JOIN spend ON c_custkey = o_custkey)
        SELECT cs.c_custkey, n_name, round(sp, 2) AS spend
        FROM cs JOIN nation ON n_nationkey = c_nationkey
        WHERE sp > (SELECT avg(sp) FROM cs cs2
                    WHERE cs2.c_nationkey = cs.c_nationkey)
        ORDER BY n_name, c_custkey""",
    // the whole point: the incremental merge must equal the full
    // recompute, so the FULL aggregate is the oracle
    "q256_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",
    // orphan counts via left joins; TPC-H data satisfies both FKs
    "q261_fk_audit" ->
      """WITH lo AS (
           SELECT CAST(count(*) AS BIGINT) AS lineitem_rows,
             CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END)
               AS BIGINT) AS lineitem_orphans
           FROM lineitem l LEFT JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
         oc AS (
           SELECT CAST(count(*) AS BIGINT) AS orders_rows,
             CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
               AS BIGINT) AS orders_orphans
           FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey)
        SELECT lineitem_rows, lineitem_orphans, orders_rows, orders_orphans,
          lineitem_orphans = 0 AS fk_lineitem_ok,
          orders_orphans = 0 AS fk_orders_ok
        FROM lo CROSS JOIN oc""",
    // per-user pre/post sums → the zipf-fit 5-sum shape; θ and the
    // variance reduction (= corr²) from the identical ratios
    "q263_cuped" ->
      """WITH m AS (
           SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS mid
           FROM events),
         per AS (
           SELECT user_id,
             coalesce(sum(CASE WHEN epoch_ns(ts) < m.mid
               THEN CAST(value AS DOUBLE) END), 0.0) AS x,
             coalesce(sum(CASE WHEN NOT (epoch_ns(ts) < m.mid)
               THEN CAST(value AS DOUBLE) END), 0.0) AS y
           FROM events CROSS JOIN m GROUP BY user_id),
         a AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM per)
        SELECT n AS n_units,
          round(CASE WHEN n * sxx - sx * sx > 0
            THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
            ELSE 0.0 END, 6) AS theta,
          round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
              / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            ELSE 0.0 END, 6) AS var_reduction,
          round(sy / n, 6) AS mean_metric
        FROM a""",
    // the merged read must see generation-1 rows with NULL props and
    // generation-2 rows intact — equal to this direct computation
    "q259_schema_evolution" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN event_id % 2 = 1 THEN props END) AS BIGINT)
             AS n_with_props,
           round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",
    // replayed duplicates are exact copies, so dedup restores the
    // pristine source
    "q260_idempotent_ingest" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1 ORDER BY 1""",
    // month grain rollup; the MoM delta subtracts the ROUNDED revenues
    "q251_ship_calendar" ->
      """WITH m AS (
           SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mo,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem GROUP BY 1, 2)
        SELECT yr, mo, n, revenue,
          lag(revenue) OVER (ORDER BY yr, mo) AS prev_revenue,
          round(revenue - lag(revenue) OVER (ORDER BY yr, mo), 2)
            AS mom_delta
        FROM m ORDER BY yr, mo""",
    // layout cannot change join semantics: the bucketed tables hold the
    // same rows, so the plain join is the oracle
    "q248_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",
    // salting cannot change join semantics: the plain join over the
    // same derived Zipfian key is the oracle
    "q285_skewed_join" ->
      """WITH l AS (
           SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
                  ELSE l_orderkey % 1000 END AS k,
             l_extendedprice * (1 - l_discount) AS rev
           FROM lineitem),
         dim AS (
           SELECT i AS k, 'seg' || CAST(i % 7 AS VARCHAR) AS segment
           FROM range(0, 1000) t(i))
         SELECT segment, CAST(count(*) AS BIGINT) AS n,
           round(sum(rev), 2) AS revenue
         FROM l JOIN dim USING (k)
         GROUP BY segment ORDER BY segment""",
    // two depth×width CMS cell tables (md5 salted by depth), row-wise
    // inner product, min over depths; exact from the per-key count join
    "q290_cms_join_size" ->
      """WITH depths AS (SELECT unnest(range(0, 4)) AS d),
          ac AS (
            SELECT d, ('0x' || substr(md5(CAST(d AS VARCHAR) || ':'
                || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT % 512 AS w,
              count(*) AS c_a
            FROM orders CROSS JOIN depths GROUP BY 1, 2),
          bc AS (
            SELECT d, ('0x' || substr(md5(CAST(d AS VARCHAR) || ':'
                || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 512 AS w,
              count(*) AS c_b
            FROM customer CROSS JOIN depths GROUP BY 1, 2),
          est AS (
            SELECT CAST(min(s) AS BIGINT) AS est_size FROM (
              SELECT d, sum(c_a * c_b) AS s
              FROM ac JOIN bc USING (d, w) GROUP BY d)),
          ex AS (
            SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS exact_size
            FROM (SELECT o_custkey AS k, count(*) AS na
                  FROM orders GROUP BY 1) a
            JOIN (SELECT c_custkey AS k, count(*) AS nb
                  FROM customer GROUP BY 1) b USING (k))
         SELECT exact_size, est_size,
           CASE WHEN exact_size > 0 THEN
             round((est_size - exact_size) / CAST(exact_size AS DOUBLE), 6)
           END AS rel_err,
           est_size >= exact_size AS never_under
         FROM ex CROSS JOIN est""",
    // OLS on the md5 calibration half (integer-valued cents/counts ⇒
    // exact sums), conformal quantile = rank-⌈(n+1)·0.9⌉ |residual|,
    // coverage on the held-out half
    "q291_conformal" ->
      """WITH base AS (
            SELECT ('0x' || substr(md5('11:' || CAST(l_orderkey AS VARCHAR)
                || '-' || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
                % 2 = 0 AS is_cal,
              CAST(round(l_quantity) AS DOUBLE) AS x,
              CAST(round(l_extendedprice * 100) AS DOUBLE) AS y
            FROM lineitem),
          f AS (
            SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
              sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM base WHERE is_cal),
          co AS (
            SELECT n, slope, (sy - slope * sx) / n AS itc FROM (
              SELECT n, sx, sy,
                (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
              FROM f)),
          scored AS (
            SELECT is_cal, abs(y - (slope * x + itc)) AS s
            FROM base CROSS JOIN co),
          cal AS (
            SELECT s, row_number() OVER (ORDER BY s) AS rn
            FROM scored WHERE is_cal),
          q AS (
            SELECT min(s) AS qhat FROM cal CROSS JOIN co
            WHERE rn = least(ceil((n + 1) * 0.9), n)),
          t AS (
            SELECT count(*) AS n_test,
              CAST(sum(CASE WHEN s <= qhat THEN 1 ELSE 0 END) AS BIGINT)
                AS covered
            FROM scored CROSS JOIN q WHERE NOT is_cal)
         SELECT CAST(n AS BIGINT) AS n_cal, n_test,
           round(qhat, 6) AS qhat,
           round(CAST(covered AS DOUBLE) / n_test, 6) AS coverage,
           abs(round(CAST(covered AS DOUBLE) / n_test, 6) - 0.9) <= 0.02 AS ok
         FROM co CROSS JOIN q CROSS JOIN t""",
    // per-key counts → power-of-two histogram; the 1e-9 epsilon absorbs
    // the libm ulp of ln(f)/ln 2 at exact powers of two
    "q244_key_skew" ->
      """WITH f AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS f
           FROM orders GROUP BY 1),
         h AS (
           SELECT CAST(floor(ln(CAST(f AS DOUBLE)) / ln(2.0) + 1e-9)
               AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(f) AS BIGINT) AS n_rows
           FROM f GROUP BY 1),
         g AS (
           SELECT CAST(max(f) AS BIGINT) AS max_freq,
             CAST(sum(f) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS nk
           FROM f)
        SELECT bucket, CAST(1 AS BIGINT) << bucket AS freq_lo,
          n_keys, n_rows,
          round(CAST(n_rows AS DOUBLE) / tot, 6) AS row_share,
          max_freq,
          round(CAST(max_freq AS DOUBLE) * nk / tot, 4) AS skew
        FROM h CROSS JOIN g ORDER BY bucket""",
    "q51_percentiles" ->
      """SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
         count(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q51b_approx_percentiles" ->
      """SELECT o_orderpriority,
         true AS p50_ok, true AS p90_ok, count(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q52_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q53_lead_lag" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey,
             round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             round(lead(o_totalprice, 1) OVER w, 2) AS next_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC))
         WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey""",
    "q90_window_ranks" ->
      """SELECT o_custkey, o_orderkey,
           dense_rank() OVER w AS drank,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
         FROM orders WHERE o_custkey < 30
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q86_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY returnflag, linestatus""",
    "q87_array_hof" ->
      """SELECT vec_id,
           round(sqrt(list_sum(list_transform(e, x -> x * x))), 4) AS l2_norm,
           len(list_filter(e, x -> x > 0)) AS n_pos,
           round(list_max(list_transform(e, x -> abs(x))), 4) AS max_abs,
           round(list_sum(list_transform(range(1, len(e) + 1),
             i -> e[i] * e[len(e) - i + 1])), 4) AS rev_dot
         FROM (SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE) AS e
           FROM embeddings WHERE vec_id < 20)
         ORDER BY vec_id""",
    "q77_set_ops" ->
      """SELECT o_custkey, 'both' AS tag FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
         UNION ALL
         SELECT o_custkey, 'only_1996' AS tag FROM (
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            EXCEPT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
         ORDER BY tag, o_custkey""",
    "q80_zorder" ->
      s"""SELECT c_custkey, c_nationkey,
           ${graft.operators.Layout.zValueSql("c_custkey % 256", "c_nationkey % 256", 8)} AS zval
         FROM customer WHERE c_custkey < 200 ORDER BY zval, c_custkey""",
    "q55_range_join_exec" ->
      """SELECT s_suppkey, count(*) AS n_orders
         FROM (SELECT o_orderkey, o_totalprice AS pstart, o_totalprice + 5000 AS pend
               FROM orders) p
         JOIN (SELECT s_suppkey, s_suppkey * 40000.0 AS rstart,
                      s_suppkey * 40000.0 + 60000 AS rend
               FROM supplier) r
           ON p.pstart <= r.rend AND p.pend >= r.rstart
         GROUP BY s_suppkey ORDER BY s_suppkey""",
    "q26_range_overlap_join" ->
      """SELECT s_suppkey, count(*) AS n_orders
         FROM (SELECT o_orderkey, o_totalprice AS pstart, o_totalprice + 5000 AS pend
               FROM orders) p
         JOIN (SELECT s_suppkey, s_suppkey * 40000.0 AS rstart,
                      s_suppkey * 40000.0 + 60000 AS rend
               FROM supplier) r
           ON p.pstart <= r.rend AND p.pend >= r.rstart
         GROUP BY s_suppkey ORDER BY s_suppkey""")
}
