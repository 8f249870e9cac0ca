package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._
import graft.operators.{Bpe, Curation, Dedup, Eval, Graph, Layout, Mixture, Multimodal, Profile, Similarity, Sketches, TextAnalysis}

/** Training-data pipeline operator surface: dedup family, similarity
  * search, text analysis, multimodal plumbing — over `documents` and
  * `embeddings`.
  *
  * Every pseudo-random ingredient (MinHash families, SimHash bits,
  * hyperplanes) derives from md5, so the DuckDB oracles replicate the
  * *same* LSH — approximate recall, exact cross-engine parity.
  */
object Pipeline {

  // the q37 langId heuristic rendered over an arbitrary SQL text
  // expression (shared by q37-family oracles and the q280 chunk form)
  private def langCaseSql(e: String): String = {
    def hits(re: String) =
      s"len(regexp_extract_all(lower($e), '$re'))"
    val de = hits("\\b(der|die|und|das|ist|nicht|ein|zu)\\b")
    val en = hits("\\b(the|and|of|to|is|in|that|it)\\b")
    val es = hits("\\b(el|la|de|que|los|es|una|para)\\b")
    val fr = hits("\\b(le|la|et|les|des|est|une|dans)\\b")
    s"""CASE
          WHEN $de = greatest($de, $en, $es, $fr)
               AND greatest($de, $en, $es, $fr) > 0 THEN 'de'
          WHEN $en = greatest($de, $en, $es, $fr)
               AND greatest($de, $en, $es, $fr) > 0 THEN 'en'
          WHEN $es = greatest($de, $en, $es, $fr)
               AND greatest($de, $en, $es, $fr) > 0 THEN 'es'
          WHEN $fr = greatest($de, $en, $es, $fr)
               AND greatest($de, $en, $es, $fr) > 0 THEN 'fr'
          ELSE 'und' END"""
  }

  private val Toks =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** q316/q327 shared oracle prefix: the stupid-backoff scored token
    * stream (train slice, unigram/bigram models, per-position
    * integer-micro ln scores), verbatim.
    */
  private val BackoffScoredCte: String =
    s"""base AS (
            SELECT doc_id, $Toks AS t FROM documents
            WHERE len($Toks) > 0),
          train AS (SELECT * FROM base WHERE doc_id % 2 = 0),
          uni AS (
            SELECT w, count(*) AS c1
            FROM (SELECT unnest(t) AS w FROM train) GROUP BY w),
          tot AS (SELECT CAST(sum(c1) AS BIGINT) AS T FROM uni),
          bi AS (
            SELECT prev, cur, count(*) AS c2
            FROM (SELECT t[i-1] AS prev, t[i] AS cur
                  FROM (SELECT t, unnest(range(2, len(t)+1)) AS i
                        FROM train))
            GROUP BY prev, cur),
          pos AS (
            SELECT doc_id,
              CASE WHEN i > 1 THEN t[i-1] END AS prev, t[i] AS cur
            FROM (SELECT doc_id, t, unnest(range(1, len(t)+1)) AS i
                  FROM base)),
          scored AS (
            SELECT p.doc_id,
              u.c1 IS NULL AS oov,
              p.prev IS NOT NULL AND b.c2 IS NULL AS backoff,
              CAST(floor(ln(
                CASE WHEN p.prev IS NULL THEN
                    CASE WHEN u.c1 IS NULL THEN 0.4::DOUBLE / tot.T
                         ELSE CAST(u.c1 AS DOUBLE) / tot.T END
                  WHEN b.c2 IS NOT NULL THEN CAST(b.c2 AS DOUBLE) / up.c1
                  ELSE 0.4::DOUBLE *
                    CASE WHEN u.c1 IS NULL THEN 0.4::DOUBLE / tot.T
                         ELSE CAST(u.c1 AS DOUBLE) / tot.T END END
                ) * 1e6 + 0.5) AS BIGINT) AS lnq
            FROM pos p
            LEFT JOIN uni u ON u.w = p.cur
            LEFT JOIN uni up ON up.w = p.prev
            LEFT JOIN bi b ON b.prev = p.prev AND b.cur = p.cur
            CROSS JOIN tot)"""

  /** Authored k-truss fixture, shared verbatim by the q368 gate and
    * its oracle: a K6 clique (every edge closes 4 triangles —
    * survives k=4), a 7-triangle strip and a pendant triangle+tail
    * (both unzip over two peel rounds), two bridge edges (support 0,
    * peel round 1). 34 canonical edges; the 4-truss is exactly the
    * clique's 15 edges at support 4.
    */
  private[queries] val kTrussEdges: Seq[(Long, Long)] =
    (for (i <- 0 until 6; j <- i + 1 until 6)
      yield (i.toLong, j.toLong)) ++
    (10 until 17).map(i => (i.toLong, (i + 1).toLong)) ++
    (10 until 16).map(i => (i.toLong, (i + 2).toLong)) ++
    Seq((20L, 21L), (21L, 22L), (22L, 20L), (22L, 23L),
      (5L, 10L), (16L, 20L))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- k-truss: peel edges below k−2 triangle support to the
    //      fixpoint (the cohesion core the clique survives and the
    //      strip/pendant/bridges peel out of, over two rounds) ----
    "q368_ktruss" -> ((s, _) => {
      import s.implicits._
      Graph.kTruss(kTrussEdges.toDF("a", "b"), "a", "b", k = 4)
        .orderBy("u", "v")
    }),

    // ---- TextRank keywords: weighted PageRank over the word
    //      co-occurrence graph (window 2), top 15 connector terms ----
    "q369_textrank" -> ((s, d) => {
      TextAnalysis.textRank(Tables.documents(s, d), "text", "doc_id",
        iters = 3, topK = 15)
    }),

    // ---- leave-one-out kNN label check over the embeddings: do the
    //      neighborhoods already vote the labels? ----
    "q405_knn_loo" -> ((s, d) => {
      Similarity.knnLooLabelCheck(Tables.embeddings(s, d), "embedding",
        "vec_id", "label", mProbes = 20, k = 3)
    }),

    // ---- explicit Lloyd k-means over the embeddings (md5-seeded
    //      init, 3 unrolled rounds, final assignment report) ----
    "q403_kmeans" -> ((s, d) => {
      Similarity.kMeans(Tables.embeddings(s, d), "embedding",
        "vec_id", k = 4, rounds = 3)
    }),

    // ---- greedy max-coverage subset: 5 docs covering the most
    //      distinct 3-gram shingles (submodular data selection) ----
    "q400_coverage_select" -> ((s, d) => {
      TextAnalysis.coverageSelect(Tables.documents(s, d), "text",
        "doc_id")
    }),

    // ---- Local Outlier Factor over the embeddings (md5 probe panel,
    //      exact 2-hop kNN expansion, density-relative scores) ----
    "q399_lof" -> ((s, d) => {
      Similarity.lofScores(Tables.embeddings(s, d), "embedding",
        "vec_id", mProbes = 10, k = 3)
    }),

    // ---- dedup percolation curve: component structure of the
    //      verified near-dup graph at three similarity thresholds ----
    "q396_percolation" -> ((s, d) => {
      val pairs = Dedup.minHashLsh(Tables.documents(s, d), "text",
        "doc_id", numHashes = 16, bands = 4, shingleSize = 2,
        threshold = 0.5)
      Graph.percolation(pairs, "id_a", "id_b", "jaccard",
        Seq(0.5, 0.7, 0.9))
    }),

    // ---- rich-club coefficient of the q84 link graph: hub-to-hub
    //      edge density per degree threshold ----
    "q393_rich_club" -> ((s, d) => {
      val edges = Tables.documents(s, d).where(col("doc_id") < 300)
        .select(pmod(col("doc_id"), lit(50)).as("a"),
          pmod(col("doc_id") * 13 + 7, lit(50)).as("b"))
      Graph.richClub(edges, "a", "b", Seq(2, 4, 6, 8, 10))
    }),

    // ---- interpolated Kneser–Ney bigram smoothing: top-20 bigrams
    //      with discounted/continuation components ----
    "q379_kneser_ney" -> ((s, d) => {
      TextAnalysis.kneserNeyBigrams(Tables.documents(s, d), "text",
        "doc_id", topK = 20)
    }),

    // ---- exact-count stratified split: largest-remainder 8/1/1 per
    //      lang, rows dealt by md5 rank — sizes are exact integers,
    //      not hash expectations ----
    "q308_exact_stratified_split" -> ((s, d) => {
      Mixture.exactStratifiedSplit(
          Tables.documents(s, d), "doc_id", "lang",
          Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), den = 10L)
        .orderBy("doc_id")
    }),

    // ---- stupid-backoff bigram LM quality score: train on even
    //      doc_ids, score all (held-out shape keeps the backoff and
    //      OOV paths live) ----
    "q316_backoff_lm" -> ((s, d) => {
      TextAnalysis.backoffLmScore(Tables.documents(s, d), "text", "doc_id",
          trainFilter = col("doc_id") % 2 === 0)
        .orderBy("doc_id")
    }),

    // ---- min-k% prob memorization probe over the q316 LM: mean of
    //      each doc's bottom-20% token log-probs ----
    "q327_mink_prob" -> ((s, d) => {
      TextAnalysis.minKProbScore(Tables.documents(s, d), "text", "doc_id",
          trainFilter = col("doc_id") % 2 === 0)
        .orderBy("doc_id")
    }),

    // ---- distributed BPE merge learning: the vocabulary never leaves
    //      the cluster — one pair-count aggregate + one broadcast
    //      literal replace per round; the oracle replays all 6 rounds
    //      in SQL over the real corpus (q61 gates the driver-dict
    //      variant on a toy fixture) ----
    "q335_bpe_merges" -> ((s, d) => {
      Bpe.learnDistributed(Tables.documents(s, d), "text", numMerges = 6)
        .orderBy("round")
    }),

    // ---- tokenizer fertility audit per language: subword tokens per
    //      word / char / byte — the multilingual token-budget report ----
    "q336_tokenizer_fertility" -> ((s, d) => {
      TextAnalysis.fertilityReport(Tables.documents(s, d), "text", "lang")
        .orderBy("lang")
    }),

    // ---- Good–Turing frequency re-estimation over word bigrams
    //      (the unigram vocab has no rare tail in this corpus): r* per
    //      count class + unseen-event mass N1/N (the LM-smoothing
    //      companion of the q267 Chao1 unseen-species estimate) ----
    "q337_good_turing" -> ((s, d) => {
      TextAnalysis.goodTuring(Tables.documents(s, d), "text",
        n = 2, maxR = 10)
    }),

    // ---- distinctive terms per source: log-odds with an informative
    //      Dirichlet prior (Monroe et al., "Fightin' Words") over the
    //      corpus top-50 vocabulary, z-scored ----
    "q338_log_odds_terms" -> ((s, d) => {
      TextAnalysis.logOddsTerms(Tables.documents(s, d), "text", "source",
        topV = 50, alpha0 = 100.0)
    }),

    // ---- conductance of the SOURCE partition over the verified
    //      near-dup graph: low = duplicates stay within a source,
    //      high = syndication (duplicate mass crosses sources) ----
    "q341_source_conductance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.minHashLsh(docs, "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
      Graph.partitionConductance(edges, "id_a", "id_b",
        docs.select("doc_id", "source"), "doc_id", "source")
    }),

    // ---- Hopkins clusterability statistic over the embeddings:
    //      H ≈ 0.5 uniform, → 1 clustered — the audit run BEFORE
    //      spending a clustering/SemDeDup pass ----
    "q342_hopkins" -> ((s, d) => {
      Similarity.hopkinsStatistic(
        Tables.embeddings(s, d), "embedding", "vec_id", m = 20)
    }),

    // ---- split-document stitching: doc A's last-k tokens = doc B's
    //      first-k — the seam fragments share that LSH near-dup never
    //      sees (fragments aren't similar to each other) ----
    "q350_doc_stitching" -> ((s, d) => {
      Dedup.stitchingPairs(Tables.documents(s, d), "text", "doc_id", k = 3)
    }),

    // ---- TwoNN intrinsic-dimension estimate: how many degrees of
    //      freedom the 64-wide embeddings actually use (Pareto MLE on
    //      NN distance ratios) ----
    "q357_twonn_dim" -> ((s, d) => {
      Similarity.twoNnIntrinsicDim(
        Tables.embeddings(s, d), "embedding", "vec_id", m = 30)
    }),

    // ---- Fisher label-separability audit: do the embedding labels
    //      carve the space? (between/within scatter trace ratio) ----
    "q358_class_separability" -> ((s, d) => {
      Similarity.classSeparability(
        Tables.embeddings(s, d), "embedding", "label")
    }),

    // ---- Davies-Bouldin + Calinski-Harabasz cluster-validity
    //      indices over the labeled embeddings (the two standard
    //      internal-quality numbers next to q243's silhouette and
    //      q358's scatter view) ----
    "q437_cluster_validity" -> ((s, d) => {
      Similarity.clusterValidity(
        Tables.embeddings(s, d), "embedding", "label", "vec_id")
    }),

    // ---- Theil's U(lang | source): the asymmetric "does source
    //      determine language?" association (MI / H(lang)) ----
    "q359_theils_u" -> ((s, d) => {
      graft.operators.Eval.theilsU(
        Tables.documents(s, d), "source", "lang")
    }),

    // ---- RAKE keyphrase extraction: stopword-delimited phrase
    //      islands, deg/freq word scores, top-15 phrases ----
    "q347_rake_keyphrases" -> ((s, d) => {
      TextAnalysis.rakeKeyphrases(Tables.documents(s, d), "text", "doc_id",
        topK = 15)
    }),

    // ---- Warner randomized response (LOCAL differential privacy):
    //      per-record md5 coin flips the sensitive bit before
    //      aggregation; debiased estimator gated against truth ----
    "q348_randomized_response" -> ((s, d) => {
      graft.operators.Privacy.randomizedResponse(
        Tables.documents(s, d), "source", "doc_id",
        sensitive = col("lang") === "en", p = 0.75)
    }),

    // ---- exact dedup on a derived boilerplate key (2-token prefix) ----
    "q31_dedup_prefix_groups" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(array_join(slice(tokens(col("text")), 1, 2), " ")).as("fingerprint"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
        .filter(col("n_docs") >= 2)
        .orderBy("fingerprint")
    }),

    // ---- MinHash + LSH near-dup pairs (bigram shingles) ----
    "q32_dedup_minhash_lsh" -> ((s, d) => {
      Dedup.minHashLsh(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- blocked n-gram Jaccard near-dup pairs ----
    "q33_dedup_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("len_bucket", (col("n_chars") / lit(50)).cast("long"))
      Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          blockCols = Seq("lang", "len_bucket"), shingleSize = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- EXACT Jaccard-threshold join by prefix filtering (lossless
    //      counterpart of q32's LSH; oracle = brute-force all-pairs,
    //      so any false negative from the blocking fails the gate) ----
    "q159_set_similarity_join" -> ((s, d) => {
      Dedup.setSimilarityJoin(Tables.documents(s, d), "text", "doc_id",
          shingleSize = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- Dunning G² keyword saliency per source ----
    "q160_keyword_saliency" -> ((s, d) => {
      TextAnalysis.keywordSaliency(Tables.documents(s, d), "text", "source",
          topK = 3, minCount = 5)
        .orderBy("source", "rank")
    }),

    // ---- Bloom-prescreened decontamination: identical answer to the
    //      exact join (no false negatives), candidates pruned map-side
    //      against a literal sketch; 6-grams, probes = doc_id % 11 ----
    "q163_bloom_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probes = docs.where(pmod(col("doc_id"), lit(11)) === 0)
        .select(col("text").as("probe"))
      TextAnalysis.bloomDecontaminate(docs, "text", "doc_id", probes, "probe",
          n = 6, estimatedItems = 1L << 16, numBits = 1L << 19)
        .where(pmod(col("doc_id"), lit(11)) =!= 0) // probes match themselves
        .orderBy("doc_id")
    }),

    // ---- domain-level quality gate (RefinedWeb-style source drop
    //      with per-doc rescue) ----
    "q164_source_quality_gate" -> ((s, d) => {
      TextAnalysis.sourceQualityGate(Tables.documents(s, d), "text", "doc_id",
          "source", minSourceScore = 0.77, keepDocScore = 0.85)
        .orderBy("doc_id")
    }),

    // ---- inter-class centroid cosine matrix over embeddings ----
    "q165_centroid_similarity" -> ((s, d) => {
      Similarity.centroidSimilarity(Tables.embeddings(s, d), "embedding", "label")
        .orderBy("group_a", "group_b")
    }),

    // ---- cross-source syndication attribution over near-dup clusters ----
    "q166_syndication" -> ((s, d) => {
      Dedup.syndicationReport(Tables.documents(s, d), "text", "doc_id",
          "source", numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .orderBy("comp")
    }),

    // ---- IVF recall audit: probed-scan top-k vs brute-force truth ----
    "q167_ivf_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfRecallReport(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, nLists = 8, nProbe = 3, iters = 2,
          dims = 64)
        .orderBy("query_id")
    }),

    // ---- greedy k-center (farthest-point) coreset selection ----
    "q168_kcenter_select" -> ((s, d) => {
      Similarity.kCenterSelect(Tables.embeddings(s, d), "embedding", "vec_id",
          k = 4)
        .orderBy("rank")
    }),

    // ---- corpus saturation: first-occurrence novelty by ingestion order ----
    "q169_saturation" -> ((s, d) => {
      TextAnalysis.saturationReport(Tables.documents(s, d), "text", "doc_id",
          n = 3)
        .orderBy("doc_id")
    }),

    // ---- MinHash estimator-quality audit over verified pairs ----
    "q172_minhash_estimate_audit" -> ((s, d) => {
      Dedup.minHashEstimateAudit(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // ---- per-source data card (datasheet row per source) ----
    "q173_data_card" -> ((s, d) => {
      TextAnalysis.dataCard(Tables.documents(s, d), "text", "doc_id",
          "source", "lang")
        .orderBy("source")
    }),

    // ---- source-pair duplication flow matrix ----
    "q174_dup_flow_matrix" -> ((s, d) => {
      Dedup.dupFlowMatrix(Tables.documents(s, d), "text", "doc_id", "source",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .orderBy("source_a", "source_b")
    }),

    // ---- PQ codebook distortion audit (per-subspace encode MSE) ----
    "q175_pq_distortion" -> ((s, d) => {
      Similarity.pqDistortionReport(Tables.embeddings(s, d), "embedding",
          "vec_id", m = 4, ksub = 4, iters = 2, dims = 64)
        .orderBy("subspace")
    }),

    // ---- IDF-weighted Jaccard rescoring of near-dup pairs ----
    "q178_weighted_jaccard" -> ((s, d) => {
      Dedup.weightedJaccardPairs(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .orderBy("id_a", "id_b")
    }),

    // ---- retrieval ranking eval: nDCG@10 / MRR / P@10 per query,
    //      graded relevance = (#distinct query terms present) − 1 ----
    "q179_ndcg_mrr" -> ((s, d) => {
      Eval.rankingEval(Tables.documents(s, d), "text", "doc_id",
          queries = Seq(
            1 -> Seq("spark", "data", "query", "join"),
            2 -> Seq("hash", "merge", "sort"),
            3 -> Seq("vector", "stream", "window", "filter")),
          k = 10, depth = 100)
        .orderBy("query_id")
    }),

    // ---- quality-scorer ROC AUC per source vs the lang=en label
    //      (integer-exact Mann-Whitney over quantized scores) ----
    "q180_roc_auc" -> ((s, d) => {
      val q = TextAnalysis.qualityStruct(col("text")).getField("quality_score")
      Eval.rocAuc(Tables.documents(s, d), "source",
          round(q, 3), col("lang") === "en")
        .orderBy("source")
    }),

    // ---- quality-scorer calibration: reliability bins + ECE ----
    "q181_calibration" -> ((s, d) => {
      val q = TextAnalysis.qualityStruct(col("text")).getField("quality_score")
      Eval.calibration(Tables.documents(s, d), q, col("lang") === "en",
          bins = 10)
        .orderBy("bin")
    }),

    // ---- per-source vs global quality-score quantile alignment ----
    "q190_quantile_align" -> ((s, d) => {
      val q = TextAnalysis.qualityStruct(col("text")).getField("quality_score")
      graft.operators.Percentiles.quantileAlign(
          Tables.documents(s, d), "source", round(q, 3))
        .orderBy("source", "decile")
    }),

    // ---- Zipf's-law fit: OLS of ln(freq) on ln(rank), top-200 ----
    "q183_zipf_fit" -> ((s, d) => {
      TextAnalysis.zipfFit(Tables.documents(s, d), "text", topN = 200)
    }),

    // ---- PMI collocations: document-level co-occurrence lift over
    //      the top-50 vocabulary, mined with the a-priori pair kernel ----
    "q192_collocations" -> ((s, d) => {
      val toksD = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("term"))
      val vocab = toksD.groupBy("term").agg(count(lit(1)).as("__df"))
        .orderBy(col("__df").desc, col("term").asc)
        .limit(50)
        .select("term")
      val baskets = toksD.join(broadcast(vocab), Seq("term"))
      graft.operators.Itemsets.pairLift(baskets, "doc_id", "term",
          minSupport = 5)
        .withColumn("pmi", round(log(col("lift")), 4))
        .select(col("item_a"), col("item_b"), col("n_ab"), col("pmi"))
        .orderBy(col("pmi").desc, col("item_a"), col("item_b"))
        .limit(20)
    }),

    // ---- rank agreement between the BM25 and Dirichlet-QL top-100
    //      lists: Spearman ρ / Kendall τ over the intersection ----
    "q196_rank_correlation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val terms = Seq("spark", "data", "query", "join")
      val lex = TextAnalysis.bm25(docs, "text", "doc_id", terms, k = 100)
        .withColumn("ra", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id").asc)))
      val sem = TextAnalysis.dirichletQl(docs, "text", "doc_id", terms,
          mu = 2000d, k = 100)
        .withColumn("rb", row_number().over(
          Window.orderBy(col("ql_score").desc, col("doc_id").asc)))
      Eval.rankCorrelation(lex, sem, "doc_id", "ra", "rb", depth = 100)
    }),

    // ---- quality-ordered selection curve: tokens captured per
    //      kept-docs decile ----
    "q197_selection_curve" -> ((s, d) => {
      val q = TextAnalysis.qualityStruct(col("text")).getField("quality_score")
      Eval.selectionCurve(Tables.documents(s, d),
          round(q, 3), size(tokens(col("text"))))
        .orderBy("decile")
    }),

    // ---- multimodal: perceptual-hash (aHash) image near-dup pairs
    //      over real PNG fixtures; 8×8 grid = identity sampling, so
    //      the expected hashes/distances are hand-computable ----
    "q198_image_phash_neardup" -> ((s, _) => {
      import java.awt.image.BufferedImage
      def png(px: (Int, Int) => Int): Array[Byte] = {
        val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, px(x, y))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val half: (Int, Int) => Int = (x, _) => if (x < 4) 0x000000 else 0xffffff
      val rows = Seq(
        (1L, png(half)),
        (2L, png(half)), // identical → Hamming 0
        (3L, png((x, y) =>
          if (x == 0 && y == 0) 0xffffff else half(x, y))), // 1 cell off
        (4L, png((x, _) => if (x < 4) 0xffffff else 0x000000)), // inverted: 64
        (5L, png((_, _) => 0x000000)), // flat → hash 0, distance 32
        (6L, Array[Byte](9, 9))) // undecodable → dropped
      import s.implicits._
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"),
        "id", "bytes", "image")
      Multimodal.imageNearDupPairs(media, maxDist = 3, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    // ---- in-engine logistic regression (full-batch GD, 5 exact
    //      passes) predicting lang=en from quality ratios ----
    "q203_logreg" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val q = TextAnalysis.qualityStruct(col("text"))
      TextAnalysis.logisticRegressionGd(docs,
        features = Seq(q.getField("punct_ratio"), q.getField("stopword_ratio")),
        label = col("lang") === "en", eta = 5.0, iters = 5)
    }),

    // ---- embedding-space hubness audit (kNN in-degree histogram) ----
    "q204_hubness" -> ((s, d) => {
      graft.operators.Similarity.hubnessReport(Tables.embeddings(s, d),
          "embedding", "vec_id", k = 5, sampleSize = 100)
        .orderBy("in_degree")
    }),

    // ---- degree assortativity of the verified near-dup graph ----
    "q208_assortativity" -> ((s, d) => {
      val pairs = Dedup.minHashLsh(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
      Graph.assortativity(pairs, "id_a", "id_b")
    }),

    // ---- Neyman optimal sample allocation across sources ----
    "q210_neyman_allocation" -> ((s, d) => {
      Mixture.neymanAllocation(Tables.documents(s, d), "source",
          col("n_chars"), budget = 1000L)
        .orderBy("source")
    }),

    // ---- k-anonymity audit over (lang, source, size-bucket) ----
    "q199_k_anonymity" -> ((s, d) => {
      graft.operators.Privacy.kAnonymityAudit(Tables.documents(s, d),
          Seq(col("lang"), col("source"), floor(col("n_chars") / 200)), k = 5)
        .orderBy("class_size")
    }),

    // ---- multimodal: audio energy-fingerprint near-dup pairs over
    //      amplitude-pattern WAV fixtures (segments = windows, so the
    //      expected bits/distances are hand-computable) ----
    "q201_audio_neardup" -> ((s, _) => {
      val alt = Seq.tabulate(64)(i => if (i % 2 == 0) 0.8 else 0.1)
      val rows = Seq(
        (1L, Multimodal.patternWav(alt)),
        (2L, Multimodal.patternWav(alt)), // identical → Hamming 0
        (3L, Multimodal.patternWav(alt.updated(0, 0.1))), // 1 window off
        (4L, Multimodal.patternWav(alt.map(a => 0.9 - a))), // inverted: 64
        (5L, Multimodal.patternWav(Seq.fill(64)(0.5))), // flat envelope
        (6L, Array[Byte](3, 1, 4))) // undecodable → dropped
      import s.implicits._
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"),
        "id", "bytes", "audio")
      Multimodal.audioNearDupPairs(media, maxDist = 3, bands = 4)
        .orderBy("id_a", "id_b")
    }),

    // ---- Burrows' Delta stylometric distance between sources ----
    "q193_burrows_delta" -> ((s, d) => {
      TextAnalysis.burrowsDelta(Tables.documents(s, d), "text", "source",
          vocabSize = 30)
        .orderBy("source_a", "source_b")
    }),

    // ---- waterfill token-budget allocation across sources ----
    "q194_waterfill" -> ((s, d) => {
      Mixture.waterfillAllocation(Tables.documents(s, d), "text", "source",
          budget = 100000L, alpha = 0.5)
        .orderBy("source")
    }),

    // ---- k-core of the verified near-dup graph (k = 2): genuinely
    //      interlinked duplicate families vs borderline chains ----
    "q195_kcore" -> ((s, d) => {
      val pairs = Dedup.minHashLsh(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
      Graph.kCore(pairs, "id_a", "id_b", k = 2, maxRounds = 8)
        .orderBy("id")
    }),

    // ---- Poisson-bootstrap CI of mean chars/doc per source ----
    "q185_bootstrap_ci" -> ((s, d) => {
      Eval.bootstrapCi(Tables.documents(s, d), "source", "doc_id",
          col("n_chars"), reps = 32)
        .orderBy("source")
    }),

    // ---- Dirichlet-smoothed query-likelihood retrieval (LM scorer,
    //      the probabilistic sibling of q102's BM25) ----
    "q186_dirichlet_ql" -> ((s, d) => {
      TextAnalysis.dirichletQl(Tables.documents(s, d), "text", "doc_id",
          queryTerms = Seq("spark", "data", "query", "join"),
          mu = 2000d, k = 15)
    }),

    // ---- SimHash fingerprints (16-bit) ----
    "q34_simhash" -> ((s, d) => {
      Dedup.simHashFingerprints(Tables.documents(s, d), "text", "doc_id", bits = 16)
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy("doc_id")
    }),

    // ---- exact cosine top-k (ANN correctness baseline) ----
    "q35_knn_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceKnn(
          emb, emb.filter(col("vec_id") < 5), "embedding", "vec_id", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- LSH-bucketed ANN (the scale path; same hyperplane family
    //      reproduced in the oracle) ----
    "q36_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshKnn(
          emb, emb.filter(col("vec_id") < 5), "embedding", "vec_id",
          k = 5, planes = 6, tables = 1, dims = 64)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- embedding cosine near-dup pairs (LSH-bucketed) ----
    "q56_embedding_neardup" -> ((s, d) => {
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "embedding", "vec_id",
          threshold = 0.3, planes = 4, dims = 64)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // ---- language-ID confusion matrix ----
    "q37_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("pred", TextAnalysis.langId(col("text")))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }),

    // ---- quality scoring ----
    "q38_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .withColumn("q", TextAnalysis.qualityStruct(col("text")))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"),
          col("q.n_tokens").as("n_tokens"),
          col("q.mean_token_len").as("mean_token_len"),
          col("q.punct_ratio").as("punct_ratio"),
          col("q.stopword_ratio").as("stopword_ratio"),
          col("q.quality_score").as("quality_score"))
        .orderBy("doc_id")
    }),

    // ---- token counting (whitespace + BPE-ish) per source ----
    "q39_token_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")).cast("long"))
        .withColumn("n_bpe", TextAnalysis.tokenCountBpeIsh(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("sum_tokens"),
          sum("n_bpe").as("sum_bpe_tokens"),
          round(avg("n_tok"), 4).as("avg_tokens"))
        .orderBy("source")
    }),

    // ---- corpus token frequencies (explode → agg → top-k) ----
    "q54_token_topk" -> ((s, d) => {
      TextAnalysis.tokenFrequencies(Tables.documents(s, d), "text")
        .orderBy(col("freq").desc, col("token").asc)
        .limit(20)
    }),

    // ---- document fingerprint (md5 of normalized text) ----
    "q40_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), textFingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    // ---- PII/URL scrubbing (deterministic synthetic dirt so the
    //      masking actually fires on the clean corpus) ----
    "q57_scrub_pii" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .withColumn("dirty",
          concat(col("text"), lit(" contact bob@example.com or "),
            lit("https://example.com/x?id=1 tel 5551234567")))
        .select(col("doc_id"), TextAnalysis.scrubPii(col("dirty")).as("clean"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: binary payload byte stats ----
    "q41_media_bytes" -> ((s, d) => {
      val media = Multimodal.asMedia(
        Tables.documents(s, d).filter(col("doc_id") < 20), "doc_id", "text", "text")
      Multimodal.byteStats(media)
        .select("media_id", "n_bytes", "payload_md5")
        .orderBy("media_id")
    }),

    // ---- multimodal: stub feature extraction via mapPartitions ----
    "q42_media_features" -> ((s, d) => {
      val media = Multimodal.asMedia(
        Tables.documents(s, d).filter(col("doc_id") < 20), "doc_id", "text", "text")
      val feats = Multimodal.extractFeatures(media, dim = 4)
      feats.select(
          (col("media_id") +:
            (0 until 4).map(i =>
              round(element_at(col("features"), i + 1), 6).as(s"f$i"))): _*)
        .orderBy("media_id")
    }),

    // ---- multimodal: REAL image decode (JDK ImageIO, no external
    //      deps) over deterministic generated PNGs; undecodable payload
    //      degrades to NULLs instead of failing the job ----
    "q60_media_decode" -> ((s, _) => {
      import java.awt.image.BufferedImage
      def png(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val rows = Seq(
        (1L, png(4, 4, (_, _) => 0x000000)), // black → luma bin 0
        (2L, png(2, 3, (_, _) => 0xffffff)), // white → luma bin 3
        (3L, png(2, 2, (x, _) => if (x == 0) 0x000000 else 0xffffff)),
        (4L, png(3, 1, (_, _) => 0x808080)), // mid gray → luma bin 2
        (5L, Array[Byte](1, 2, 3))) // not an image → NULL decode
      import s.implicits._
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "image")
      Multimodal.decodeImages(media, dim = 4)
        .select((Seq(col("media_id"), col("img_width"), col("img_height")) ++
          (0 until 4).map(i =>
            round(element_at(col("img_features"), i + 1), 6).as(s"f$i"))): _*)
        .orderBy("media_id")
    }),

    // ---- multimodal: REAL audio decode (JDK javax.sound.sampled —
    //      WAV/PCM needs no external codec) over synthesized fixtures;
    //      corrupt payloads degrade to NULLs ----
    "q63_audio_decode" -> ((s, _) => {
      import s.implicits._
      val rows = Seq(
        (1L, Multimodal.sineWav(440, 200, 8000f, 1, 0.5)),
        (2L, Multimodal.sineWav(1000, 125, 16000f, 2, 0.25)),
        (3L, Multimodal.sineWav(440, 300, 8000f, 1, 0.0)), // silence
        (4L, Array[Byte](9, 9, 9))) // not audio → NULL decode
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "audio")
      Multimodal.decodeAudios(media)
        .select(col("media_id"), col("audio_sample_rate"), col("audio_channels"),
          col("audio_duration_ms"),
          round(col("audio_rms"), 2).as("rms"),
          round(col("audio_peak"), 2).as("peak"))
        .orderBy("media_id")
    }),

    // ---- data profiling: per-column survey in one aggregation ----
    "q73_profile" -> ((s, d) => {
      graft.operators.Profile.profile(graft.Tables.lineitem(s, d),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
        .orderBy("column")
    }),

    // ---- corpus-LM surprisal quality scoring ----
    "q71_surprisal" -> ((s, d) => {
      TextAnalysis.unigramSurprisal(Tables.documents(s, d), "text", "doc_id")
        .where(col("doc_id") < 30)
        .orderBy("doc_id")
    }),

    // ---- triangle cohesion of the near-dup graph: clique vs star
    //      duplicate families via local clustering coefficient ----
    "q133_triangle_cohesion" -> ((s, d) => {
      val pairs = Dedup.minHashLsh(Tables.documents(s, d), "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
      Graph.triangleCounts(pairs, "id_a", "id_b").orderBy("id")
    }),

    // ---- serpentine shard layout: snake-dealt by size rank into 8
    //      near-equal-weight training shards ----
    "q132_shard_manifest" -> ((s, d) => {
      Mixture.shardManifest(Tables.documents(s, d), "doc_id", "n_chars",
          nShards = 8)
        .orderBy("shard")
    }),

    // ---- CCNet perplexity tiers: per-source surprisal ntiles,
    //      head/middle/tail ----
    "q131_perplexity_buckets" -> ((s, d) => {
      TextAnalysis.perplexityBuckets(Tables.documents(s, d), "text",
          "doc_id", "source", nBuckets = 3)
        .where(col("doc_id") < 60)
        .orderBy("doc_id")
    }),

    // ---- embedding covariance matrix (single-pass, d-group agg) ----
    "q134_cov_matrix" -> ((s, d) => {
      Similarity.covarianceMatrix(Tables.embeddings(s, d), "embedding")
        .orderBy("i", "j")
    }),

    // ---- PC1 projection summary (power iteration on the collected
    //      covariance; map-only projection scan) ----
    "q226_pca_project" -> ((s, d) => {
      Similarity.pcaProject(Tables.embeddings(s, d), "embedding", "label",
          iters = 8)
        .orderBy("label")
    }),

    // ---- Flesch reading-ease per document (row-local, no shuffle) ----
    "q228_readability" -> ((s, d) => {
      TextAnalysis.readability(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- Cramér's V association between lang and source ----
    "q232_cramers_v" -> ((s, d) => {
      Eval.cramersV(Tables.documents(s, d), "lang", "source")
    }),

    // ---- Heaps'-law vocabulary-growth fit over the doc_id order ----
    "q237_heaps_fit" -> ((s, d) => {
      TextAnalysis.heapsFit(Tables.documents(s, d), "doc_id", "text")
    }),

    // ---- Adamic-Adar link prediction: documents sharing RARE 3-gram
    //      shingles (the degree guard IS the rarity filter — common
    //      shingles carry no signal and are dropped, which also bounds
    //      the pair fan-out) ----
    "q229_link_prediction" -> ((s, d) => {
      val inc = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("__t"))
        .select(col("doc_id"),
          explode(wordShingles(col("__t"), 3)).as("shingle"))
      graft.operators.Graph.adamicAdar(inc, "doc_id", "shingle",
        minShared = 2, maxAttrDeg = 20, topK = 50)
    }),

    // ---- BFS hop distances from a seed set over a deterministic
    //      functional graph (a → (7a+3) mod 600) ----
    "q238_bfs_hops" -> ((s, d) => {
      val edges = Tables.documents(s, d)
        .select(col("doc_id").as("a"),
          pmod(col("doc_id") * 7 + 3, lit(600)).as("b"))
      val seeds = Tables.documents(s, d).where(col("doc_id") < 3)
        .select(col("doc_id").as("id"))
      Graph.bfsHops(edges, "a", "b", seeds, "id", maxDepth = 4)
        .orderBy("id")
    }),

    // ---- marginal novelty per doc (first-occurrence 8-gram share) ----
    "q283_novelty_rate" -> ((s, d) => {
      TextAnalysis.noveltyRate(Tables.documents(s, d), "doc_id", "text",
          n = 8)
        .orderBy("doc_id")
    }),

    // ---- code-switching audit: chunk-level language agreement ----
    "q280_code_switching" -> ((s, d) => {
      TextAnalysis.codeSwitching(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 32)
        .orderBy("doc_id")
    }),

    // ---- Wasserstein-1 drift between source length distributions
    //      (decile-grid approximation over exact quantiles) ----
    "q281_wasserstein_drift" -> ((s, d) => {
      val decs = graft.operators.Percentiles.exact(
        Tables.documents(s, d).select("source", "n_chars"),
        Seq("source"), "n_chars", (1 to 9).map(i => i / 10.0 -> s"p$i"))
      val a = decs.as("a"); val b = decs.as("b")
      val w1 = (1 to 9).map(i =>
        abs(col(s"a.p$i") - col(s"b.p$i"))).reduce(_ + _) / 9
      a.join(b, col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"),
          col("b.source").as("source_b"),
          round(w1, 4).as("w1_chars"))
        .orderBy("source_a", "source_b")
    }),

    // ---- UniMax epoch-capped language sampling (Chung et al. 2023):
    //      budget 1.2× corpus chars, 1.5-epoch cap — the tail
    //      languages cap at 1.5 epochs, the head language (en, ~2.7×
    //      the others) absorbs the remainder under one epoch ----
    "q286_unimax" -> ((s, d) => {
      Mixture.unimaxAllocation(Tables.documents(s, d), "lang",
          col("n_chars"), budgetFrac = 1.2, maxEpochs = 1.5)
        .orderBy("lang")
    }),

    // ---- Cohen's kappa label-quality audit on a synthetic double
    //      annotation: rater A = gold label, rater B disagrees
    //      (+1 mod 10) on the md5-chosen ~20% of items ----
    "q287_cohens_kappa" -> ((s, d) => {
      val rated = Tables.embeddings(s, d).select(
        col("label").as("ra"),
        when(pmod(md5Long(col("vec_id"), 7), lit(5)) === 0,
          pmod(col("label") + 1, lit(10))).otherwise(col("label")).as("rb"))
      Eval.cohensKappa(rated, col("ra"), col("rb"))
    }),

    // ---- PSI drift: each source's length distribution vs the pooled
    //      corpus over the corpus decile grid (0.1/0.25 alert bands) ----
    "q288_psi_drift" -> ((s, d) => {
      Profile.populationStability(Tables.documents(s, d), "source", "n_chars")
        .select(col("group").as("source"), col("n"), col("psi"))
        .orderBy("source")
    }),

    // ---- external clustering eval: purity + NMI of the 8-list
    //      k-means vs the gold label ----
    "q279_cluster_purity" -> ((s, d) => {
      Similarity.clusterLabelAgreement(Tables.embeddings(s, d),
        "embedding", "vec_id", "label", nLists = 8, iters = 2, dims = 64)
    }),

    // ---- Newman modularity of the q64 component assignment ----
    "q271_modularity" -> ((s, d) => {
      val edges = Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(5)) < 2)
        .select(col("doc_id").as("a"),
          (col("doc_id") + 1 + pmod(col("doc_id"), lit(3))).as("b"))
      val comms = Graph.connectedComponents(edges, "a", "b")
      Graph.modularity(edges, "a", "b", comms, "id", "comp")
    }),

    // ---- synchronous min-tie label propagation (3 rounds) over the
    //      functional graph ----
    "q272_label_propagation" -> ((s, d) => {
      val edges = Tables.documents(s, d)
        .select(col("doc_id").as("a"),
          pmod(col("doc_id") * 7 + 3, lit(600)).as("b"))
      Graph.labelPropagation(edges, "a", "b", rounds = 3).orderBy("id")
    }),

    // ---- embedding-space geometry: pairwise-cosine histogram over
    //      the md5-lowest 100 sample ----
    "q268_pairdist_histogram" -> ((s, d) => {
      Similarity.pairDistanceHistogram(Tables.embeddings(s, d),
          "embedding", "vec_id", sampleN = 100)
        .orderBy("bin")
    }),

    // ---- rank-biased overlap between the length and token-count
    //      rankings (top-weighted list agreement) ----
    "q269_rbo" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      def top50(key: org.apache.spark.sql.Column) = docs
        .select(col("doc_id"), key.as("__k"))
        .orderBy(col("__k").desc, col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("__k").desc, col("doc_id"))))
      graft.operators.Eval.rankBiasedOverlap(
        top50(col("n_chars")), top50(size(tokens(col("text")))),
        "doc_id", "rank", depth = 50, p = 0.9)
    }),

    // ---- Wilson 95% interval on the q72 contamination rate ----
    "q270_wilson_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probes = docs.where(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("text").as("probe"))
      val k = TextAnalysis.contaminated(docs, "text", "doc_id", probes,
          "probe", n = 8)
        .where(pmod(col("doc_id"), lit(7)) =!= 0)
        .agg(count(lit(1)).as("k"))
      val tot = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
        .agg(count(lit(1)).as("n"))
      val z = lit(1.96)
      val nD = col("n").cast("double")
      val p = col("k").cast("double") / nD
      val z2 = z * z
      val den = lit(1d) + z2 / nD
      val half = z * sqrt(p * (lit(1d) - p) / nD
        + z2 / (lit(4d) * nD * nD))
      k.crossJoin(broadcast(tot))
        .select(col("n"), col("k"), round(p, 6).as("rate"),
          round((p + z2 / (lit(2d) * nD) - half) / den, 6).as("wilson_lo"),
          round((p + z2 / (lit(2d) * nD) + half) / den, 6).as("wilson_hi"))
    }),

    // ---- feature-hashing collision audit (3-gram types → 256
    //      buckets) ----
    "q266_feature_hash_audit" -> ((s, d) => {
      TextAnalysis.featureHashAudit(Tables.documents(s, d), "text",
          n = 3, buckets = 256)
        .orderBy("load")
    }),

    // ---- Good-Turing unseen mass + Chao1 richness over 3-grams ----
    "q267_chao1_unseen" -> ((s, d) => {
      TextAnalysis.unseenVocabEstimate(Tables.documents(s, d), "text",
        n = 3)
    }),

    // ---- matryoshka truncation audit: recall@5 of the 16-dim prefix
    //      vs the full 64-dim ground truth ----
    "q262_matryoshka_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.matryoshkaRecallReport(emb,
          emb.filter(col("vec_id") < 5), "embedding", "vec_id", k = 5,
          prefixDims = 16)
        .orderBy("query_id")
    }),

    // ---- centroid-silhouette quality of the 8-list k-means ----
    "q243_silhouette" -> ((s, d) => {
      Similarity.silhouetteReport(Tables.embeddings(s, d), "embedding",
          "vec_id", nLists = 8, iters = 2, dims = 64)
        .orderBy("list")
    }),

    // ---- functional-dependency discovery over documents metadata ----
    "q245_functional_deps" -> ((s, d) => {
      Eval.functionalDeps(Tables.documents(s, d),
          Seq("lang" -> "source", "source" -> "lang", "doc_id" -> "lang"))
        .orderBy("determinant", "dependent")
    }),

    // ---- per-class P/R/F1 of the in-engine langId vs gold lang ----
    "q240_classification_report" -> ((s, d) => {
      val preds = Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
      Eval.classificationReport(preds, "lang", "pred").orderBy("clazz")
    }),

    // ---- MMR diverse top-k re-rank over a bounded relevance pool ----
    "q135_mmr_rerank" -> ((s, d) => {
      Similarity.mmrSelect(Tables.embeddings(s, d), "embedding", "vec_id",
          // λ = 0.5: both λ and 1−λ are exact binary doubles, so the
          // greedy's score comparisons replay bit-identically in SQL
          queryId = 0L, k = 5, poolSize = 15, lambda = 0.5)
        .orderBy("rank")
    }),

    // ---- character-class profile (row-local formatting audit) ----
    "q136_charclass" -> ((s, d) => {
      TextAnalysis.charClassProfile(Tables.documents(s, d), "text", "doc_id")
        .where(col("doc_id") < 60)
        .orderBy("doc_id")
    }),

    // ---- asymmetric containment pairs (quote/embedding detection) ----
    "q137_containment" -> ((s, d) => {
      Dedup.containmentPairs(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.6)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"),
          round(col("cont_a"), 4).as("cont_a"), round(col("cont_b"), 4).as("cont_b"),
          round(col("containment"), 4).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    // ---- declarative data-quality expectation suite ----
    "q139_expectations" -> ((s, d) => {
      import graft.operators.Expectations._
      suite(Seq(
        expectNotNull(Tables.orders(s, d), "orders", "o_totalprice"),
        expectUnique(Tables.documents(s, d), "documents", Seq("doc_id")),
        expectBetween(Tables.lineitem(s, d), "lineitem", "l_quantity", 1, 50),
        expectInSet(Tables.documents(s, d), "documents", "lang",
          Seq("en", "de", "fr", "es", "zh")),
        refIntegrity(Tables.lineitem(s, d), "lineitem", "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        refIntegrity(Tables.orders(s, d), "orders", "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        expectRowCount(Tables.region(s, d), "region", 5, 5)))
        .orderBy("check_name")
    }),

    // ---- HITS hub/authority over a deterministic citation graph ----
    "q140_hits" -> ((s, d) => {
      val edges = Tables.documents(s, d).where(col("doc_id") < 240)
        .select(pmod(col("doc_id"), lit(40)).as("src"),
          pmod(col("doc_id") * 17 + 3, lit(40)).as("dst"))
        .where(col("src") =!= col("dst"))
      Graph.hits(edges, "src", "dst", iters = 2).orderBy("id")
    }),

    // ---- categorized blocklist screening ----
    "q141_blocklist" -> ((s, d) => {
      TextAnalysis.blocklistScreen(Tables.documents(s, d), "text", "doc_id",
          blocklist = Seq("slow" -> "perf", "fast" -> "perf",
            "big" -> "size", "small" -> "size", "dup" -> "dupe"),
          maxHitFrac = 0.05)
        .where(col("doc_id") < 60)
        .orderBy("doc_id")
    }),

    // ---- embedding-column quality audit per label ----
    "q142_embedding_audit" -> ((s, d) => {
      Similarity.embeddingAudit(Tables.embeddings(s, d), "embedding",
          "label", dims = 64)
        .orderBy("label")
    }),

    // ---- winsorization report: clip at per-group exact p01/p99 ----
    "q143_winsorize" -> ((s, d) => {
      graft.operators.Percentiles.winsorizeReport(Tables.lineitem(s, d),
          "l_returnflag", "l_extendedprice", pLo = 0.01, pHi = 0.99)
        .orderBy("l_returnflag")
    }),

    // ---- kNN label-consistency audit (mislabel detection) ----
    "q144_label_consistency" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.labelConsistency(emb, "embedding", "vec_id", "label",
          k = 5, queries = emb.filter(col("vec_id") < 100))
        .orderBy("label")
    }),

    // ---- pairwise co-occurrence lift (market-basket level 2) ----
    "q145_pair_lift" -> ((s, d) => {
      graft.operators.Itemsets.pairLift(Tables.events(s, d),
          "user_id", "event_type", minSupport = 2)
        .orderBy("item_a", "item_b")
    }),

    // ---- per-doc token-distribution entropy / evenness ----
    "q146_token_entropy" -> ((s, d) => {
      TextAnalysis.tokenEntropy(Tables.documents(s, d), "text", "doc_id")
        .where(col("doc_id") < 60)
        .orderBy("doc_id")
    }),

    // ---- source-pair Jensen-Shannon divergence matrix ----
    "q147_js_divergence" -> ((s, d) => {
      TextAnalysis.sourceJsDivergence(Tables.documents(s, d), "text", "source")
        .orderBy("source_a", "source_b")
    }),

    // ---- LSH recall audit vs brute-force truth on a bounded sample ----
    "q148_lsh_recall" -> ((s, d) => {
      Dedup.lshRecallReport(
        Tables.documents(s, d).where(col("doc_id") < 80),
        "text", "doc_id", numHashes = 16, bands = 4, shingleSize = 2,
        threshold = 0.5)
    }),

    // ---- span-level surprisal (chunk quality inside documents) ----
    "q149_span_surprisal" -> ((s, d) => {
      TextAnalysis.spanSurprisal(Tables.documents(s, d), "text", "doc_id",
          size = 32, stride = 16)
        .where(col("doc_id") < 30)
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- per-dimension z-score standardization (map-only pass 2) ----
    "q150_standardize" -> ((s, d) => {
      Similarity.standardizeEmbeddings(Tables.embeddings(s, d),
          "embedding", "vec_id")
        .where(col("vec_id") < 10)
        .select(col("vec_id"), posexplode(col("z")).as(Seq("i", "zv")))
        .select(col("vec_id"), col("i"), (round(col("zv"), 6) + lit(0d)).as("z"))
        .orderBy("vec_id", "i")
    }),

    // ---- per-source exact-duplicate rate report ----
    "q151_dup_rate" -> ((s, d) => {
      Dedup.dupRateByGroup(Tables.documents(s, d), "text", "source")
        .orderBy("source")
    }),

    // ---- KS length-distribution drift matrix between sources ----
    "q152_ks_matrix" -> ((s, d) => {
      graft.operators.Profile.ksMatrix(Tables.documents(s, d),
          "source", "n_chars")
        .orderBy("group_a", "group_b")
    }),

    // ---- split-hygiene audit: near-dup pairs crossing a naive split ----
    "q153_split_contamination" -> ((s, d) => {
      TextAnalysis.splitContamination(Tables.documents(s, d), "text", "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("split_a", "split_b")
    }),

    // ---- leakage-safe k-fold cross-validation assignment ----
    "q154_leakage_safe_folds" -> ((s, d) => {
      TextAnalysis.leakageSafeFolds(Tables.documents(s, d), "text", "doc_id",
          k = 5)
        .orderBy("fold")
    }),

    // ---- incremental near-dedup ingest vs a signature sidecar ----
    "q155_ingest_novel_near" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val hist = Dedup.nearSignatures(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id",
        numHashes = 16, shingleSize = 2)
      Dedup.ingestNovelNear(
          docs.where(pmod(col("doc_id"), lit(2)) === 1), "text", "doc_id",
          hist, numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // ---- token-coverage curve at probe vocab sizes ----
    "q158_coverage_curve" -> ((s, d) => {
      TextAnalysis.coverageCurve(Tables.documents(s, d), "text",
          ks = Seq(5, 10, 20, 50))
        .orderBy("k")
    }),

    // ---- bigram-LM surprisal (conditional-probability quality) ----
    "q94_bigram_surprisal" -> ((s, d) => {
      TextAnalysis.bigramSurprisal(Tables.documents(s, d), "text", "doc_id")
        .where(col("doc_id") < 30)
        .orderBy("doc_id")
    }),

    // ---- benchmark decontamination: docs sharing any 8-gram with the
    //      probe set (docs with doc_id % 7 = 0 stand in for an eval
    //      snippet list) ----
    "q72_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probes = docs.where(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("text").as("probe"))
      TextAnalysis.contaminated(docs, "text", "doc_id", probes, "probe", n = 8)
        .where(pmod(col("doc_id"), lit(7)) =!= 0) // probes match themselves
        .orderBy("doc_id")
    }),

    // ---- end-to-end near-dedup: LSH pairs → transitive clusters →
    //      keep min id per cluster; the oracle replays the full LSH +
    //      a recursive-CTE closure ----
    "q69_near_dedup" -> ((s, d) => {
      Dedup.nearDedup(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // ---- near-dedup representative selection: LSH pairs → clusters →
    //      keep the highest-quality member per cluster (longest text,
    //      ties to the lowest id) — the production "keep best" rule;
    //      oracle = the q69 closure + a per-cluster argmax ----
    "q114_dedup_keep_best" -> ((s, d) => {
      Dedup.nearDupClusterKeepers(Tables.documents(s, d), "text", "doc_id",
          "n_chars", numHashes = 16, bands = 4, shingleSize = 2,
          threshold = 0.5)
        .orderBy("comp")
    }),

    // ---- DSIR importance resampling: hashed unigram+bigram bucket
    //      models (256 buckets, add-one smoothing), raw docs scored by
    //      the target/raw log-likelihood ratio, Gumbel-top-20 draw
    //      with md5-deterministic noise; rounding only after the limit
    //      (the q108 lesson) ----
    "q115_dsir_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Mixture.dsirSample(
          docs.where(!col("source").isin("src0", "src1")),
          docs.where(col("source").isin("src0", "src1")),
          "text", "doc_id", k = 20)
        .select(col("doc_id"), col("n_feats"),
          round(col("log_weight"), 6).as("log_weight"),
          round(col("score"), 6).as("score"))
    }),

    // ---- JL random-projection ANN: 64→16 Rademacher projection
    //      (md5-parity signs, one typedLit matrix), cosine top-5 in
    //      the projected space; the oracle recomputes the sign matrix
    //      from the same md5 parity ----
    "q116_rp_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.rpKnn(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, dims = 64, outDims = 16)
        .select(col("query_id"), col("neighbor_id"),
          round(col("rp_cosine"), 4).as("rp_cosine"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- intra-document duplicate-sentence removal: docs are chunked
    //      into 6-token "sentences" with deterministically injected
    //      repeats (%3 → first sentence again, %5 → second twice — the
    //      q113 mutation pattern), then the row-local de-repetition
    //      pass keeps first occurrences and reassembles ----
    "q117_dedup_sentences" -> ((s, d) => {
      val base = Tables.documents(s, d).where(col("doc_id") < 100)
        .select(col("doc_id"), graft.functions.tokens(col("text")).as("_t"))
        .select(col("doc_id"),
          transform(
            sequence(lit(1),
              floor((size(col("_t")) + lit(5)) / lit(6)).cast("int")),
            i => array_join(slice(col("_t"), (i - 1) * 6 + 1, lit(6)), " "))
            .as("_s0"))
        .select(col("doc_id"), concat(
          col("_s0"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            array(element_at(col("_s0"), 1)))
            .otherwise(array().cast("array<string>")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            array(element_at(col("_s0"), 2), element_at(col("_s0"), 2)))
            .otherwise(array().cast("array<string>"))).as("_s"))
        .select(col("doc_id"), array_join(col("_s"), ". ").as("text"))
      TextAnalysis.dedupSentences(base, "text", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- cross-document boilerplate scrub (C4-style global sentence
    //      dedup): deterministic footer sentences injected into %4/%7
    //      docs must be detected as boilerplate (≥4 distinct docs) and
    //      scrubbed from every document; genuine body sentences stay ----
    "q123_boilerplate_scrub" -> ((s, d) => {
      val base = Tables.documents(s, d).where(col("doc_id") < 200)
        .select(col("doc_id"), concat(col("text"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit(". all rights reserved contact us for details"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit(". subscribe to our newsletter today"))
            .otherwise(lit(""))).as("text"))
      Dedup.boilerplateScrub(base, "text", "doc_id", minChars = 10, maxDocs = 4)
        .orderBy("doc_id")
    }),

    // ---- Efraimidis–Spirakis weighted sampling without replacement:
    //      top-5 docs per source by ln(u)/w keys, w = n_chars ----
    "q127_weighted_sample" -> ((s, d) => {
      Mixture.weightedSample(Tables.documents(s, d), "source", "doc_id",
          "n_chars", k = 5)
        .select("source", "doc_id", "rank", "sample_key")
        .orderBy("source", "rank")
    }),

    // ---- MOSS winnowing fingerprint overlap: shared window-min
    //      5-gram hashes (w=4), boilerplate-docfreq-guarded ----
    "q128_winnowing" -> ((s, d) => {
      Dedup.winnowingOverlap(Tables.documents(s, d), "text", "doc_id",
          k = 5, w = 4, maxDocFreq = 20, minShared = 2)
        .orderBy("id_a", "id_b")
    }),

    // ---- mergeable approx-quantile sketch vs exact interpolated
    //      quantiles, rank-error contract audited ----
    "q129_quantile_report" -> ((s, d) => {
      Sketches.quantileToleranceReport(Tables.documents(s, d), "n_chars",
          "source", probs = Seq(0.25, 0.5, 0.75, 0.9), accuracy = 1000)
        .orderBy("source", "p")
    }),

    // ---- Pareto-frontier document selection: skyline of
    //      (total tokens, distinct tokens) — no doc beats a survivor
    //      on both size and vocabulary richness ----
    "q126_skyline" -> ((s, d) => {
      val f = Tables.documents(s, d)
        .select(col("doc_id"),
          size(graft.functions.tokens(col("text"))).as("n_tokens"),
          size(array_distinct(graft.functions.tokens(col("text"))))
            .as("n_unique"))
      graft.operators.Skyline.skyline2d(f, "n_tokens", "n_unique", "doc_id")
        .select("doc_id", "n_tokens", "n_unique")
        .orderBy("doc_id")
    }),

    // ---- hashed multinomial Naive Bayes: train a fixed-size
    //      fastText-style source classifier on the corpus, score and
    //      argmax-assign every document ----
    "q124_naive_bayes" -> ((s, d) => {
      TextAnalysis.naiveBayes(Tables.documents(s, d), "text", "doc_id",
          "source", numFeatures = 512)
        .orderBy("doc_id")
    }),

    // ---- c-TF-IDF cluster labeling (BERTopic statistic): top-5 terms
    //      characterizing each source vs the corpus ----
    "q118_class_tfidf" -> ((s, d) => {
      TextAnalysis.classTfidf(Tables.documents(s, d), "text", "source", k = 5)
        .orderBy("source", "rank")
    }),

    // ---- contrastive pair mining: every LSH band collision labeled
    //      positive (verified near-dup) or hard_negative (bucket-
    //      similar but below threshold) — retrieval-training pairs ----
    "q119_contrastive_pairs" -> ((s, d) => {
      Dedup.contrastivePairs(Tables.documents(s, d), "text", "doc_id",
          numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 4).as("jaccard"), col("label"))
        .orderBy("id_a", "id_b")
    }),

    // ---- IVF ANN: k-means coarse quantizer + probed re-rank. The
    //      quantizer is deterministic (smallest-id init, fixed iters,
    //      tie-to-lower-list) and trains on a bounded md5-sample
    //      (mirrored as the oracle's `train` CTE; at gate SFs the cap
    //      exceeds the corpus so train = emb), so the oracle unrolls
    //      the k-means rounds as chained CTEs — the q84 PageRank
    //      pattern; exact-recall properties are additionally pinned in
    //      OperatorsSpec ----
    "q68_ivf_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfKnn(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, nLists = 8, nProbe = 3, iters = 2,
          dims = 64)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- PQ/ADC ANN: 4 subspaces × 4-code L2 codebooks (2 Lloyd
    //      rounds on the md5-bounded sample), corpus encoded to 4
    //      codes/vector, queries rank by asymmetric distance ----
    "q112_pq_adc" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqKnn(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, m = 4, ksub = 4, iters = 2,
          dims = 64)
        .select(col("query_id"), col("neighbor_id"),
          round(col("adc"), 4).as("adc"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- int8 scalar-quantized ANN: global-scale symmetric
    //      quantization, integer-exact dot-product ranking ----
    "q125_sq_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.sqKnn(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- binary (sign-bit) quantized ANN: popcount(xor) Hamming
    //      shortlist, exact-cosine re-rank ----
    "q130_binary_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.binaryKnn(emb, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, refine = 20)
        .select(col("query_id"), col("neighbor_id"), col("hamming"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- TF-IDF: per-document salient terms (corpus-global df/N) ----
    "q65_tfidf" -> ((s, d) => {
      TextAnalysis.tfIdf(Tables.documents(s, d), "text", "doc_id", topK = 3)
        .where(col("doc_id") < 20)
        .orderBy("doc_id", "rank")
    }),

    // ---- deterministic train/val/test split (hash-stable) ----
    "q66_dataset_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split", TextAnalysis.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("split")
    }),

    // ---- real image resize (nearest-neighbor, mapPartitions seam):
    //      resize → re-decode proves the payload is a valid image with
    //      the sampled pixel content ----
    "q91_media_resize" -> ((s, _) => {
      import java.awt.image.BufferedImage
      def png(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val rows = Seq(
        // left half white, right half black: 2×2 NN samples cols 0,2 →
        // white,black per row → luma histogram [0.5, 0, 0, 0.5]
        (1L, png(4, 4, (x, _) => if (x < 2) 0xffffff else 0x000000)),
        (2L, png(8, 2, (_, _) => 0x808080)), // gray stays gray → bin 2
        (3L, Array[Byte](7, 7, 7))) // not an image → NULLs
      import s.implicits._
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "image")
      val resized = Multimodal.resizeImages(media, 2, 2)
        .select(col("media_id"), col("payload"), col("img_width"), col("img_height"))
      Multimodal.decodeImages(
          resized.withColumnRenamed("img_width", "rw")
            .withColumnRenamed("img_height", "rh"), dim = 4)
        .select((Seq(col("media_id"), col("rw"), col("rh"),
          col("img_width").as("dw"), col("img_height").as("dh")) ++
          (0 until 4).map(i =>
            round(element_at(col("img_features"), i + 1), 6).as(s"f$i"))): _*)
        .orderBy("media_id")
    }),

    // ---- multimodal: REAL video decode (MJPEG-in-AVI — pure-JDK RIFF
    //      walk + ImageIO per JPEG frame) over muxed fixtures; corrupt
    //      payloads degrade to NULLs. try_element_at: the 2-frame video
    //      yields NULL for the third luma slot, as in the oracle ----
    "q95_video_decode" -> ((s, _) => {
      import graft.operators.MjpegAvi
      val v1 = MjpegAvi.encode(Seq(
        MjpegAvi.jpegFrame(8, 8, (_, _) => 0x000000),
        MjpegAvi.jpegFrame(8, 8, (_, _) => 0xffffff),
        MjpegAvi.jpegFrame(8, 8, (_, _) => 0x808080)), 8, 8, 10)
      val v2 = MjpegAvi.encode(Seq(
        MjpegAvi.jpegFrame(16, 8, (x, _) => if (x < 8) 0x000000 else 0xffffff),
        MjpegAvi.jpegFrame(16, 8, (x, _) => if (x < 8) 0xffffff else 0x000000)),
        16, 8, 25)
      val rows = Seq((1L, v1), (2L, v2), (3L, Array[Byte](9, 9, 9, 9)))
      import s.implicits._
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id", "bytes", "video")
      Multimodal.decodeVideos(media)
        .select(col("media_id"), col("video_width"), col("video_height"),
          col("video_n_frames"), col("video_duration_ms"),
          round(col("video_fps"), 2).as("fps"),
          round(try_element_at(col("video_mean_luma"), lit(1)), 4).as("l0"),
          round(try_element_at(col("video_mean_luma"), lit(2)), 4).as("l1"),
          round(try_element_at(col("video_mean_luma"), lit(3)), 4).as("l2"))
        .orderBy("media_id")
    }),

    // ---- keyframe (scene-change) selection over decoded video ----
    "q258_keyframes" -> ((s, _) => {
      import graft.operators.MjpegAvi
      val v1 = MjpegAvi.encode(Seq(
        MjpegAvi.jpegFrame(8, 8, (_, _) => 0x000000),
        MjpegAvi.jpegFrame(8, 8, (_, _) => 0xffffff),
        MjpegAvi.jpegFrame(8, 8, (_, _) => 0x808080)), 8, 8, 10)
      val v2 = MjpegAvi.encode(Seq(
        MjpegAvi.jpegFrame(16, 8, (x, _) => if (x < 8) 0x000000 else 0xffffff),
        MjpegAvi.jpegFrame(16, 8, (x, _) => if (x < 8) 0xffffff else 0x000000)),
        16, 8, 25)
      val rows = Seq((1L, v1), (2L, v2), (3L, Array[Byte](9, 9, 9, 9)))
      import s.implicits._
      val media = Multimodal.asMedia(rows.toDF("id", "bytes"), "id",
        "bytes", "video")
      Multimodal.keyframeSelect(Multimodal.decodeVideos(media))
        .orderBy("media_id")
    }),

    // ---- cross-doc duplicate n-gram spans (exact-substring dedup,
    //      keep-first: an 8-gram occurrence is removable when the same
    //      8-gram occurs in a lower-id document; overlapping removable
    //      grams merge into maximal spans) ----
    "q96_dup_spans" -> ((s, d) => {
      Dedup.duplicateSpans(Tables.documents(s, d), "text", "doc_id", n = 8)
        .orderBy("doc_id")
    }),

    // ---- sequence packing: concat-and-chunk per 100-doc bucket into
    //      512-token training sequences (GPT-style pretraining layout) ----
    "q100_sequence_pack" -> ((s, d) => {
      TextAnalysis.sequencePack(Tables.documents(s, d), "text", "doc_id",
          seqLen = 512, bucketDocs = 100)
        .orderBy("bucket", "seq")
    }),

    // ---- unigram drift between corpus halves (even vs odd doc_id —
    //      the dump-over-dump domain-shift monitor) ----
    "q104_term_drift" -> ((s, d) => {
      TextAnalysis.termDrift(Tables.documents(s, d), "text",
        col("doc_id") % 2 === 0, k = 20)
    }),

    // ---- cross-source boilerplate overlap matrix: for every source
    //      pair, how many distinct 5-token-prefix fingerprints they
    //      share (template/content leakage between domains) ----
    "q103_source_overlap" -> ((s, d) => {
      val fps = Tables.documents(s, d)
        .select(md5(array_join(slice(tokens(col("text")), 1, 5), " ")).as("fp"),
          col("source"))
        .distinct()
      val a = fps.select(col("fp"), col("source").as("src_a"))
      val b = fps.select(col("fp"), col("source").as("src_b"))
      a.join(b, "fp").where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
        .orderBy("src_a", "src_b")
    }),

    // ---- BM25 retrieval scoring against a fixed query bag ----
    "q102_bm25" -> ((s, d) => {
      TextAnalysis.bm25(Tables.documents(s, d), "text", "doc_id",
        queryTerms = Seq("spark", "data", "query", "join"), k = 15)
    }),

    // ---- token-budget mixture sampling: per source, keep the
    //      md5-priority prefix of docs filling a 1000-token budget ----
    "q101_token_budget" -> ((s, d) => {
      Mixture.sampleToTokenBudget(Tables.documents(s, d), "text", "doc_id",
          "source", budget = 1000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(size(tokens(col("text")))).cast("long").as("n_tokens_kept"))
        .orderBy("source")
    }),

    // ---- SemDeDup: k-means clusters (the q68 quantizer) bound the
    //      pairwise cosine to within-cluster; a vector is a semantic
    //      duplicate of its smallest ≥0.3-similar lower id ----
    "q105_semdedup" -> ((s, d) => {
      // nLists = 0 (AUTO): k = max(8, ⌈n/256⌉) — resolves to the flat
      // k = 8 quantizer at every gate corpus (the oracle's replay),
      // and to the two-level O(√k) quantizer on the synthetic scale
      // tiers where a fixed k would make the pair volume quadratic
      val emb = Tables.embeddings(s, d)
      // the oracle replays a k = 8 CTE chain; sf0.1 sits at n = 2000
      // (k = 8 holds up to n = 2048), so fixture growth must fail HERE
      // with the auto rule named, not as an unexplained hash mismatch.
      // The resolved (n, k) is read back from the operator's own AUTO
      // count — semDedup's quantizer construction is eager — so the
      // guard costs zero extra jobs and can't drift from the rule.
      val out = Dedup.semDedup(emb, "embedding", "vec_id",
        nLists = 0, iters = 2, threshold = 0.3, dims = 64)
      val (n, k) = Dedup.lastAutoK.getOrElse(
        sys.error("q105: semDedup AUTO mode did not record its resolved k"))
      require(k == 8, s"q105 AUTO quantizer resolved k=$k (n=$n, rule " +
        "max(8, ceil(n/256))) but the DuckDB oracle replays k=8 — " +
        "regenerate the oracle's k-means CTE chain for the new k")
      out.orderBy("vec_id")
    }),

    // ---- fuzzy dedup: prefix-blocked candidates verified by
    //      normalized Levenshtein (character-level near-dups the
    //      token-set measures miss) ----
    "q106_fuzzy_dedup" -> ((s, d) => {
      Dedup.editDistancePairs(Tables.documents(s, d), "text", "doc_id",
          blockTokens = 2, maxNormDist = 0.05)
        .orderBy("id_a", "id_b")
    }),

    // ---- soft dedup: commonness-based REWEIGHTING instead of removal
    //      (weight = inverse geometric-mean n-gram document frequency,
    //      normalized to mean 1 — the token budget is unchanged, its
    //      allocation shifts from boilerplate to novel documents) ----
    "q296_softdedup_weights" -> ((s, d) => {
      Dedup.softDedupWeights(Tables.documents(s, d), "text", "doc_id",
          n = 3, alpha = 1.0)
        .orderBy("doc_id")
    }),

    // ---- IVF index lifecycle: build → write parquet sidecars (inverted
    //      file partitioned by list) → load → query. nProbe = nLists ⇒
    //      the probe is exhaustive and EXACT, so the brute-force oracle
    //      checks the entire persisted round-trip ----
    "q299_ivf_persist" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ivf_${math.abs(d.hashCode)}"
      val idx = Similarity.buildIvfIndex(emb, "embedding", "vec_id",
        nLists = 8, iters = 2, dims = 64)
      Similarity.writeIvfIndex(idx, dir)
      val loaded = Similarity.readIvfIndex(s, dir)
      Similarity.ivfKnnIndexed(loaded, emb.filter(col("vec_id") < 5),
          "embedding", "vec_id", k = 5, nProbe = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- temperature-scaled mixture weights: per-source token share
    //      flattened by alpha=0.5, implied epochs at a 100k budget ----
    "q107_temperature_mix" -> ((s, d) => {
      Mixture.temperatureWeights(Tables.documents(s, d), "text", "source",
          alpha = 0.5, budget = 100000L)
        .orderBy("source")
    }),

    // ---- hybrid retrieval: BM25 and embedding-cosine rankings fused
    //      by reciprocal-rank fusion (c=60), top-15 ----
    "q108_rrf_hybrid" -> ((s, d) => {
      TextAnalysis.hybridRrf(Tables.documents(s, d), "text", "doc_id",
          Tables.embeddings(s, d), "embedding", "vec_id",
          queryTerms = Seq("spark", "data", "query", "join"),
          queryVecId = 0L, k = 15, depth = 100)
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // ---- leakage-safe splits: near-dup clusters (q69's LSH+closure)
    //      hash into train/val/test atomically — no duplicate family
    //      spans the eval boundary ----
    "q110_leakage_safe_split" -> ((s, d) => {
      TextAnalysis.leakageSafeSplit(Tables.documents(s, d), "text", "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("split")
    }),

    // ---- PII scrub: per-source detection counts + redaction proof.
    //      The synthetic corpus carries no PII, so the query injects
    //      deterministic doc_id-derived PII first (identical
    //      expressions in the oracle — both engines scrub the same
    //      text); residual_matches re-runs detection on the scrubbed
    //      text and must be 0, computed from the data ----
    "q111_pii_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val injected = docs.withColumn("text_pii", concat(
        col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" call +1-555-"),
            lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
            lit("-0199"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit(" host 192.168."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
            pmod(col("doc_id") * 7, lit(256)).cast("string")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit(" id 123-45-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit(""))))
      val scrubbed = TextAnalysis.piiAudit(injected, "text_pii")
      val residual = TextAnalysis.piiPatterns.map { case (_, re, _) =>
        regexp_count(col("text_scrubbed"), lit(re)) }.reduce(_ + _)
      scrubbed
        .withColumn("residual", residual)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("pii_email").cast("long").as("emails"),
          sum("pii_phone").cast("long").as("phones"),
          sum("pii_ipv4").cast("long").as("ips"),
          sum("pii_ssn").cast("long").as("ssns"),
          sum(when(col("pii_total") > 0, 1L).otherwise(0L))
            .cast("long").as("docs_with_pii"),
          sum("residual").cast("long").as("residual_matches"))
        .orderBy("source")
    }),

    // ---- snapshot diff: every id classified added/removed/changed/
    //      unchanged between two dataset versions by null-safe md5
    //      fingerprint — the "new" version is a deterministic mutation
    //      of documents (drop %17=3, re-source %13=5, add shifted
    //      copies of %29=1), replayed verbatim in the oracle ----
    "q113_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val newDf = docs.where(pmod(col("doc_id"), lit(17)) =!= 3)
        .withColumn("source",
          when(pmod(col("doc_id"), lit(13)) === 5,
            concat(col("source"), lit("-v2"))).otherwise(col("source")))
        .unionByName(docs.where(pmod(col("doc_id"), lit(29)) === 1)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)))
      Layout.snapshotDiff(docs, newDf, "doc_id",
          Seq("text", "lang", "source", "n_chars"))
        .orderBy("id")
    }),

    // ---- semantic decontamination: training vectors ≥0.3-similar to
    //      an eval probe (every 10th vec) in the same LSH bucket, with
    //      their closest-by-id probe and hit count ----
    "q109_semantic_decontaminate" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Dedup.semanticContaminated(
          emb.where(pmod(col("vec_id"), lit(10)) =!= 0),
          emb.where(pmod(col("vec_id"), lit(10)) === 0),
          "embedding", "vec_id", threshold = 0.3, planes = 4, dims = 64)
        .orderBy("train_id")
    }),

    // ---- per-label embedding outliers: the 3 vectors of each label
    //      least similar to their own label's mean vector (semantic
    //      filtering / mislabel detection) ----
    "q99_centroid_outliers" -> ((s, d) => {
      Similarity.centroidOutliers(Tables.embeddings(s, d),
          "embedding", "vec_id", "label", k = 3)
        .orderBy("label", "rank")
    }),

    // ---- streaming curation: file-stream the documents, stateful
    //      cross-batch exact dedup + quality flags + incremental
    //      per-source counters (AvailableNow ⇒ batch-replayable) ----
    "q85_stream_curation" -> ((s, d) => {
      graft.streaming.DocsStream.runCurationOnce(s, d).orderBy("source")
    }),

    // ---- PageRank (3 unrollable iterations) over a deterministic
    //      link graph — the corpus-quality ranking signal ----
    "q84_pagerank" -> ((s, d) => {
      val edges = Tables.documents(s, d).where(col("doc_id") < 300)
        .select(pmod(col("doc_id"), lit(50)).as("a"),
          pmod(col("doc_id") * 13 + 7, lit(50)).as("b"))
      Graph.pageRank(edges, "a", "b", iters = 3).orderBy("id")
    }),

    // ---- connected components: transitive near-dup clustering over a
    //      deterministic edge list (the DuckDB oracle replays the same
    //      closure with a recursive CTE) ----
    "q64_components" -> ((s, d) => {
      val edges = Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(5)) < 2)
        .select(col("doc_id").as("a"),
          (col("doc_id") + 1 + pmod(col("doc_id"), lit(3))).as("b"))
      Graph.connectedComponents(edges, "a", "b").orderBy("id")
    }),

    // ---- per-node triangles + local clustering coefficient; edges
    //      (a, a+1) ∪ (a, a+2) from the q64 source set, so CONSECUTIVE
    //      sources close triangles (the q64 gap-{1,3} graph is
    //      triangle-free — useless for this gate) ----
    "q442_clustering_coeff" -> ((s, d) => {
      val edges = Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(5)) < 2)
        .select(col("doc_id").as("a"),
          explode(array(col("doc_id") + 1, col("doc_id") + 2)).as("b"))
      Graph.clusteringCoefficient(edges, "a", "b")
    }),

    // ---- incremental CC maintenance: q64's graph split into a
    //      "history" batch (solved to an assignment first) and a
    //      "new" batch folded in via incrementalComponents — the
    //      result must equal from-scratch CC over the whole graph
    //      (same oracle as q64), while only touched components
    //      were re-solved ----
    "q302_incremental_components" -> ((s, d) => {
      val edges = Tables.documents(s, d)
        .where(pmod(col("doc_id"), lit(5)) < 2)
        .select(col("doc_id").as("a"),
          (col("doc_id") + 1 + pmod(col("doc_id"), lit(3))).as("b"))
      val oldE = edges.where(pmod(col("a"), lit(7)) =!= 0)
      val newE = edges.where(pmod(col("a"), lit(7)) === 0)
      val assign = Graph.connectedComponents(oldE, "a", "b")
      Graph.incrementalComponents(assign, "id", "comp", newE, "a", "b")
        .orderBy("id")
    }),

    // ---- Gopher-style repetition stats (dup-word / dup-bigram /
    //      top-bigram fractions) ----
    "q74_repetition" -> ((s, d) => {
      TextAnalysis.repetitionStats(Tables.documents(s, d), "text", "doc_id")
        .where(col("doc_id") < 40)
        .orderBy("doc_id")
    }),

    // ---- composite quality filter: keep/drop + failed-rule reasons ----
    "q75_quality_filter" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("qf", TextAnalysis.qualityFlags(col("text")))
        .select(col("doc_id"), col("qf.keep").as("keep"),
          col("qf.reasons").as("reasons"))
        .where(col("doc_id") < 60)
        .orderBy("doc_id")
    }),

    // ---- sliding-window chunking (training context windows) ----
    "q76_chunking" -> ((s, d) => {
      TextAnalysis.chunk(Tables.documents(s, d), "text", "doc_id",
          size = 8, stride = 4)
        .where(col("doc_id") < 25)
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- data-dependent mixture balancing: every source downsampled
    //      to the smallest source's size, md5-deterministic ----
    "q78_mixture_balance" -> ((s, d) => {
      Mixture.balance(Tables.documents(s, d), "doc_id", "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("source")
    }),

    // ---- end-to-end curation pipeline audit funnel: quality filter →
    //      exact dedup → decontamination → mixture balance, per-stage
    //      counts (probes = docs with doc_id % 7 = 0, as in q72) ----
    "q81_curation_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probes = docs.where(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("text").as("probe"))
      Curation.funnel(docs, "text", "doc_id", "source", probes, "probe",
          shingleN = 8)
        .orderBy("stage_ord")
    }),

    // ---- mergeable HLL distinct-token sketches: per-source + an ALL
    //      rollup from hll_union_agg (no second corpus pass). The
    //      oracle verifies the exact counts fully; `hll_ok` pins the
    //      5% estimate contract the Spark side must satisfy ----
    "q82_hll_distinct" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("t"))
      Sketches.hllToleranceReport(toks, "t", "source", lgK = 12, tol = 0.05)
        .orderBy("source")
    }),

    // ---- count-min-sketch heavy-hitter estimates: one distributed
    //      sketch, driver-side point reads; `cms_ok` pins the sketch's
    //      never-undercount guarantee against exact counts ----
    "q83_cms_heavyhitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("t"))
      val top = toks.groupBy("t").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t").asc).limit(5).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      Sketches.cmsEstimates(toks, "t", top.map(_._1).toSeq)
        .join(s.createDataFrame(top.toSeq).toDF("t", "c"), "t")
        .select(col("t").as("token"), (col("estimate") >= col("c")).as("cms_ok"))
        .orderBy("token")
    }),

    // ---- corpus vocabulary + per-doc out-of-vocabulary fraction ----
    "q79_oov" -> ((s, d) => {
      TextAnalysis.oovStats(Tables.documents(s, d), "text", "doc_id",
          vocabSize = 30)
        .where(col("doc_id") < 40)
        .orderBy("doc_id")
    }),

    // ---- real BPE: distributed merge learning + rank-greedy encode
    //      (the classic Sennrich low/lower/newest/widest corpus; the
    //      oracle pins the hand-derived merges and encodings) ----
    "q61_bpe_tokens" -> ((s, _) => {
      import s.implicits._
      val corpus = Seq(
        "low low low low low", "lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest").toDF("text")
      val merges = Bpe.learn(corpus, "text", numMerges = 5)
      val words = Seq("low", "lowest", "newest", "widest", "unknown").toDF("word")
      Bpe.tokenize(words, "word", merges)
        .select(col("word"),
          array_join(col("bpe_tokens"), " ").as("toks"),
          col("n_bpe_tokens").as("n"))
        .orderBy("word")
    }))

  // DuckDB helper fragments (kept in sync with graft.functions):
  //   hash h(i,s) = ('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT
  //   unsalted  h(s) = ('0x' || substr(md5(s), 1, 15))::BIGINT
  // q68's IVF quantizer unrolled through the `scored` CTE (train
  // sample, 2 k-means rounds, corpus assignment, 3-probe queries,
  // exact cosine) — shared by the q68 gate and the q167 recall audit.
  private val IvfScoredCtes: String =
    """WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          train AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT 262144),
          c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, v AS c
            FROM (SELECT vec_id, v FROM train ORDER BY vec_id LIMIT 8)),
          s1 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c0)) n),
          a1 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s1) WHERE rn = 1),
          c1 AS (
            SELECT c0.list, coalesce(nw.c, c0.c) AS c
            FROM c0 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a1 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s2 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c1)) n),
          a2 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s2) WHERE rn = 1),
          c2 AS (
            SELECT c1.list, coalesce(nw.c, c1.c) AS c
            FROM c1 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a2 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s3 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM emb e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c2)) n),
          a3 AS (
            SELECT vec_id AS neighbor_id, v AS cv, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s3) WHERE rn = 1),
          p3 AS (
            SELECT vec_id AS query_id, v AS qv, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s3 WHERE vec_id < 5) WHERE rn <= 3),
          scored AS (
            SELECT p.query_id, a.neighbor_id,
              list_sum(list_transform(range(1, 65), i -> p.qv[i] * a.cv[i])) /
              (sqrt(list_sum(list_transform(p.qv, x -> x * x))) *
               sqrt(list_sum(list_transform(a.cv, x -> x * x)))) AS cosine
            FROM p3 p JOIN a3 a USING (list)
            WHERE a.neighbor_id <> p.query_id)"""

  // q32's LSH derivation (bigram shingles, 16 hashes, 4 bands) through
  // exact-Jaccard verification at threshold 0.5 — shared by the q172
  // estimator audit and the q174 flow matrix (q32/q69/q166 predate the
  // extraction and carry the same text inline).
  private val LshVerifiedPairCtes: String =
    s"""WITH docs AS (
          SELECT doc_id AS id,
            list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
              i -> t[i] || ' ' || t[i+1])) AS sh
          FROM (SELECT doc_id, $Toks AS t FROM documents)),
        sigs AS (
          SELECT id, sh,
            list_transform(range(0, 16), i ->
              coalesce(list_min(list_transform(sh, s ->
                (((i * 2654435761) % 2147483646 + 1)
                   * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                 + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                9223372036854775807)) AS sig
          FROM docs WHERE len(sh) > 0),
        banded AS (
          SELECT id, sh, sig, b.b AS band,
            array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
              h -> CAST(h AS VARCHAR)), '_') AS bucket
          FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
        vpairs AS (
          SELECT id_a, id_b, jac FROM (
            SELECT id_a, id_b,
              CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                     len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
            FROM cand)
          WHERE jac >= 0.5)"""

  // PQ chain (m=4 subspaces, ksub=4 codes, dsub=16 dims): per-subspace
  // 2-round k-means on the md5 train sample + full-corpus encode —
  // shared by the q112 ADC gate and the q175 distortion report.
  private val PqM = 4
  private val PqKsub = 4
  private val PqDsub = 16
  private def pqD2(e: String, c: String): String =
    s"list_sum(list_transform(range(1, ${PqDsub + 1}), i -> ($e[i]-$c[i])*($e[i]-$c[i])))"
  private val PqSubChainCtes: String = (0 until PqM).map { j =>
    val a = j * PqDsub + 1; val b = (j + 1) * PqDsub
    s"""sub$j AS (SELECT vec_id, v[$a:$b] AS sv FROM train),
          c0_$j AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, sv AS c
            FROM (SELECT vec_id, sv FROM sub$j ORDER BY vec_id LIMIT $PqKsub)),""" +
      (1 to 2).map { t =>
        s"""
          s${t}_$j AS (
            SELECT e.vec_id, e.sv, n.code, ${pqD2("e.sv", "n.c")} AS d
            FROM sub$j e CROSS JOIN c${t - 1}_$j n),
          a${t}_$j AS (
            SELECT vec_id, sv, code FROM (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d ASC, code ASC) AS rn
              FROM s${t}_$j) WHERE rn = 1),
          c${t}_$j AS (
            SELECT p.code, coalesce(nw.c, p.c) AS c
            FROM c${t - 1}_$j p LEFT JOIN (
              SELECT code, list(mn ORDER BY pos) AS c FROM (
                SELECT a.code, t.i AS pos, avg(a.sv[t.i]) AS mn
                FROM a${t}_$j a, range(1, ${PqDsub + 1}) t(i)
                GROUP BY a.code, t.i)
              GROUP BY code) nw USING (code)),""" }.mkString +
      s"""
          enc$j AS (
            SELECT vec_id, code FROM (
              SELECT e.vec_id, n.code, row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY ${pqD2("e.sv", "n.c")} ASC, n.code ASC) AS rn
              FROM (SELECT vec_id, v[$a:$b] AS sv FROM emb) e
              CROSS JOIN c2_$j n) WHERE rn = 1)"""
  }.mkString(",\n          ")

  /** q335 oracle: the distributed BPE trainer's 6 merge rounds replayed
    * verbatim in SQL — pipe-wrapped token strings, weighted adjacent-
    * pair counts, (cnt DESC, a, b) argmax, non-overlapping left-to-right
    * `replace` per round (identical merge semantics in both engines;
    * the wrapping pipes anchor whole tokens and adjacent occurrences
    * never share consumed characters).
    */
  private val BpeMergeOracle: String = {
    val rounds = 1 to 6
    val stages = rounds.map { r =>
      s"""p$r AS MATERIALIZED (
            SELECT l[i] AS a, l[i+1] AS b, CAST(sum(f) AS BIGINT) AS cnt
            FROM (SELECT f, string_split(trim(w, '|'), '| |') AS l
                  FROM v${r - 1}),
                 LATERAL (SELECT unnest(generate_series(1, len(l) - 1))
                          AS i) u
            GROUP BY 1, 2),
          m$r AS MATERIALIZED (
            SELECT $r AS round, a, b, cnt FROM p$r
            ORDER BY cnt DESC, a, b LIMIT 1),
          v$r AS MATERIALIZED (
            SELECT f, replace(w, '|' || m.a || '| |' || m.b || '|',
                              '|' || m.a || m.b || '|') AS w
            FROM v${r - 1}, m$r m)"""
    }.mkString(",\n          ")
    val union = rounds.map(r => s"SELECT * FROM m$r").mkString(" UNION ALL ")
    s"""WITH v0 AS MATERIALIZED (
            SELECT CAST(count(*) AS BIGINT) AS f,
              rtrim(regexp_replace(word, '(.)', '|\\1| ', 'g')) AS w
            FROM (SELECT unnest($Toks) AS word FROM documents)
            GROUP BY word),
          $stages
         SELECT round, a AS left_tok, b AS right_tok, a || b AS merged,
           cnt AS pair_count
         FROM ($union) ORDER BY round"""
  }

  val oracle: Map[String, String] = Map(
    // the same peel unrolled: per-round common-neighbor support over
    // the canonical edge set, threshold k−2 = 2; one spare round past
    // the fixture's two-peel convergence (idempotent at fixpoint)
    "q368_ktruss" -> {
      val edgeRows = kTrussEdges
        .map { case (u, v) => s"($u, $v)" }.mkString(", ")
      def round(i: Int): String =
        s"""sym$i AS (SELECT u AS a, v AS b FROM e$i
              UNION ALL SELECT v, u FROM e$i),
          w$i AS (
            SELECT s1.a AS ua, s2.a AS va, count(*) AS cnt
            FROM sym$i s1 JOIN sym$i s2
              ON s1.b = s2.b AND s1.a < s2.a
            GROUP BY 1, 2),
          sup$i AS (
            SELECT e.u, e.v, CAST(coalesce(w.cnt, 0) AS BIGINT) AS sup
            FROM e$i e LEFT JOIN w$i w ON w.ua = e.u AND w.va = e.v),
          e${i + 1} AS (SELECT u, v FROM sup$i WHERE sup >= 2)"""
      s"""WITH e0(u, v) AS (VALUES $edgeRows),
          ${round(0)},
          ${round(1)},
          ${round(2)},
          ${round(3)}
         SELECT u, v, sup AS support FROM sup3 WHERE sup >= 2
         ORDER BY u, v"""
    },
    // the TwoNN distance grid feeding a per-probe majority vote;
    // vote ties break toward the smaller label
    "q405_knn_loo" ->
      """WITH pts AS MATERIALIZED (
            SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
              CAST(label AS BIGINT) AS lb
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          probes AS (
            SELECT id AS pid, v AS pv, lb AS true_label FROM pts
            ORDER BY ('0x' || substr(md5('knn:' || id), 1, 15))::BIGINT,
              id
            LIMIT 20),
          nn AS (
            SELECT pid, true_label, id, lb, d9 FROM (
              SELECT *, row_number() OVER (PARTITION BY pid
                ORDER BY d9, id) AS rn
              FROM (
                SELECT pr.pid, pr.true_label, p.id, p.lb,
                  CAST(floor(list_sum(list_transform(
                    generate_series(1, 64),
                    i -> (pr.pv[i] - p.v[i]) * (pr.pv[i] - p.v[i])))
                    * 1e9 + 0.5) AS BIGINT) AS d9
                FROM probes pr CROSS JOIN pts p WHERE p.id <> pr.pid))
            WHERE rn <= 3),
          voted AS (
            SELECT pid, true_label, lb, nv FROM (
              SELECT pid, true_label, lb, count(*) AS nv,
                row_number() OVER (PARTITION BY pid
                  ORDER BY count(*) DESC, lb ASC) AS vr
              FROM nn GROUP BY pid, true_label, lb)
            WHERE vr = 1),
          scored AS (
            SELECT pid AS probe_id, true_label, lb AS predicted_label,
              nv AS votes, true_label = lb AS correct
            FROM voted),
          acc AS (
            SELECT floor(CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
              AS panel_accuracy
            FROM scored)
         SELECT probe_id, true_label, predicted_label, votes, correct,
           panel_accuracy
         FROM scored, acc ORDER BY probe_id""",
    // three unrolled Lloyd rounds: 1e-9-grid distances with argmin
    // ties to the lower cluster, 1e-7-grid integer coordinate sums
    // for the order-free centroid update
    "q403_kmeans" -> {
      def assignCte(name: String, cents: String): String =
        s"""$name AS (
            SELECT id, v7, c, d9 FROM (
              SELECT *, row_number() OVER (PARTITION BY id
                ORDER BY d9, c) AS rn
              FROM (
                SELECT p.id, p.v7, cc.c,
                  CAST(floor(list_sum(list_transform(
                    generate_series(1, 64),
                    i -> (p.v[i] - cc.cv[i]) * (p.v[i] - cc.cv[i])))
                    * 1e9 + 0.5) AS BIGINT) AS d9
                FROM pts2 p CROSS JOIN $cents cc))
            WHERE rn = 1)"""
      def updateCte(r: Int): String =
        s"""u$r AS (
            SELECT c, dim, CAST(sum(x7) AS BIGINT) AS sx,
              count(*) AS nx
            FROM (
              SELECT c, i - 1 AS dim, v7[i] AS x7
              FROM a$r CROSS JOIN
                (SELECT unnest(generate_series(1, 64)) AS i))
            GROUP BY c, dim),
          c$r AS (
            SELECT pc.c, coalesce(nv.cvn, pc.cv) AS cv
            FROM c${r - 1} pc LEFT JOIN (
              SELECT c, list(CAST(sx AS DOUBLE) / nx / 1e7
                ORDER BY dim) AS cvn
              FROM u$r GROUP BY c) nv
            ON pc.c = nv.c)"""
      s"""WITH pts AS MATERIALIZED (
            SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          pts2 AS (
            SELECT id, v,
              list_transform(v, x -> CASE WHEN x >= 0
                THEN CAST(floor(x * 1e7 + 0.5) AS BIGINT)
                ELSE -CAST(floor(-x * 1e7 + 0.5) AS BIGINT) END) AS v7
            FROM pts),
          c0 AS (
            SELECT CAST(rn - 1 AS BIGINT) AS c, v AS cv FROM (
              SELECT v, row_number() OVER (ORDER BY
                ('0x' || substr(md5('km:' || id), 1, 15))::BIGINT, id)
                AS rn
              FROM pts2)
            WHERE rn <= 4),
          ${assignCte("a1", "c0")},
          ${updateCte(1)},
          ${assignCte("a2", "c1")},
          ${updateCte(2)},
          ${assignCte("a3", "c2")},
          ${updateCte(3)},
          ${assignCte("a4", "c3")}
         SELECT c AS cluster, count(*) AS n_points,
           floor(CAST(sum(d9) AS BIGINT) / 1e9 * 1e6 + 0.5) / 1e6
             AS inertia
         FROM a4 GROUP BY c ORDER BY cluster"""
    },
    // five unrolled greedy rounds; per-round gains are pure integer
    // counts, argmax ties to the smaller doc id
    "q400_coverage_select" -> {
      def cRound(r: Int): String =
        s"""g$r AS (SELECT doc, count(*) AS g FROM pairs
            JOIN u${r - 1} USING (sh) GROUP BY doc),
          sel$r AS (SELECT doc, g, $r AS round FROM g$r
            ORDER BY g DESC, doc ASC LIMIT 1),
          u$r AS (SELECT sh FROM u${r - 1} WHERE sh NOT IN (
            SELECT pairs.sh FROM pairs
            JOIN sel$r ON pairs.doc = sel$r.doc))"""
      s"""WITH pairs AS MATERIALIZED (
            SELECT DISTINCT doc_id AS doc, sh FROM (
              SELECT doc_id, unnest(list_transform(
                range(1, greatest(len(t) - 2, 0) + 1),
                i -> array_to_string(t[i:i+2], ' '))) AS sh
              FROM (SELECT doc_id, $Toks AS t FROM documents))),
          u0 AS (SELECT DISTINCT sh FROM pairs),
          ${cRound(1)},
          ${cRound(2)},
          ${cRound(3)},
          ${cRound(4)},
          ${cRound(5)}
         SELECT round, doc AS doc_id, g AS gain,
           CAST(sum(g) OVER (ORDER BY round ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS BIGINT) AS covered_total
         FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
           UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
           UNION ALL SELECT * FROM sel5)
         ORDER BY round"""
    },
    // the TwoNN distance discipline (1e-9 squared-distance grid, IEEE
    // sqrt) through the full 2-hop LOF expansion
    "q399_lof" -> {
      def knnCte(name: String, qSrc: String): String =
        s"""$name AS (
            SELECT qid, id, d9,
              row_number() OVER (PARTITION BY qid ORDER BY d9, id)
                AS rn
            FROM (
              SELECT q.qid, p.id,
                CAST(floor(list_sum(list_transform(
                  generate_series(1, 64),
                  i -> (q.qv[i] - p.v[i]) * (q.qv[i] - p.v[i])))
                  * 1e9 + 0.5) AS BIGINT) AS d9
              FROM $qSrc q CROSS JOIN pts p WHERE p.id <> q.qid)),
          ${name}f AS (SELECT * FROM $name WHERE rn <= 3)"""
      s"""WITH pts AS MATERIALIZED (
            SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          probes AS (
            SELECT id AS qid, v AS qv FROM pts
            ORDER BY ('0x' || substr(md5('lof:' || id), 1, 15))::BIGINT,
              id
            LIMIT 10),
          ${knnCte("nn0", "probes")},
          q1 AS (
            SELECT pts.id AS qid, pts.v AS qv FROM pts
            JOIN (SELECT DISTINCT id FROM nn0f) s1 ON pts.id = s1.id),
          ${knnCte("nn1", "q1")},
          q2 AS (
            SELECT pts.id AS qid, pts.v AS qv FROM pts
            JOIN (SELECT DISTINCT id FROM nn1f) s2 ON pts.id = s2.id),
          ${knnCte("nn2", "q2")},
          dk1 AS (SELECT qid AS n1, CAST(max(d9) AS BIGINT) AS dka
            FROM nn1f GROUP BY qid),
          dk2 AS (SELECT qid AS n2, CAST(max(d9) AS BIGINT) AS dkb
            FROM nn2f GROUP BY qid),
          r1 AS (
            SELECT nn1f.qid,
              CAST(floor(greatest(sqrt(CAST(dkb AS DOUBLE) / 1e9),
                sqrt(CAST(d9 AS DOUBLE) / 1e9)) * 1e9 + 0.5) AS BIGINT)
                AS r9
            FROM nn1f JOIN dk2 ON nn1f.id = dk2.n2),
          lrd1 AS (
            SELECT oid, CASE WHEN sr > 0 THEN
              1 / (CAST(sr AS DOUBLE) / 1e9 / 3) END AS lrdo
            FROM (SELECT qid AS oid, CAST(sum(r9) AS BIGINT) AS sr
              FROM r1 GROUP BY qid)),
          r0 AS (
            SELECT nn0f.qid,
              CAST(floor(greatest(sqrt(CAST(dka AS DOUBLE) / 1e9),
                sqrt(CAST(d9 AS DOUBLE) / 1e9)) * 1e9 + 0.5) AS BIGINT)
                AS r9
            FROM nn0f JOIN dk1 ON nn0f.id = dk1.n1),
          lrd0 AS (
            SELECT pid, CASE WHEN sr > 0 THEN
              1 / (CAST(sr AS DOUBLE) / 1e9 / 3) END AS lrdp
            FROM (SELECT qid AS pid, CAST(sum(r9) AS BIGINT) AS sr
              FROM r0 GROUP BY qid)),
          folded AS (
            SELECT nn0f.qid,
              CAST(sum(CAST(floor(lrdo * 1e9 + 0.5) AS BIGINT))
                AS BIGINT) AS sl,
              count(lrdo) AS nc
            FROM nn0f JOIN lrd1 ON nn0f.id = lrd1.oid
            GROUP BY nn0f.qid)
         SELECT f.qid AS probe_id, 3 AS k,
           CASE WHEN lrdp IS NOT NULL THEN
             floor(lrdp * 1e6 + 0.5) / 1e6 END AS lrd,
           CASE WHEN lrdp IS NOT NULL AND nc = 3 THEN
             floor(CAST(sl AS DOUBLE) / 1e9 / 3 / lrdp * 1e4 + 0.5)
               / 1e4 END AS lof
         FROM folded f JOIN lrd0 l ON f.qid = l.pid
         ORDER BY probe_id"""
    },
    // per-threshold recursive-CTE closures over the shared verified
    // LSH pair set; jaccard compares are exact rationals
    "q396_percolation" -> {
      def tBlock(i: Int, t: String): String =
        s"""u$i AS (
            SELECT id_a AS a, id_b AS b FROM vpairs WHERE jac >= $t
            UNION SELECT id_b, id_a FROM vpairs WHERE jac >= $t),
          reach$i(id, r) AS (
            SELECT a AS id, a AS r FROM u$i
            UNION
            SELECT u$i.a AS id, reach$i.r AS r
            FROM u$i JOIN reach$i ON u$i.b = reach$i.id),
          comp$i AS (SELECT id, min(r) AS comp FROM reach$i
            GROUP BY id),
          sz$i AS (SELECT comp, count(*) AS sz FROM comp$i
            GROUP BY comp),
          stat$i AS (
            SELECT CAST($t AS DOUBLE) AS threshold,
              CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_nodes,
              CAST(count(*) AS BIGINT) AS n_components,
              CAST(coalesce(max(sz), 0) AS BIGINT)
                AS largest_component
            FROM sz$i)"""
      s"""${LshVerifiedPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
          ${tBlock(1, "0.5")},
          ${tBlock(2, "0.7")},
          ${tBlock(3, "0.9")}
         SELECT * FROM (
           SELECT * FROM stat1
           UNION ALL SELECT * FROM stat2
           UNION ALL SELECT * FROM stat3)
         ORDER BY threshold"""
    },
    // pure integer node/edge counting per degree threshold over the
    // canonical undirected edge set
    "q393_rich_club" ->
      """WITH e0 AS (
            SELECT doc_id % 50 AS a, (doc_id * 13 + 7) % 50 AS b
            FROM documents WHERE doc_id < 300),
          und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
            FROM e0 WHERE a <> b),
          deg AS (
            SELECT id, count(*) AS d
            FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und)
            GROUP BY id),
          ks(k) AS (VALUES (2), (4), (6), (8), (10)),
          nodes AS (
            SELECT k, count(*) AS n_nodes FROM deg, ks WHERE d > k
            GROUP BY k),
          wd AS (
            SELECT du.d AS du, dv.d AS dv
            FROM und JOIN deg du ON du.id = und.u
            JOIN deg dv ON dv.id = und.v),
          edges2 AS (
            SELECT k, count(*) AS n_edges FROM wd, ks
            WHERE du > k AND dv > k GROUP BY k)
         SELECT ks.k, CAST(coalesce(n_nodes, 0) AS BIGINT) AS n_nodes,
           CAST(coalesce(n_edges, 0) AS BIGINT) AS n_edges,
           CASE WHEN coalesce(n_nodes, 0) >= 2 THEN
             floor(CAST(2 * coalesce(n_edges, 0) AS DOUBLE)
               / CAST(n_nodes * (n_nodes - 1) AS DOUBLE) * 1e6 + 0.5)
               / 1e6 END AS phi
         FROM ks LEFT JOIN nodes USING (k) LEFT JOIN edges2 USING (k)
         ORDER BY k""",
    // exact integer counts; d = 0.75 is dyadic so the probability
    // algebra replays bit-identically
    "q379_kneser_ney" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM documents),
          bg AS (
            SELECT unnest(list_transform(
              range(1, greatest(len(t) - 1, 0) + 1),
              i -> t[i] || ' ' || t[i + 1])) AS b
            FROM d),
          c2 AS (
            SELECT split_part(b, ' ', 1) AS v,
              split_part(b, ' ', 2) AS w, count(*) AS cvw
            FROM bg GROUP BY 1, 2),
          cv AS (SELECT v, CAST(sum(cvw) AS BIGINT) AS cvt,
            count(*) AS n1v FROM c2 GROUP BY v),
          cw AS (SELECT w, count(*) AS n1w FROM c2 GROUP BY w),
          nbt AS (SELECT count(*) AS nb FROM c2),
          calc AS (
            SELECT c2.v, c2.w, CAST(c2.cvw AS BIGINT) AS c_vw,
              cv.cvt AS c_v,
              greatest(CAST(c2.cvw AS DOUBLE) - 0.75, 0) / cv.cvt
                AS p_disc_r,
              0.75 * cv.n1v / cv.cvt AS lam_r,
              CAST(cw.n1w AS DOUBLE) / nbt.nb AS p_cont_r
            FROM c2 JOIN cv USING (v) JOIN cw USING (w) CROSS JOIN nbt),
          ranked AS (
            SELECT *, row_number() OVER (ORDER BY c_vw DESC, v, w)
              AS pos
            FROM calc)
         SELECT pos, v, w, c_vw, c_v,
           floor(p_disc_r * 1e6 + 0.5) / 1e6 AS p_disc,
           floor(lam_r * 1e6 + 0.5) / 1e6 AS lambda,
           floor(p_cont_r * 1e6 + 0.5) / 1e6 AS p_cont,
           floor((p_disc_r + lam_r * p_cont_r) * 1e6 + 0.5) / 1e6 AS p_kn
         FROM ranked WHERE pos <= 20 ORDER BY pos""",
    // weighted PageRank over the window-2 co-occurrence grid, three
    // unrolled iterations; contributions quantize to 1e-12 longs
    // pre-sum and the damping constants are the Scala doubles
    "q369_textrank" -> {
      val d1 = 1d - 0.85
      s"""WITH dt AS (
            SELECT list_filter($Toks, w -> len(w) >= 3) AS ft
            FROM documents),
          pairs AS (
            SELECT unnest(list_transform(
                range(1, greatest(len(ft) - 1, 0) + 1),
                i -> struct_pack(a := ft[i], b := ft[i + 1]))) AS pr
            FROM dt
            UNION ALL
            SELECT unnest(list_transform(
                range(1, greatest(len(ft) - 2, 0) + 1),
                i -> struct_pack(a := ft[i], b := ft[i + 2]))) AS pr
            FROM dt),
          p2 AS (SELECT pr.a AS x, pr.b AS y FROM pairs
            WHERE pr.a <> pr.b),
          und AS (
            SELECT least(x, y) AS wa, greatest(x, y) AS wb,
              count(*) AS wt
            FROM p2 GROUP BY 1, 2),
          sym AS (SELECT wa AS src, wb AS dst, wt FROM und
            UNION ALL SELECT wb, wa, wt FROM und),
          str AS (SELECT src, CAST(sum(wt) AS BIGINT) AS s
            FROM sym GROUP BY src),
          syms AS (SELECT sym.src, sym.dst, sym.wt, str.s
            FROM sym JOIN str USING (src)),
          nodes AS (SELECT DISTINCT src AS id FROM sym),
          r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
          r1 AS (
            SELECT n.id, $d1 + 0.85 *
              (CAST(coalesce(c.s12, 0) AS DOUBLE) / 1e12) AS rank
            FROM nodes n LEFT JOIN (
              SELECT dst, CAST(sum(CAST(floor(rank * wt / s * 1e12 + 0.5)
                AS BIGINT)) AS BIGINT) AS s12
              FROM syms JOIN r0 ON syms.src = r0.id GROUP BY dst) c
            ON n.id = c.dst),
          r2 AS (
            SELECT n.id, $d1 + 0.85 *
              (CAST(coalesce(c.s12, 0) AS DOUBLE) / 1e12) AS rank
            FROM nodes n LEFT JOIN (
              SELECT dst, CAST(sum(CAST(floor(rank * wt / s * 1e12 + 0.5)
                AS BIGINT)) AS BIGINT) AS s12
              FROM syms JOIN r1 ON syms.src = r1.id GROUP BY dst) c
            ON n.id = c.dst),
          r3 AS (
            SELECT n.id, $d1 + 0.85 *
              (CAST(coalesce(c.s12, 0) AS DOUBLE) / 1e12) AS rank
            FROM nodes n LEFT JOIN (
              SELECT dst, CAST(sum(CAST(floor(rank * wt / s * 1e12 + 0.5)
                AS BIGINT)) AS BIGINT) AS s12
              FROM syms JOIN r2 ON syms.src = r2.id GROUP BY dst) c
            ON n.id = c.dst),
          ranked AS (
            SELECT row_number() OVER (ORDER BY rank DESC, id ASC)
                AS pos, id AS word,
              floor(rank * 1e6 + 0.5) / 1e6 AS rank
            FROM r3)
         SELECT pos, word, rank FROM ranked WHERE pos <= 15
         ORDER BY pos"""
    },
    // attribute-partition conductance over the shared verified LSH
    // pair set: pure integer edge counting, 1e-6 floor-grid ratio
    "q341_source_conductance" ->
      s"""$LshVerifiedPairCtes,
          tagged AS (
            SELECT v.id_a, v.id_b, da.source AS ga, db.source AS gb
            FROM vpairs v
            JOIN documents da ON da.doc_id = v.id_a
            JOIN documents db ON db.doc_id = v.id_b),
          contrib AS (
            SELECT ga AS attr,
              CASE WHEN ga = gb THEN 1 ELSE 0 END AS w,
              CASE WHEN ga = gb THEN 0 ELSE 1 END AS c
            FROM tagged
            UNION ALL
            SELECT gb, 0, 1 FROM tagged WHERE ga <> gb),
          per AS (
            SELECT attr, CAST(sum(w) AS BIGINT) AS within_edges,
              CAST(sum(c) AS BIGINT) AS cut_edges
            FROM contrib GROUP BY attr),
          tot AS (SELECT CAST(2 * count(*) AS BIGINT) AS tv FROM tagged),
          counts AS (
            SELECT source AS attr, count(*) AS n_nodes FROM documents
            GROUP BY source),
          wide AS (
            SELECT c2.attr, c2.n_nodes,
              coalesce(p.within_edges, 0) AS within_edges,
              coalesce(p.cut_edges, 0) AS cut_edges,
              coalesce(p.within_edges, 0) * 2 + coalesce(p.cut_edges, 0)
                AS volume, t.tv
            FROM counts c2 LEFT JOIN per p ON p.attr = c2.attr
            CROSS JOIN tot t)
         SELECT attr, n_nodes, within_edges, cut_edges, volume,
           CASE WHEN volume > 0 AND tv - volume > 0 THEN
             floor(CAST(cut_edges AS DOUBLE) / least(volume, tv - volume)
               * 1e6 + 0.5) / 1e6 END AS conductance
         FROM wide ORDER BY attr""",
    // Hopkins replay: same md5 probe selection, 2^-40-grid uniforms in
    // the per-dim bounds, ordered-fold L2², per-probe NN min quantized
    // to 1e-9 integers before the two m-term sums
    "q342_hopkins" ->
      """WITH pts AS MATERIALIZED (
            SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          bounds AS (
            SELECT i AS dim, min(v[i]) AS mn, max(v[i]) AS mx
            FROM pts,
                 LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
            GROUP BY i),
          synthc AS (
            SELECT pr.pid, b.dim,
              b.mn + (('0x' || substr(md5('hopsyn:' || pr.pid || ':'
                  || (b.dim - 1)), 1, 15))::BIGINT % 1099511627776)
                / 1099511627776.0 * (b.mx - b.mn) AS x
            FROM (SELECT unnest(generate_series(1, 20)) AS pid) pr
            CROSS JOIN bounds b),
          synth AS (
            SELECT pid, list(x ORDER BY dim) AS pv FROM synthc
            GROUP BY pid),
          realp AS (
            SELECT id AS pid, v AS pv FROM pts
            ORDER BY ('0x' || substr(md5('hop:' || id), 1, 15))::BIGINT,
              id
            LIMIT 20),
          du AS (
            SELECT s.pid,
              list_sum(list_transform(generate_series(1, 64),
                i -> (s.pv[i] - p.v[i]) * (s.pv[i] - p.v[i]))) AS d2
            FROM synth s CROSS JOIN pts p),
          dw AS (
            SELECT r.pid,
              list_sum(list_transform(generate_series(1, 64),
                i -> (r.pv[i] - p.v[i]) * (r.pv[i] - p.v[i]))) AS d2
            FROM realp r CROSS JOIN pts p WHERE p.id <> r.pid),
          un AS (SELECT pid, min(d2) AS nn FROM du GROUP BY pid),
          wn AS (SELECT pid, min(d2) AS nn FROM dw GROUP BY pid),
          us AS (
            SELECT CAST(sum(CAST(floor(nn * 1e9 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_u9 FROM un),
          ws AS (
            SELECT CAST(sum(CAST(floor(nn * 1e9 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_w9 FROM wn),
          nv AS (SELECT count(*) AS n_vecs FROM pts)
         SELECT CAST(20 AS BIGINT) AS m, n_vecs, sum_u9, sum_w9,
           CASE WHEN sum_u9 + sum_w9 > 0 THEN
             floor(CAST(sum_u9 AS DOUBLE) / (sum_u9 + sum_w9)
               * 1e6 + 0.5) / 1e6 END AS hopkins
         FROM us, ws, nv""",
    "q335_bpe_merges" -> BpeMergeOracle,
    // Fisher separability replay: 1e-7-grid coordinates, HUGEINT
    // squares, per-(class,dim) terms re-gridded to 1e-9 integers
    "q358_class_separability" ->
      """WITH pts AS MATERIALIZED (
            SELECT label AS l,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          cells AS (
            SELECT l, i AS p,
              CAST(CASE WHEN v[i] >= 0 THEN floor(v[i] * 1e7 + 0.5)
                ELSE -floor(-v[i] * 1e7 + 0.5) END AS BIGINT) AS x7
            FROM pts,
                 LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u),
          perLD AS (
            SELECT l, p, count(*) AS n, CAST(sum(x7) AS BIGINT) AS s,
              CAST(sum(CAST(x7 AS HUGEINT) * x7) AS HUGEINT) AS q
            FROM cells GROUP BY 1, 2),
          perD AS (
            SELECT p, CAST(sum(n) AS BIGINT) AS nn,
              CAST(sum(s) AS BIGINT) AS gs
            FROM perLD GROUP BY p),
          terms AS (
            SELECT ld.l, ld.n,
              CAST(floor((CAST(ld.q AS DOUBLE)
                - CAST(ld.s AS DOUBLE) * ld.s / ld.n) / 1e14 * 1e9 + 0.5)
                AS BIGINT) AS w9,
              CAST(floor(ld.n
                * (CAST(ld.s AS DOUBLE) / ld.n / 1e7
                   - CAST(d.gs AS DOUBLE) / d.nn / 1e7)
                * (CAST(ld.s AS DOUBLE) / ld.n / 1e7
                   - CAST(d.gs AS DOUBLE) / d.nn / 1e7)
                * 1e9 + 0.5) AS BIGINT) AS b9
            FROM perLD ld JOIN perD d USING (p)),
          perClass AS (
            SELECT l, max(n) AS n_vecs, CAST(sum(w9) AS BIGINT) AS w9s,
              CAST(sum(b9) AS BIGINT) AS b9s
            FROM terms GROUP BY l),
          tot AS (
            SELECT CAST(sum(w9s) AS BIGINT) AS w,
              CAST(sum(b9s) AS BIGINT) AS b
            FROM perClass)
         SELECT l AS label, n_vecs,
           floor(CAST(w9s AS DOUBLE) / 1e9 / n_vecs * 1e6 + 0.5) / 1e6
             AS within_var,
           floor(CAST(b9s AS DOUBLE) / 1e9 / n_vecs * 1e6 + 0.5) / 1e6
             AS centroid_d2,
           CASE WHEN w > 0 THEN
             floor(CAST(b AS DOUBLE) / w * 1e6 + 0.5) / 1e6 END
             AS fisher_ratio
         FROM perClass, tot ORDER BY label""",
    // q358's grids extended: per-point centroid distances and
    // centroid gaps 1e-9-quantized pre-sum; DB mean folds 1e-9-grid
    // components; CH from the same trW/trB integers
    "q437_cluster_validity" ->
      """WITH pts AS MATERIALIZED (
            SELECT vec_id AS id, label AS l,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          cells AS MATERIALIZED (
            SELECT id, l, i AS p,
              CAST(CASE WHEN v[i] >= 0 THEN floor(v[i] * 1e7 + 0.5)
                ELSE -floor(-v[i] * 1e7 + 0.5) END AS BIGINT) AS x7
            FROM pts,
                 LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u),
          perLD AS MATERIALIZED (
            SELECT l, p, count(*) AS n, CAST(sum(x7) AS BIGINT) AS s,
              CAST(sum(CAST(x7 AS HUGEINT) * x7) AS HUGEINT) AS q
            FROM cells GROUP BY 1, 2),
          perD AS (
            SELECT p, CAST(sum(n) AS BIGINT) AS nn,
              CAST(sum(s) AS BIGINT) AS gs
            FROM perLD GROUP BY p),
          scat AS (
            SELECT l, max(n) AS n_vecs, CAST(sum(w9) AS BIGINT) AS w9s,
              CAST(sum(b9) AS BIGINT) AS b9s
            FROM (
              SELECT ld.l, ld.n,
                CAST(floor((CAST(ld.q AS DOUBLE)
                  - CAST(ld.s AS DOUBLE) * ld.s / ld.n) / 1e14 * 1e9
                  + 0.5) AS BIGINT) AS w9,
                CAST(floor(ld.n
                  * (CAST(ld.s AS DOUBLE) / ld.n / 1e7
                     - CAST(d.gs AS DOUBLE) / d.nn / 1e7)
                  * (CAST(ld.s AS DOUBLE) / ld.n / 1e7
                     - CAST(d.gs AS DOUBLE) / d.nn / 1e7)
                  * 1e9 + 0.5) AS BIGINT) AS b9
              FROM perLD ld JOIN perD d USING (p))
            GROUP BY l),
          tot AS (
            SELECT CAST(sum(w9s) AS BIGINT) AS w,
              CAST(sum(b9s) AS BIGINT) AS b,
              CAST(sum(n_vecs) AS BIGINT) AS nt,
              CAST(count(*) AS BIGINT) AS k
            FROM scat),
          cent AS MATERIALIZED (
            SELECT l, p, CAST(s AS DOUBLE) / n AS mu7 FROM perLD),
          dists AS (
            SELECT c.id, c.l,
              CAST(sum(CAST(floor((c.x7 - ct.mu7) * (c.x7 - ct.mu7)
                / 1e14 * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sq9
            FROM cells c JOIN cent ct ON c.l = ct.l AND c.p = ct.p
            GROUP BY c.id, c.l),
          sid AS (
            SELECT l, CAST(sum(d9) AS DOUBLE) / 1e9 / count(*) AS si
            FROM (SELECT l, CAST(floor(sqrt(CAST(sq9 AS DOUBLE) / 1e9)
              * 1e9 + 0.5) AS BIGINT) AS d9 FROM dists)
            GROUP BY l),
          gaps AS (
            SELECT a.l AS li, b.l AS lj,
              CAST(sum(CAST(floor((a.mu7 - b.mu7) * (a.mu7 - b.mu7)
                / 1e14 * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS m9
            FROM cent a JOIN cent b ON a.p = b.p AND a.l <> b.l
            GROUP BY a.l, b.l),
          rmax AS (
            SELECT li AS l,
              CAST(floor(max(r) * 1e9 + 0.5) AS BIGINT) AS rmax9
            FROM (
              SELECT g.li,
                CASE WHEN g.m9 > 0 THEN (sa.si + sb.si)
                  / sqrt(CAST(g.m9 AS DOUBLE) / 1e9) END AS r
              FROM gaps g JOIN sid sa ON g.li = sa.l
                JOIN sid sb ON g.lj = sb.l)
            GROUP BY li),
          db AS (
            SELECT CAST(sum(rmax9) AS DOUBLE) / 1e9 / count(*) AS db
            FROM rmax)
         SELECT s.l AS label, s.n_vecs,
           floor(sid.si * 1e6 + 0.5) / 1e6 + 0.0 AS scatter,
           floor(CAST(r.rmax9 AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 + 0.0
             AS db_component,
           floor(db.db * 1e6 + 0.5) / 1e6 + 0.0 AS db_index,
           CASE WHEN t.k > 1 AND t.w > 0 AND t.nt > t.k THEN
             floor((CAST(t.b AS DOUBLE)
                 / (CASE WHEN t.k > 1
                   THEN CAST(t.k - 1 AS DOUBLE) END))
               / ((CASE WHEN t.w > 0 THEN CAST(t.w AS DOUBLE) END)
                 / (CASE WHEN t.nt > t.k
                   THEN CAST(t.nt - t.k AS DOUBLE) END))
               * 1e4 + 0.5) / 1e4 + 0.0
           END AS ch_index
         FROM scat s JOIN sid ON s.l = sid.l JOIN rmax r ON s.l = r.l
         CROSS JOIN tot t CROSS JOIN db
         ORDER BY label""",
    // Theil's U replay: three 1e-6-quantized c·ln c sums, + 0.0 to
    // fold a −0.0 MI (the r7 footgun)
    "q359_theils_u" ->
      """WITH base AS (
            SELECT source AS x, lang AS y, count(*) AS c FROM documents
            WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
          a AS (
            SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(c) * 1e6
              + 0.5) AS BIGINT)) AS BIGINT) AS la,
              CAST(sum(c) AS BIGINT) AS n
            FROM base),
          b AS (
            SELECT CAST(sum(CAST(floor(CAST(nx AS DOUBLE) * ln(nx) * 1e6
              + 0.5) AS BIGINT)) AS BIGINT) AS lb
            FROM (SELECT x, CAST(sum(c) AS BIGINT) AS nx FROM base
                  GROUP BY x)),
          cc AS (
            SELECT CAST(sum(CAST(floor(CAST(ny AS DOUBLE) * ln(ny) * 1e6
              + 0.5) AS BIGINT)) AS BIGINT) AS lc
            FROM (SELECT y, CAST(sum(c) AS BIGINT) AS ny FROM base
                  GROUP BY y)),
          calc AS (
            SELECT n,
              ln(CAST(n AS DOUBLE)) - CAST(lc AS DOUBLE) / 1e6 / n AS hy,
              (CAST(lb AS DOUBLE) - CAST(la AS DOUBLE)) / 1e6 / n AS hyx
            FROM a, b, cc)
         SELECT n,
           CASE WHEN hy >= 0 THEN floor(hy * 1e6 + 0.5)
             ELSE -floor(-hy * 1e6 + 0.5) END / 1e6 + 0.0 AS h_y,
           CASE WHEN hyx >= 0 THEN floor(hyx * 1e6 + 0.5)
             ELSE -floor(-hyx * 1e6 + 0.5) END / 1e6 + 0.0
             AS h_y_given_x,
           CASE WHEN hy - hyx >= 0 THEN floor((hy - hyx) * 1e6 + 0.5)
             ELSE -floor(-(hy - hyx) * 1e6 + 0.5) END / 1e6 + 0.0 AS mi,
           CASE WHEN hy > 0 THEN
             CASE WHEN (hy - hyx) / hy >= 0
               THEN floor((hy - hyx) / hy * 1e6 + 0.5)
               ELSE -floor(-((hy - hyx) / hy) * 1e6 + 0.5) END / 1e6
               + 0.0
           END AS u
         FROM calc""",
    // TwoNN replay: md5 probes, 1e-9-grid squared distances ranked
    // with (d9, id) ties, ln of the 1e-6-gridded ratio quantized to
    // 1e-9 integers, factor-2 MLE for squared distances
    "q357_twonn_dim" ->
      """WITH pts AS MATERIALIZED (
            SELECT vec_id AS id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
            WHERE len(embedding) = 64
              AND len(list_filter(embedding, x -> isnan(x))) = 0),
          probes AS (
            SELECT id AS pid, v AS pv FROM pts
            ORDER BY ('0x' || substr(md5('twonn:' || id), 1, 15))::BIGINT,
              id
            LIMIT 30),
          dists AS (
            SELECT pr.pid, p.id,
              CAST(floor(list_sum(list_transform(generate_series(1, 64),
                i -> (pr.pv[i] - p.v[i]) * (pr.pv[i] - p.v[i])))
                * 1e9 + 0.5) AS BIGINT) AS d9
            FROM probes pr CROSS JOIN pts p WHERE p.id <> pr.pid),
          rk AS (
            SELECT pid, d9,
              row_number() OVER (PARTITION BY pid ORDER BY d9, id) AS rn
            FROM dists),
          mu AS (
            SELECT pid, min(CASE WHEN rn = 1 THEN d9 END) AS d1,
              min(CASE WHEN rn = 2 THEN d9 END) AS d2
            FROM rk WHERE rn <= 2 GROUP BY pid),
          lnm AS (
            SELECT CAST(floor(ln(
                floor(CAST(d2 AS DOUBLE) / d1 * 1e6 + 0.5) / 1e6)
                * 1e9 + 0.5) AS BIGINT) AS l9
            FROM mu WHERE d1 > 0 AND d2 IS NOT NULL)
         SELECT CAST(30 AS BIGINT) AS m_probes,
           CAST(count(*) AS BIGINT) AS n_used,
           CASE WHEN CAST(sum(l9) AS BIGINT) > 0 THEN
             floor(CAST(count(*) AS DOUBLE) * 2
               / (CAST(sum(l9) AS BIGINT) / 1e9) * 1e4 + 0.5) / 1e4
           END AS id_mle
         FROM lnm""",
    // boundary-seam equi-join on the k-token head/tail strings
    "q350_doc_stitching" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          f AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
          heads AS (
            SELECT doc_id AS b_id, array_to_string(t[1:3], ' ') AS seam
            FROM f),
          tails AS (
            SELECT doc_id AS a_id,
              array_to_string(t[len(t)-2:len(t)], ' ') AS seam
            FROM f)
         SELECT a_id, b_id, seam FROM tails JOIN heads USING (seam)
         WHERE a_id <> b_id ORDER BY a_id, b_id""",
    // RAKE replay: gaps-and-islands phrase split at the marker-word
    // stopset, integer deg/freq, 1e-6-grid word scores summed as
    // integers per phrase, (score, phrase) rank
    "q347_rake_keyphrases" -> {
      val stopList = TextAnalysis.markerWords.values.flatten.toSeq
        .distinct.sorted.map(w => s"'$w'").mkString(", ")
      s"""WITH tok AS (
            SELECT doc_id, u.i, t[u.i] AS w
            FROM (SELECT doc_id, $Toks AS t FROM documents),
                 LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) u),
          isl AS (
            SELECT doc_id, i, w,
              CAST(sum(CASE WHEN w IN ($stopList) THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY i
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS grp,
              w IN ($stopList) AS stop
            FROM tok),
          ph AS (
            SELECT array_to_string(ws, ' ') AS phrase, ws
            FROM (SELECT doc_id, grp, list(w ORDER BY i) AS ws
                  FROM isl WHERE NOT stop GROUP BY doc_id, grp)
            WHERE len(ws) <= 4),
          words AS (
            SELECT u.w,
              CAST(floor(CAST(sum(len(ph.ws)) AS DOUBLE) / count(*)
                * 1e6 + 0.5) AS BIGINT) AS ws6
            FROM ph, LATERAL (SELECT unnest(ph.ws) AS w) u
            GROUP BY u.w),
          dp AS (
            SELECT phrase, count(*) AS n_occurrences FROM ph
            GROUP BY phrase),
          scored AS (
            SELECT d.phrase, d.n_occurrences,
              CAST(sum(ws.ws6) AS BIGINT) AS p6
            FROM dp d,
                 LATERAL (SELECT unnest(string_split(d.phrase, ' '))
                          AS w) u
            JOIN words ws ON ws.w = u.w
            GROUP BY 1, 2),
          ranked AS (
            SELECT *, CAST(row_number() OVER (ORDER BY p6 DESC, phrase)
              AS INT) AS rank
            FROM scored)
         SELECT rank, phrase, n_occurrences,
           CAST(p6 AS DOUBLE) / 1e6 AS score
         FROM ranked WHERE rank <= 15 ORDER BY rank"""
    },
    // randomized-response replay: the same md5 coin, 0.75/0.25 flip,
    // debiased share (obs − 0.25)/0.5 on the 1e-6 grid
    "q348_randomized_response" ->
      """WITH base AS (
            SELECT source AS grp,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t,
              (('0x' || substr(md5('rr:' || doc_id), 1, 15))::BIGINT
                % 1099511627776) / 1099511627776.0 AS coin
            FROM documents),
          rep AS (
            SELECT grp, t,
              CASE WHEN coin < 0.75 THEN t ELSE 1 - t END AS r
            FROM base),
          agg AS (
            SELECT grp, count(*) AS n, CAST(sum(r) AS BIGINT)
              AS reported_yes, CAST(sum(t) AS BIGINT) AS ty
            FROM rep GROUP BY grp)
         SELECT grp AS "group", n, reported_yes,
           floor(CAST(reported_yes AS DOUBLE) / n * 1e6 + 0.5) / 1e6
             AS reported_share,
           CASE WHEN (CAST(reported_yes AS DOUBLE) / n - 0.25) / 0.5 >= 0
             THEN floor((CAST(reported_yes AS DOUBLE) / n - 0.25) / 0.5
               * 1e6 + 0.5)
             ELSE -floor(-((CAST(reported_yes AS DOUBLE) / n - 0.25)
               / 0.5) * 1e6 + 0.5) END / 1e6 AS est_share,
           floor(CAST(ty AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS true_share
         FROM agg ORDER BY "group"""",
    // exact replay of tokenCountBpeIsh (the q39 SQL) aggregated per
    // language; ratios of integer sums on the 1e-6 floor grid
    "q336_tokenizer_fertility" ->
      s"""SELECT lang, count(*) AS n_docs,
            CAST(sum(len(toks)) AS BIGINT) AS sum_words,
            CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
            CAST(sum(length(text)) AS BIGINT) AS sum_chars,
            CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
            floor(CAST(sum(bpe) AS DOUBLE)
              / CAST(sum(len(toks)) AS BIGINT) * 1e6 + 0.5) / 1e6
              AS fertility,
            floor(CAST(sum(length(text)) AS DOUBLE)
              / CAST(sum(bpe) AS BIGINT) * 1e6 + 0.5) / 1e6
              AS chars_per_token,
            floor(CAST(sum(octet_length(encode(text))) AS DOUBLE)
              / CAST(sum(bpe) AS BIGINT) * 1e6 + 0.5) / 1e6
              AS bytes_per_token
          FROM (SELECT lang, text, $Toks AS toks,
                  coalesce(list_sum(list_transform($Toks,
                    t -> CAST(ceil(len(t) / 4.0) AS BIGINT))), 0)
                  + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                    AS bpe
                FROM documents)
          GROUP BY lang ORDER BY lang""",
    // Turing estimator over the unigram frequency-of-frequencies;
    // r = 0 row carries the unseen mass N1/N
    "q337_good_turing" ->
      s"""WITH counts AS (
            SELECT w, CAST(count(*) AS BIGINT) AS r
            FROM (SELECT t[i] || ' ' || t[i+1] AS w
                  FROM (SELECT $Toks AS t FROM documents),
                       LATERAL (SELECT unnest(generate_series(1, len(t) - 1))
                                AS i) u)
            GROUP BY w),
          fof AS (
            SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM counts
            GROUP BY r),
          tot AS (SELECT CAST(sum(r) AS BIGINT) AS N FROM counts),
          seen AS (
            SELECT f.r, f.n_r,
              CASE WHEN coalesce(nx.n_r, 0) > 0 THEN
                floor(CAST((f.r + 1) AS DOUBLE) * nx.n_r / f.n_r
                  * 1e6 + 0.5) / 1e6 END AS r_star,
              CASE WHEN coalesce(nx.n_r, 0) > 0 THEN
                floor(CAST((f.r + 1) AS DOUBLE) * nx.n_r / t.N
                  * 1e8 + 0.5) / 1e8 END AS p_mass
            FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1 CROSS JOIN tot t
            WHERE f.r <= 10),
          unseen AS (
            SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS n_r,
              CAST(NULL AS DOUBLE) AS r_star,
              floor(CAST(f.n_r AS DOUBLE) / t.N * 1e8 + 0.5) / 1e8
                AS p_mass
            FROM fof f CROSS JOIN tot t WHERE f.r = 1)
         SELECT r, n_r, r_star, p_mass
         FROM (SELECT * FROM unseen UNION ALL SELECT * FROM seen)
         ORDER BY r""",
    // Monroe log-odds with informative Dirichlet prior: dense
    // source×top-50 scaffold, 1e-6-gridded ln arguments (the PMI
    // pattern), δ and z on the 1e-4 floor grid
    "q338_log_odds_terms" ->
      s"""WITH dt AS MATERIALIZED (
            SELECT source AS src, w, CAST(count(*) AS BIGINT) AS y_iw
            FROM (SELECT source, unnest($Toks) AS w FROM documents)
            GROUP BY 1, 2),
          corpus AS (
            SELECT w, CAST(sum(y_iw) AS BIGINT) AS y_w FROM dt GROUP BY w),
          top AS (SELECT w, y_w FROM corpus ORDER BY y_w DESC, w LIMIT 50),
          totals AS (
            SELECT src, CAST(sum(y_iw) AS BIGINT) AS n_i FROM dt
            GROUP BY src),
          nn AS (SELECT CAST(sum(y_iw) AS BIGINT) AS N FROM dt),
          cells AS (
            SELECT t.src, p.w, p.y_w, t.n_i, coalesce(d.y_iw, 0) AS y_iw,
              nn.N
            FROM totals t CROSS JOIN top p
            LEFT JOIN dt d ON d.src = t.src AND d.w = p.w
            CROSS JOIN nn),
          sc AS (
            SELECT src, w, y_iw,
              ln(floor((y_iw + CAST(100 AS DOUBLE) * y_w / N)
                   / (n_i + CAST(100 AS DOUBLE) - y_iw
                      - CAST(100 AS DOUBLE) * y_w / N) * 1e6 + 0.5) / 1e6)
              - ln(floor(((y_w - y_iw) + CAST(100 AS DOUBLE) * y_w / N)
                   / ((N - n_i) + CAST(100 AS DOUBLE) - (y_w - y_iw)
                      - CAST(100 AS DOUBLE) * y_w / N) * 1e6 + 0.5) / 1e6)
                AS delta,
              CAST(1 AS DOUBLE) / (y_iw + CAST(100 AS DOUBLE) * y_w / N)
              + CAST(1 AS DOUBLE)
                / ((y_w - y_iw) + CAST(100 AS DOUBLE) * y_w / N) AS v
            FROM cells)
         SELECT src AS source, w AS term, y_iw,
           floor(delta * 1e4 + 0.5) / 1e4 AS delta,
           floor(delta / sqrt(v) * 1e4 + 0.5) / 1e4 AS z
         FROM sc ORDER BY source, term""",
    // largest-remainder (Hamilton) apportionment per lang over the
    // k=3 split rows, then rows dealt by (md5 prio, doc_id) rank —
    // the bucketed Spark rank equals this plain per-stratum
    // row_number because the bucket id is the prio's high-bit prefix
    "q308_exact_stratified_split" ->
      """WITH slim AS (
            SELECT doc_id, lang,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                AS prio
            FROM documents),
          counts AS (SELECT lang, count(*) AS n FROM slim GROUP BY lang),
          splits(i, split, num) AS (
            VALUES (0, 'train', 8), (1, 'val', 1), (2, 'test', 1)),
          alloc0 AS (
            SELECT lang, n, i, split, num,
              (n * num) // 10 AS base, (n * num) % 10 AS rem
            FROM counts CROSS JOIN splits),
          alloc1 AS (
            SELECT *,
              (sum(rem) OVER (PARTITION BY lang)) // 10 AS extra,
              row_number() OVER (PARTITION BY lang
                ORDER BY rem DESC, i) AS rn
            FROM alloc0),
          alloc AS (
            SELECT lang, i, split,
              base + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS cnt
            FROM alloc1),
          bounds AS (
            SELECT lang, split,
              sum(cnt) OVER (PARTITION BY lang ORDER BY i) - cnt AS lo,
              sum(cnt) OVER (PARTITION BY lang ORDER BY i) AS hi
            FROM alloc),
          ranked AS (
            SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang
                ORDER BY prio, doc_id) - 1 AS r
            FROM slim)
         SELECT r.doc_id, r.lang, b.split
         FROM ranked r JOIN bounds b
           ON r.lang = b.lang AND r.r >= b.lo AND r.r < b.hi
         ORDER BY r.doc_id""",
    // shared PQ chain + per-subspace mean d² between each subvector
    // and its encoded centroid
    "q175_pq_distortion" -> {
      val errs = (0 until PqM).map { j =>
        val a = j * PqDsub + 1; val b = (j + 1) * PqDsub
        s"""err$j AS (
            SELECT CAST($j AS INTEGER) AS subspace,
              count(*) AS n_vectors,
              round(avg(${pqD2("e.sv", "cb.c")}), 6) AS mse
            FROM (SELECT vec_id, v[$a:$b] AS sv FROM emb) e
            JOIN enc$j n ON n.vec_id = e.vec_id
            JOIN c2_$j cb ON cb.code = n.code)"""
      }.mkString(",\n          ")
      val sel = (0 until PqM).map(j => s"SELECT * FROM err$j")
        .mkString("\n           UNION ALL ")
      s"""WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          train AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT 262144),
          $PqSubChainCtes,
          $errs
         SELECT subspace, n_vectors, mse FROM ($sel) ORDER BY subspace"""
    },
    // shared LSH chain + vocab IDF table + per-pair gram expansion;
    // idf sums replay within the 4dp rounding
    "q178_weighted_jaccard" ->
      (LshVerifiedPairCtes + """,
          sets AS (SELECT id, sh FROM docs WHERE len(sh) > 0),
          nn AS (SELECT count(*) AS n FROM sets),
          idf AS (
            SELECT g, ln(nn.n::DOUBLE / cnt) AS idf FROM (
              SELECT g, count(*) AS cnt FROM (
                SELECT id, unnest(sh) AS g FROM sets) GROUP BY g)
            CROSS JOIN nn),
          pg AS (
            SELECT p.id_a, p.id_b, p.jac, u.g,
              list_contains(sa.sh, u.g) AND list_contains(sb.sh, u.g) AS both
            FROM vpairs p
            JOIN sets sa ON sa.id = p.id_a
            JOIN sets sb ON sb.id = p.id_b,
            unnest(list_distinct(list_concat(sa.sh, sb.sh))) AS u(g)),
          wj AS (
            SELECT pg.id_a, pg.id_b, pg.jac,
              sum(CASE WHEN pg.both THEN i.idf ELSE 0 END) / sum(i.idf) AS w
            FROM pg JOIN idf i USING (g)
            GROUP BY pg.id_a, pg.id_b, pg.jac)
         SELECT id_a, id_b, round(jac, 4) AS jaccard,
           round(w, 4) AS weighted_jaccard
         FROM wj ORDER BY id_a, id_b"""),
    // multi-query BM25 (q102's kernel joined against a query-term
    // VALUES list), graded rel = distinct-terms − 1; ideal DCG rebuilt
    // from per-grade counts exactly like the Spark side, ln discounts
    "q179_ndcg_mrr" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
          stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
          q(query_id, term) AS (VALUES
            (1,'spark'),(1,'data'),(1,'query'),(1,'join'),
            (2,'hash'),(2,'merge'),(2,'sort'),
            (3,'vector'),(3,'stream'),(3,'window'),(3,'filter')),
          hits AS (
            SELECT q.query_id, s.doc_id, s.term, CAST(count(*) AS DOUBLE) AS tf
            FROM (SELECT doc_id, u.term FROM toks, unnest(t) AS u(term)) s
            JOIN q ON q.term = s.term
            GROUP BY 1, 2, 3),
          dfreq AS (
            SELECT query_id, term, CAST(count(*) AS DOUBLE) AS df
            FROM hits GROUP BY 1, 2),
          scored AS (
            SELECT h.query_id, h.doc_id,
              sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) * h.tf * 2.2
                / (h.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS bm25,
              greatest(count(*) - 1, 0) AS rel
            FROM hits h
            JOIN dfreq d USING (query_id, term)
            JOIN dl l USING (doc_id)
            CROSS JOIN stats s
            GROUP BY 1, 2),
          ranked AS (
            SELECT * FROM (
              SELECT query_id, doc_id, rel,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY bm25 DESC, doc_id ASC) AS rn
              FROM scored)
            WHERE rn <= 100),
          perq AS (
            SELECT query_id, count(*) AS n_ranked,
              sum(CASE WHEN rn <= 10
                THEN (pow(2, rel) - 1) / ln(rn + 1.0) ELSE 0 END) AS dcg,
              min(CASE WHEN rel >= 1 THEN rn END) AS first_rel,
              CAST(sum(CASE WHEN rn <= 10 AND rel >= 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS hits_k
            FROM ranked GROUP BY 1),
          gc AS (
            SELECT query_id, rel, count(*) AS ng
            FROM scored WHERE rel >= 1 GROUP BY 1, 2),
          cum AS (
            SELECT query_id, rel, ng,
              coalesce(sum(ng) OVER (PARTITION BY query_id ORDER BY rel DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM gc),
          ideal AS (
            SELECT query_id,
              sum((pow(2, rel) - 1) / ln(u.pos + 1.0)) AS idcg
            FROM cum, unnest(range(CAST(cb + 1 AS BIGINT),
              CAST(least(cb + ng, 10) + 1 AS BIGINT))) AS u(pos)
            WHERE cb < 10 GROUP BY 1)
         SELECT p.query_id, p.n_ranked, round(p.dcg, 6) AS dcg,
           round(coalesce(i.idcg, 0), 6) AS idcg,
           round(CASE WHEN coalesce(i.idcg, 0) > 0
             THEN p.dcg / i.idcg ELSE 0 END, 6) AS ndcg,
           round(CASE WHEN p.first_rel IS NOT NULL
             THEN 1.0 / p.first_rel ELSE 0 END, 6) AS mrr,
           round(p.hits_k / 10.0, 6) AS precision_at_k
         FROM perq p LEFT JOIN ideal i USING (query_id)
         ORDER BY p.query_id""",
    // same quality kernel as q38 quantized to 3dp; AUC numerator is a
    // pure integer rank-sum so the final division is bit-identical
    "q180_roc_auc" ->
      s"""WITH sc AS (
            SELECT source,
              round(round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0))
                + 0.3 * least(sr * 4, 1.0), 6), 3) AS s,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM (
              SELECT source, lang,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text) ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks) ELSE 0.0 END AS sr,
                CASE WHEN len(toks) >= 5 AND len(toks) <= 100000
                  THEN 1.0 ELSE 0.0 END AS lok
              FROM (SELECT source, lang, text, $Toks AS toks FROM documents))),
          counts AS (
            SELECT source, s,
              CAST(sum(y) AS BIGINT) AS pos,
              CAST(sum(1 - y) AS BIGINT) AS neg
            FROM sc GROUP BY 1, 2),
          c2 AS (
            SELECT source, s, pos, neg,
              coalesce(sum(neg) OVER (PARTITION BY source ORDER BY s ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
            FROM counts)
         SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           round(CASE WHEN sum(pos) > 0 AND sum(neg) > 0
             THEN sum(pos * (2 * nb + neg))::DOUBLE
               / (2.0 * sum(pos) * sum(neg))
             ELSE 0.0 END, 6) AS auc
         FROM c2 GROUP BY source ORDER BY source""",
    // per-bin sums of 1e-6-grid integers (exact), ECE folded over the
    // 10 bin rows and repeated on each
    "q181_calibration" ->
      s"""WITH sc AS (
            SELECT round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0))
                + 0.3 * least(sr * 4, 1.0), 6) AS sq,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM (
              SELECT lang,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text) ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks) ELSE 0.0 END AS sr,
                CASE WHEN len(toks) >= 5 AND len(toks) <= 100000
                  THEN 1.0 ELSE 0.0 END AS lok
              FROM (SELECT lang, text, $Toks AS toks FROM documents))),
          b AS (
            SELECT CAST(least(floor(sq * 10), 9) AS INTEGER) AS bin,
              CAST(round(sq * 1000000) AS BIGINT) AS sq6, y
            FROM sc),
          per AS (
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
              sum(sq6) AS ssum, sum(y) AS npos
            FROM b GROUP BY 1),
          w AS (
            SELECT bin, n, ssum::DOUBLE / 1000000 / n AS mp,
              npos::DOUBLE / n AS fp
            FROM per),
          e AS (SELECT sum(n * abs(mp - fp)) / sum(n) AS ece FROM w)
         SELECT bin, n, round(mp, 6) AS mean_pred, round(fp, 6) AS frac_pos,
           round(e.ece, 6) AS ece
         FROM w CROSS JOIN e ORDER BY bin""",
    // q180's quality kernel quantized to 3dp; type-1 quantile picked by
    // the integer rank test 10·cum ≥ d·n on both sides
    "q190_quantile_align" ->
      s"""WITH sc AS (
            SELECT source,
              round(round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0))
                + 0.3 * least(sr * 4, 1.0), 6), 3) AS s
            FROM (
              SELECT source,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text) ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks) ELSE 0.0 END AS sr,
                CASE WHEN len(toks) >= 5 AND len(toks) <= 100000
                  THEN 1.0 ELSE 0.0 END AS lok
              FROM (SELECT source, text, $Toks AS toks FROM documents))),
          counts AS (SELECT source, s, count(*) AS c FROM sc GROUP BY 1, 2),
          tot AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n
            FROM counts GROUP BY 1),
          cums AS (
            SELECT source, s, sum(c) OVER (PARTITION BY source ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM counts),
          dec AS (SELECT unnest(range(1, 10)) AS decile),
          src AS (
            SELECT c.source, d.decile, min(c.s) AS q
            FROM cums c JOIN tot USING (source) CROSS JOIN dec d
            WHERE c.cum * 10 >= d.decile * tot.n
            GROUP BY 1, 2),
          g1 AS (SELECT s, sum(c) AS c FROM counts GROUP BY 1),
          gt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM g1),
          gc AS (
            SELECT s, sum(c) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM g1),
          gq AS (
            SELECT d.decile, min(s) AS q
            FROM gc CROSS JOIN gt CROSS JOIN dec d
            WHERE gc.cum * 10 >= d.decile * gt.n
            GROUP BY 1)
         SELECT s2.source, s2.decile, s2.q AS src_q, gq.q AS global_q,
           round(s2.q - gq.q, 6) AS gap
         FROM src s2 JOIN gq USING (decile)
         ORDER BY s2.source, s2.decile""",
    // the a-priori pair kernel replayed over the top-50 vocab, PMI as
    // ln of the SAME 6dp-rounded lift (so ordering ties identically)
    "q192_collocations" ->
      s"""WITH toksd AS (
            SELECT DISTINCT doc_id, u.term
            FROM (SELECT doc_id, $Toks AS t FROM documents),
              unnest(t) AS u(term)),
          vocab AS (
            SELECT term FROM (
              SELECT term, count(*) AS df FROM toksd
              GROUP BY 1 ORDER BY df DESC, term ASC LIMIT 50)),
          r AS (SELECT doc_id, term FROM toksd JOIN vocab USING (term)),
          itemn AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n FROM r
            GROUP BY 1 HAVING count(*) >= 5),
          tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nb FROM r),
          freq AS (SELECT r.doc_id, r.term FROM r JOIN itemn USING (term)),
          co AS (
            SELECT a.term AS ia, b.term AS ib, CAST(count(*) AS BIGINT) AS n_ab
            FROM freq a JOIN freq b ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2 HAVING count(*) >= 5),
          lifted AS (
            SELECT co.ia, co.ib, co.n_ab,
              round(ln(round(co.n_ab * tot.nb / (na.n * nb2.n), 6)), 4) AS pmi
            FROM co
            JOIN itemn na ON na.term = co.ia
            JOIN itemn nb2 ON nb2.term = co.ib
            CROSS JOIN tot)
         SELECT ia AS item_a, ib AS item_b, n_ab, pmi FROM (
           SELECT * FROM lifted ORDER BY pmi DESC, ia, ib LIMIT 20)
         ORDER BY pmi DESC, item_a, item_b""",
    // identical GD trajectory as an unrolled MATERIALIZED CTE chain
    // (w travels as a 1-row table; min() lifts the constants through
    // the aggregate exactly like the engine's collected literals)
    "q203_logreg" -> {
      def z(p: String) = s"($p.a * x0 + $p.b * x1) + $p.c * x2"
      def sig(p: String) = s"1 / (1 + exp(-(${z(p)})))"
      val chain = (1 to 5).map { t =>
        val p = s"it${t - 1}"
        s""",
          it$t AS MATERIALIZED (
            SELECT min($p.a) - 5.0 * avg((${sig(p)} - y) * x0) AS a,
              min($p.b) - 5.0 * avg((${sig(p)} - y) * x1) AS b,
              min($p.c) - 5.0 * avg((${sig(p)} - y) * x2) AS c
            FROM feat CROSS JOIN $p)"""
      }.mkString
      s"""WITH feat AS MATERIALIZED (
            SELECT 1.0 AS x0, round(pr, 4) AS x1, round(sr, 4) AS x2,
              CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
            FROM (
              SELECT lang,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text) ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks) ELSE 0.0 END AS sr
              FROM (SELECT lang, text, $Toks AS toks FROM documents))),
          it0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c)$chain
         SELECT CAST(count(*) AS BIGINT) AS n,
           round(min(it5.a), 6) AS w_0,
           round(min(it5.b), 6) AS w_1,
           round(min(it5.c), 6) AS w_2,
           round(avg(CASE WHEN (${sig("it5")} >= 0.5) = (y = 1.0)
             THEN 1.0 ELSE 0.0 END), 6) AS accuracy
         FROM feat CROSS JOIN it5"""
    },
    // same md5-lowest query sample, same ordered-fold cosine ranking;
    // the in_degree = 0 row counts the untouched corpus remainder
    "q204_hubness" ->
      """WITH q AS (
            SELECT vec_id, embedding FROM embeddings
            ORDER BY md5('hub:' || CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 100),
          scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              list_sum(list_transform(range(1, len(q.embedding) + 1),
                i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
                 i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) *
               sqrt(list_sum(list_transform(range(1, len(c.embedding) + 1),
                 i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))) AS cosine
            FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
          knn AS (
            SELECT neighbor_id FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rn
              FROM scored)
            WHERE rn <= 5),
          indeg AS (
            SELECT neighbor_id, CAST(count(*) AS BIGINT) AS in_degree
            FROM knn GROUP BY 1),
          hist AS (
            SELECT in_degree, CAST(count(*) AS BIGINT) AS n_points
            FROM indeg GROUP BY 1)
         SELECT * FROM hist
         UNION ALL
         SELECT CAST(0 AS BIGINT),
           (SELECT count(*) FROM embeddings) - (SELECT count(*) FROM indeg)
         ORDER BY in_degree""",
    // shared LSH chain; all five Pearson sums are integers
    "q208_assortativity" ->
      (LshVerifiedPairCtes + """,
          sym AS (
            SELECT DISTINCT src, dst FROM (
              SELECT id_a AS src, id_b AS dst FROM vpairs
              UNION ALL SELECT id_b, id_a FROM vpairs)),
          deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
          p AS (
            SELECT da.d AS x, db.d AS y FROM sym
            JOIN deg da ON da.src = sym.src
            JOIN deg db ON db.src = sym.dst),
          a AS (
            SELECT CAST(count(*) AS BIGINT) AS m2,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(y * y) AS BIGINT) AS syy
            FROM p)
         SELECT CAST(m2 / 2 AS BIGINT) AS m_edges,
           round(CASE WHEN CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
               AND CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
             THEN (CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / sqrt((CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * (CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             ELSE NULL END, 6) AS assortativity
         FROM a"""),
    // σ from integer sums; identical normalizer expressions
    "q210_neyman_allocation" ->
      """WITH s AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_h,
              CAST(sum(n_chars) AS BIGINT) AS sx,
              CAST(sum(n_chars * n_chars) AS BIGINT) AS sx2
            FROM documents GROUP BY 1),
          s2 AS (
            SELECT source, n_h,
              sqrt(greatest(sx2::DOUBLE / n_h
                - (sx::DOUBLE / n_h) * (sx::DOUBLE / n_h), 0)) AS sd
            FROM s),
          s3 AS (SELECT *, n_h * sd AS w FROM s2),
          t AS (SELECT sum(w) AS tw FROM s3)
         SELECT source, n_h, round(sd, 6) AS sd,
           round(CASE WHEN t.tw > 0 THEN 1000.0 * w / t.tw ELSE 0 END, 4)
             AS alloc,
           round(CASE WHEN t.tw > 0 THEN 1000.0 * w / t.tw / n_h ELSE 0 END, 6)
             AS rate
         FROM s3 CROSS JOIN t ORDER BY source""",
    // full stupid-backoff replay: per-position ln scores quantized to
    // integer micros before the per-doc sum (order-free exactness)
    "q316_backoff_lm" ->
      s"""WITH $BackoffScoredCte
         SELECT doc_id, count(*) AS n_tokens,
           CAST(count(CASE WHEN oov THEN 1 END) AS BIGINT) AS n_oov,
           CAST(count(CASE WHEN backoff THEN 1 END) AS BIGINT)
             AS n_backoff,
           floor(CAST(CAST(sum(lnq) AS BIGINT) AS DOUBLE)
             / count(*) + 0.5) / 1e6 AS avg_logp,
           round(exp(-floor(CAST(CAST(sum(lnq) AS BIGINT) AS DOUBLE)
             / count(*) + 0.5) / 1e6), 4) AS pseudo_ppl
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    // min-k%: sorted bottom slice of the shared scored stream
    "q327_mink_prob" ->
      s"""WITH $BackoffScoredCte,
          sel AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              list(lnq ORDER BY lnq) AS l
            FROM scored GROUP BY doc_id),
          sel2 AS (
            SELECT doc_id, n_tokens,
              greatest(1, n_tokens * 20 // 100) AS n_bottom, l
            FROM sel)
         SELECT doc_id, n_tokens, n_bottom,
           floor(CAST(list_sum(l[1:n_bottom]) AS DOUBLE) / n_bottom
             + 0.5) / 1e6 AS mink_avg_logp
         FROM sel2 ORDER BY doc_id""",
    // exact class-size histogram; violating = size < k
    "q199_k_anonymity" ->
      """WITH cls AS (
            SELECT lang, source, n_chars // 200 AS b, count(*) AS sz
            FROM documents GROUP BY 1, 2, 3),
          bs AS (
            SELECT CAST(sz AS BIGINT) AS class_size,
              CAST(count(*) AS BIGINT) AS n_classes
            FROM cls GROUP BY 1),
          bs2 AS (
            SELECT class_size, n_classes,
              class_size * n_classes AS n_rows
            FROM bs),
          t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM bs2)
         SELECT class_size, n_classes, n_rows,
           class_size < 5 AS violating,
           round(n_rows::DOUBLE / t.total, 6) AS row_share
         FROM bs2 CROSS JOIN t ORDER BY class_size""",
    // hand-computed: 1/2 share the alternating-envelope fingerprint,
    // 3 silences exactly one loud window; inverted/flat/undecodable
    // fixtures pair with nothing inside distance 3
    "q201_audio_neardup" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS INTEGER)),
          (1, 3, 1),
          (2, 3, 1))
         t(id_a, id_b, hamming)
         ORDER BY id_a, id_b""",
    // hand-computed: ids 1/2 share the half-black hash (distance 0),
    // id 3 flips exactly one grid cell (distance 1); the inverted,
    // flat, and undecodable fixtures produce no pair within 3
    "q198_image_phash_neardup" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS INTEGER)),
          (1, 3, 1),
          (2, 3, 1))
         t(id_a, id_b, hamming)
         ORDER BY id_a, id_b""",
    // both rankings replayed (selection on the engines' own rounding
    // conventions), re-ranked in the intersection; ρ and τ are integer
    // sums until the final division
    "q196_rank_correlation" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
          stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
          terms AS (
            SELECT doc_id, u.term FROM toks, unnest(t) AS u(term)
            WHERE u.term IN ('spark', 'data', 'query', 'join')),
          tf AS (
            SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
            FROM terms GROUP BY doc_id, term),
          dfreq AS (
            SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
          scored AS (
            SELECT t.doc_id,
              ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) * t.tf * 2.2
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS s
            FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
            CROSS JOIN stats s),
          lex AS (
            SELECT doc_id, row_number() OVER (ORDER BY b DESC, doc_id) AS ra
            FROM (
              SELECT doc_id, round(sum(s), 4) AS b FROM scored
              GROUP BY doc_id ORDER BY b DESC, doc_id LIMIT 100)),
          qtot AS (SELECT CAST(sum(len(t)) AS DOUBLE) AS ct FROM toks),
          cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
          mm AS (
            SELECT t.doc_id,
              sum(ln(1 + t.tf / (2000.0 * c.cf / tt.ct))) AS mt
            FROM tf t JOIN cf c USING (term) CROSS JOIN qtot tt
            GROUP BY 1),
          qls AS (
            SELECT k.doc_id,
              coalesce(mm.mt, 0) + 4 * ln(2000.0 / (len(k.t) + 2000.0)) AS score
            FROM toks k LEFT JOIN mm USING (doc_id)),
          sem AS (
            SELECT doc_id, row_number() OVER (ORDER BY qs DESC, doc_id) AS rb
            FROM (
              SELECT doc_id, round(score, 4) AS qs FROM qls
              ORDER BY score DESC, doc_id LIMIT 100)),
          j AS (
            SELECT l.doc_id AS id, l.ra, m2.rb
            FROM lex l JOIN sem m2 USING (doc_id)),
          rr AS (
            SELECT id,
              row_number() OVER (ORDER BY ra, id) AS xa,
              row_number() OVER (ORDER BY rb, id) AS xb
            FROM j),
          sp AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum((xa - xb) * (xa - xb)) AS BIGINT) AS d2
            FROM rr),
          kd AS (
            SELECT CAST(sum(CASE WHEN q.xb > p.xb THEN 1 ELSE -1 END)
              AS BIGINT) AS cd
            FROM rr p JOIN rr q ON p.xa < q.xa)
         SELECT sp.n AS n_common, round(sp.n / 100.0, 6) AS overlap_frac,
           round(CASE WHEN sp.n >= 2
             THEN 1.0 - 6.0 * sp.d2 / (sp.n::DOUBLE * (sp.n::DOUBLE * sp.n - 1))
             ELSE 0 END, 6) AS spearman_rho,
           round(CASE WHEN sp.n >= 2
             THEN kd.cd / (sp.n::DOUBLE * (sp.n - 1) / 2)
             ELSE 0 END, 6) AS kendall_tau
         FROM sp CROSS JOIN kd""",
    // descending cumulative over the quantized score grid; block
    // selection by the integer test 10·cum ≥ k·N
    "q197_selection_curve" ->
      s"""WITH sc AS (
            SELECT round(round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0))
                + 0.3 * least(sr * 4, 1.0), 6), 3) AS s,
              len(toks) AS m
            FROM (
              SELECT toks,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text) ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks) ELSE 0.0 END AS sr,
                CASE WHEN len(toks) >= 5 AND len(toks) <= 100000
                  THEN 1.0 ELSE 0.0 END AS lok
              FROM (SELECT text, $Toks AS toks FROM documents))),
          counts AS (
            SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(m) AS BIGINT) AS t
            FROM sc GROUP BY 1),
          tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(t) AS BIGINT) AS mt
            FROM counts),
          cums AS (
            SELECT s,
              sum(c) OVER (ORDER BY s DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              sum(t) OVER (ORDER BY s DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctok
            FROM counts),
          dec AS (SELECT unnest(range(1, 11)) AS decile),
          blk AS (
            SELECT d.decile, tot.n, tot.mt, min(cum) AS cum
            FROM cums CROSS JOIN tot CROSS JOIN dec d
            WHERE cum * 10 >= d.decile * tot.n
            GROUP BY 1, 2, 3)
         SELECT b.decile, c2.s AS cutoff_score,
           CAST(b.cum AS BIGINT) AS n_docs_kept,
           CAST(c2.ctok AS BIGINT) AS n_tokens_kept,
           round(b.cum::DOUBLE / b.n, 6) AS doc_frac,
           round(c2.ctok::DOUBLE / b.mt, 6) AS token_frac
         FROM blk b JOIN cums c2 ON c2.cum = b.cum
         ORDER BY b.decile""",
    // densified (source × vocab) frequency grid, across-source
    // moments, zero-variance terms dropped from every pair's mean
    "q193_burrows_delta" ->
      s"""WITH toks AS (
            SELECT source AS g, unnest($Toks) AS t FROM documents),
          vocab AS (
            SELECT t FROM (
              SELECT t, count(*) AS c FROM toks
              GROUP BY 1 ORDER BY c DESC, t ASC LIMIT 30)),
          counts AS (
            SELECT g, t, CAST(count(*) AS BIGINT) AS c
            FROM toks JOIN vocab USING (t) GROUP BY 1, 2),
          totals AS (
            SELECT g, CAST(count(*) AS BIGINT) AS tok FROM toks GROUP BY 1),
          grid AS (SELECT tt.g, tt.tok, v.t FROM totals tt CROSS JOIN vocab v),
          f AS (
            SELECT grid.g, grid.t,
              coalesce(c.c, 0)::DOUBLE / grid.tok AS f
            FROM grid LEFT JOIN counts c ON c.g = grid.g AND c.t = grid.t),
          stats AS (
            SELECT t, avg(f) AS mu, CAST(count(*) AS DOUBLE) AS s,
              sum(f * f) AS sf2
            FROM f GROUP BY 1),
          st2 AS (SELECT t, mu, sqrt(sf2 / s - mu * mu) AS sigma FROM stats),
          z AS (
            SELECT f.g, f.t, (f.f - st2.mu) / st2.sigma AS z
            FROM f JOIN st2 USING (t) WHERE st2.sigma > 0)
         SELECT a.g AS source_a, b.g AS source_b,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(avg(abs(a.z - b.z)), 6) AS delta
         FROM z a JOIN z b ON a.t = b.t AND a.g < b.g
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // sorted-ratio prefix caps; the level test and λ use the identical
    // double expressions, so the capped set matches bit-for-bit
    "q194_waterfill" ->
      s"""WITH tc AS (
            SELECT source, CAST(sum(len($Toks)) AS BIGINT) AS n
            FROM documents GROUP BY 1 HAVING sum(len($Toks)) > 0),
          w1 AS (SELECT source, n, pow(CAST(n AS DOUBLE), 0.5) AS w FROM tc),
          tw AS (SELECT sum(w) AS wtot FROM w1),
          r1 AS (
            SELECT *,
              row_number() OVER (ORDER BY n / w ASC, source ASC) AS rk,
              sum(n) OVER (ORDER BY n / w ASC, source ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
              sum(w) OVER (ORDER BY n / w ASC, source ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
            FROM w1 CROSS JOIN tw),
          r2 AS (
            SELECT *, n * (wtot - cw) <= w * (100000 - cn) AS capped
            FROM r1),
          lv AS (
            SELECT coalesce(max(CASE WHEN capped THEN rk END), 0) AS jstar,
              (100000 - coalesce(max(CASE WHEN capped THEN cn END), 0))::DOUBLE
                / (max(wtot) - coalesce(max(CASE WHEN capped THEN cw END), 0.0))
                AS lambda
            FROM r2),
          r3 AS (
            SELECT r2.source, r2.n, r2.w,
              CASE WHEN r2.rk <= lv.jstar THEN CAST(r2.n AS DOUBLE)
                ELSE lv.lambda * r2.w END AS alloc_raw
            FROM r2 CROSS JOIN lv)
         SELECT source, n AS n_tokens, round(w, 6) AS weight,
           round(alloc_raw, 4) AS alloc,
           round(alloc_raw / n, 6) AS rate
         FROM r3 ORDER BY source""",
    // shared LSH chain; the peel unrolls to the operator's maxRounds
    // bound — identical to the converged fixpoint the engine asserts
    "q195_kcore" -> {
      val rounds = 8
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
      // reference, and each round references the previous edge set
      // three times — un-materialized, the unroll re-runs the whole
      // LSH chain 3^rounds times and exhausts file handles
      val chain = (1 to rounds).map { i =>
        s""",
          n$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src
            HAVING count(*) >= 2),
          e$i AS MATERIALIZED (
            SELECT e.src, e.dst FROM e${i - 1} e
            JOIN n$i a ON a.src = e.src
            JOIN n$i b ON b.src = e.dst)"""
      }.mkString
      LshVerifiedPairCtes + """,
          sym0 AS (SELECT id_a AS src, id_b AS dst FROM vpairs
            UNION SELECT id_b, id_a FROM vpairs),
          e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM sym0)""" + chain + s"""
         SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
         FROM e$rounds GROUP BY src ORDER BY id"""
    },
    // rank ties → lexicographic on both sides; the 6-sum OLS fold runs
    // over the same 200 (ln rank, ln freq) points
    "q183_zipf_fit" ->
      s"""WITH freq AS (
            SELECT term, count(*) AS freq FROM (
              SELECT unnest($Toks) AS term FROM documents)
            GROUP BY term ORDER BY freq DESC, term ASC LIMIT 200),
          xy AS (
            SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, term ASC)
              AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
            FROM freq),
          a AS (
            SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
              sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
            FROM xy)
         SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           round(CASE WHEN n * syy - sy * sy > 0
             THEN pow(n * sxy - sx * sy, 2)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy))
             ELSE 0 END, 6) AS r2
         FROM a""",
    // md5-deterministic Poisson(1) draws on the 1e-6 integer grid;
    // every replicate mean is a ratio of integer sums
    "q185_bootstrap_ci" -> {
      val wt = Eval.poissonCutsSql("u")
      s"""WITH w AS (
            SELECT source, doc_id, n_chars, r.r AS rep,
              ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' ||
                CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS u
            FROM documents, range(0, 32) r(r)),
          pw AS (
            SELECT source, rep, CAST($wt AS BIGINT) AS wt, n_chars FROM w),
          reps AS (
            SELECT source, rep,
              CAST(sum(wt * n_chars) AS BIGINT) AS wv,
              CAST(sum(wt) AS BIGINT) AS wsum
            FROM pw GROUP BY 1, 2),
          means AS (
            SELECT source, CASE WHEN wsum > 0 THEN wv::DOUBLE / wsum END AS m
            FROM reps),
          arr AS (
            SELECT source, list_sort(list(m)) AS ms
            FROM means WHERE m IS NOT NULL GROUP BY source),
          base AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(n_chars) AS BIGINT) AS sv
            FROM documents GROUP BY source)
         SELECT b.source, b.n, round(b.sv::DOUBLE / b.n, 6) AS mean,
           round(a.ms[2], 6) AS ci_lo, round(a.ms[31], 6) AS ci_hi
         FROM base b JOIN arr a USING (source) ORDER BY b.source"""
    },
    // rank-equivalent sparse decomposition: matching terms add
    // ln(1 + tf/(μ·p_t)), every doc carries the |q|·ln(μ/(dl+μ)) prior;
    // ORDER/LIMIT on the unrounded score (q108's lesson)
    "q186_dirichlet_ql" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          tot AS (SELECT CAST(sum(len(t)) AS DOUBLE) AS ct FROM toks),
          tf AS (
            SELECT doc_id, u.term, CAST(count(*) AS DOUBLE) AS tf
            FROM toks, unnest(t) AS u(term)
            WHERE u.term IN ('spark', 'data', 'query', 'join')
            GROUP BY 1, 2),
          cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY 1),
          m AS (
            SELECT t.doc_id,
              sum(ln(1 + t.tf / (2000.0 * c.cf / tt.ct))) AS mt
            FROM tf t JOIN cf c USING (term) CROSS JOIN tot tt
            GROUP BY 1),
          s AS (
            SELECT k.doc_id,
              coalesce(m.mt, 0) + 4 * ln(2000.0 / (len(k.t) + 2000.0)) AS score
            FROM toks k LEFT JOIN m USING (doc_id))
         SELECT doc_id, round(score, 4) AS ql_score FROM (
           SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 15)
         ORDER BY score DESC, doc_id""",
    // shared LSH chain + per-pair signature component-match estimate
    "q172_minhash_estimate_audit" ->
      (LshVerifiedPairCtes + """,
          est AS (
            SELECT p.id_a, p.id_b, p.jac,
              len(list_filter(range(1, 17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE
                / 16 AS est
            FROM vpairs p
            JOIN sigs sa ON sa.id = p.id_a
            JOIN sigs sb ON sb.id = p.id_b)
         SELECT id_a, id_b, round(jac, 4) AS jaccard,
           round(est, 4) AS est_jaccard, round(abs(est - jac), 4) AS abs_err
         FROM est ORDER BY id_a, id_b"""),
    // same quality/fingerprint kernels as q38/q151; dominant language
    // via min(struct(-n, lang)) — lexicographic tie-break both engines
    "q173_data_card" ->
      s"""WITH base AS (
            SELECT source, lang,
              md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
              len(toks) AS ntok, length(text) AS nch,
              round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0))
                + 0.3 * least(sr * 4, 1.0), 6) AS q
            FROM (
              SELECT source, lang, text, toks,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text)
                  ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks)
                  ELSE 0.0 END AS sr,
                CASE WHEN len(toks) >= 5 AND len(toks) <= 100000
                  THEN 1.0 ELSE 0.0 END AS lok
              FROM (SELECT source, lang, text, $Toks AS toks FROM documents))),
          main AS (
            SELECT source, count(*) AS n_docs,
              count(DISTINCT fp) AS n_unique,
              CAST(sum(ntok) AS BIGINT) AS sum_tokens,
              round(avg(nch), 4) AS avg_chars,
              round(avg(q), 6) AS avg_quality
            FROM base GROUP BY source),
          lc AS (
            SELECT source, lang, count(*) AS n FROM base GROUP BY 1, 2),
          lm AS (
            SELECT source,
              min(struct_pack(nn := -n, lang := lang)) AS mx,
              CAST(sum(n) AS BIGINT) AS tot
            FROM lc GROUP BY source)
         SELECT mn.source, mn.n_docs, mn.n_unique,
           round(1 - mn.n_unique::DOUBLE / mn.n_docs, 6) AS dup_rate,
           mn.sum_tokens, mn.avg_chars, mn.avg_quality,
           (lm.mx).lang AS main_lang,
           round((-(lm.mx).nn)::DOUBLE / lm.tot, 6) AS main_lang_frac
         FROM main mn JOIN lm USING (source) ORDER BY mn.source""",
    // shared LSH chain + source dimension joins; pair sources ordered
    // lexicographically (upper-triangular matrix)
    "q174_dup_flow_matrix" ->
      (LshVerifiedPairCtes + """,
          flow AS (
            SELECT least(da.source, db.source) AS source_a,
              greatest(da.source, db.source) AS source_b, p.jac
            FROM vpairs p
            JOIN documents da ON da.doc_id = p.id_a
            JOIN documents db ON db.doc_id = p.id_b)
         SELECT source_a, source_b, count(*) AS n_pairs,
           round(avg(jac), 4) AS avg_jaccard
         FROM flow GROUP BY 1, 2 ORDER BY source_a, source_b"""),
    "q31_dedup_prefix_groups" ->
      s"""SELECT md5(array_to_string(($Toks)[1:2], ' ')) AS fingerprint,
          count(*) AS n_docs, min(doc_id) AS keep_id
          FROM documents GROUP BY 1 HAVING count(*) >= 2 ORDER BY fingerprint""",
    "q32_dedup_minhash_lsh" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            -- minhash family: h_i(x) = (a_i·base28(x) + b_i) mod (2^31−1),
            -- a_i = (i·2654435761) mod (2^31−2) + 1, b_i = (i·40503·65537) mod (2^31−1),
            -- base28 = first 7 md5 hex digits (matches graft.functions)
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          pairs AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
          SELECT id_a, id_b, round(jac, 4) AS jaccard FROM (
            SELECT id_a, id_b,
              CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                     len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
            FROM pairs)
          WHERE jac >= 0.5 ORDER BY id_a, id_b""",
    "q33_dedup_ngram_jaccard" ->
      s"""WITH docs AS (
            SELECT doc_id AS id, lang, n_chars // 50 AS len_bucket,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, lang, n_chars, $Toks AS t FROM documents))
          SELECT id_a, id_b, round(jac, 4) AS jaccard FROM (
            SELECT a.id AS id_a, b.id AS id_b,
              CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
                ELSE len(list_intersect(a.sh, b.sh))::DOUBLE /
                     len(list_distinct(list_concat(a.sh, b.sh))) END AS jac
            FROM docs a JOIN docs b
              ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.id < b.id
            WHERE len(a.sh) > 0 AND len(b.sh) > 0)
          WHERE jac >= 0.5 ORDER BY id_a, id_b""",
    // the shared IVF chain through `scored`, then both rankings: the
    // probed-scan top-5 and the brute-force truth top-5; recall =
    // |intersection| / |truth| per query
    "q167_ivf_recall" ->
      (IvfScoredCtes + """,
          ivf AS (
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored)
            WHERE rank <= 5),
          truth AS (
            SELECT query_id, neighbor_id FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY q.vec_id ORDER BY
                  list_sum(list_transform(range(1, 65), i -> q.v[i] * e.v[i])) /
                  (sqrt(list_sum(list_transform(q.v, x -> x * x))) *
                   sqrt(list_sum(list_transform(e.v, x -> x * x)))) DESC,
                  e.vec_id ASC) AS rank
              FROM emb e CROSS JOIN (SELECT vec_id, v FROM emb WHERE vec_id < 5) q
              WHERE e.vec_id <> q.vec_id)
            WHERE rank <= 5)
         SELECT t.query_id, count(*) AS n_truth,
           count(i.neighbor_id) AS n_hits,
           round(count(i.neighbor_id)::DOUBLE / count(*), 6) AS recall
         FROM truth t LEFT JOIN ivf i USING (query_id, neighbor_id)
         GROUP BY t.query_id ORDER BY t.query_id"""),
    // greedy farthest-point unrolled: seed = lowest md5('kc:'||id);
    // each round scores the remaining corpus against ALL selected
    // centers (max cosine), picks the min (ties -> id), like the q84
    // PageRank / q68 k-means unroll pattern
    "q168_kcenter_select" -> {
      val k = 4
      def nrm(x: String) = s"sqrt(list_sum(list_transform($x, x -> x * x)))"
      val dot = "list_sum(list_transform(range(1, 65), i -> e.v[i] * c.c[i]))"
      val rounds = (2 to k).map { r =>
        val cents = (1 until r).map(i => s"SELECT vec_id, v FROM sel$i")
          .mkString(" UNION ALL ")
        s"""cents$r AS ($cents),
          sc$r AS (
            SELECT e.vec_id, e.v,
              max(CASE WHEN e.nv > 0 AND c.nc > 0
                THEN $dot / (e.nv * c.nc) ELSE 0.0 END) AS mc
            FROM (SELECT vec_id, v, ${nrm("v")} AS nv FROM emb
                  WHERE vec_id NOT IN (SELECT vec_id FROM cents$r)) e
            CROSS JOIN (SELECT vec_id AS cid, v AS c, ${nrm("v")} AS nc
                        FROM cents$r) c
            GROUP BY e.vec_id, e.v, e.nv),
          sel$r AS (
            SELECT vec_id, v, 1 - mc AS dist FROM sc$r
            ORDER BY mc ASC, vec_id ASC LIMIT 1),"""
      }.mkString("\n")
      val finals = (2 to k).map(r =>
        s"SELECT CAST($r AS INTEGER) AS rank, vec_id, round(dist, 6) AS dist FROM sel$r")
        .mkString("\n           UNION ALL ")
      s"""WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          sel1 AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('kc:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
          $rounds
          f AS (
            SELECT CAST(1 AS INTEGER) AS rank, vec_id,
              CAST(NULL AS DOUBLE) AS dist FROM sel1
           UNION ALL $finals)
         SELECT rank, vec_id, dist FROM f ORDER BY rank"""
    },
    "q169_saturation" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> array_to_string(t[i:i+2], ' ')))) AS g
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          f AS (SELECT g, min(doc_id) AS first FROM g GROUP BY g)
         SELECT doc_id, count(*) AS n_grams,
           count(CASE WHEN first = doc_id THEN 1 END) AS n_novel,
           round(count(CASE WHEN first = doc_id THEN 1 END)::DOUBLE
             / count(*), 6) AS novelty
         FROM g JOIN f USING (g)
         GROUP BY doc_id ORDER BY doc_id""",
    // the Bloom prescreen is exact-equivalent to the plain n-gram join
    // (no false negatives; FPs die in the verify join), so the oracle
    // is the EXACT join — the gate proves the sketch path lossless
    "q163_bloom_decontaminate" ->
      s"""WITH g AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 5, 0) + 1),
                i -> array_to_string(t[i:i+5], ' '))) AS shs
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          probes AS (
            SELECT DISTINCT unnest(shs) AS sh FROM g WHERE doc_id % 11 = 0),
          docsh AS (
            SELECT doc_id, unnest(shs) AS sh FROM g WHERE doc_id % 11 <> 0)
         SELECT doc_id, count(*) AS n_hits, min(sh) AS first_hit
         FROM docsh JOIN probes USING (sh)
         GROUP BY doc_id ORDER BY doc_id""",
    // same quality_score formula as q38; source mean over the rounded
    // doc scores (25–250 addends ⇒ sum-order noise ≪ the 6dp rounding)
    "q164_source_quality_gate" ->
      s"""WITH s AS (
            SELECT doc_id, source,
              round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0))
                + 0.3 * least(sr * 4, 1.0), 6) AS doc_score
            FROM (
              SELECT doc_id, source,
                CASE WHEN length(text) > 0 THEN
                  length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
                    / length(text)
                  ELSE 0.0 END AS pr,
                CASE WHEN len(toks) > 0 THEN
                  len(regexp_extract_all(lower(text),
                    '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                    / len(toks)
                  ELSE 0.0 END AS sr,
                CASE WHEN len(toks) >= 5 AND len(toks) <= 100000
                  THEN 1.0 ELSE 0.0 END AS lok
              FROM (SELECT doc_id, source, text, $Toks AS toks FROM documents))),
          ps AS (
            SELECT source, round(avg(doc_score), 6) AS source_score
            FROM s GROUP BY source)
         SELECT s.doc_id, s.source, s.doc_score, ps.source_score,
           ps.source_score >= 0.77 OR s.doc_score >= 0.85 AS keep,
           CASE WHEN ps.source_score >= 0.77 THEN 'ok'
                WHEN s.doc_score >= 0.85 THEN 'rescued'
                ELSE 'bad_source' END AS reason
         FROM s JOIN ps USING (source) ORDER BY s.doc_id""",
    // centroid = per-(label, dim) avg; the cosine kernel is an ordered
    // fold over the dim-sorted arrays on both engines
    "q165_centroid_similarity" ->
      """WITH e AS (
            SELECT label, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          d AS (
            SELECT label, u.i AS i, avg(v[u.i]) AS m
            FROM e, unnest(range(1, 65)) AS u(i) GROUP BY label, u.i),
          c AS (SELECT label, list(m ORDER BY i) AS c FROM d GROUP BY label),
          p AS (
            SELECT a.label AS group_a, b.label AS group_b,
              list_sum(list_transform(range(1, 65), i -> a.c[i] * b.c[i])) AS dot,
              sqrt(list_sum(list_transform(a.c, x -> x * x))) AS na,
              sqrt(list_sum(list_transform(b.c, x -> x * x))) AS nb
            FROM c a JOIN c b ON a.label < b.label)
         SELECT group_a, group_b,
           CASE WHEN na * nb > 0 THEN round(dot / (na * nb), 6)
                ELSE 0.0 END AS cosine
         FROM p ORDER BY group_a, group_b""",
    // q69's LSH + recursive closure, then per-cluster provenance:
    // origin = smallest member id (arg_min src), sources = sorted
    // distinct set
    "q166_syndication" ->
      s"""WITH RECURSIVE
          docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          u AS (SELECT id_a AS a, id_b AS b FROM verified
                UNION SELECT id_b AS a, id_a AS b FROM verified),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id),
          comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
          mem AS (
            SELECT c.comp, c.id, d.source AS src
            FROM comp c JOIN documents d ON d.doc_id = c.id),
          agg1 AS (
            SELECT comp, count(*) AS n_members,
              count(DISTINCT src) AS n_sources,
              min(id) AS origin_id, arg_min(src, id) AS origin_source
            FROM mem GROUP BY comp),
          srcs AS (
            SELECT comp, array_to_string(list(src ORDER BY src), ',') AS sources
            FROM (SELECT DISTINCT comp, src FROM mem) GROUP BY comp)
         SELECT a.comp, a.n_members, a.n_sources, a.origin_id,
           a.origin_source, s.sources
         FROM agg1 a JOIN srcs s USING (comp) ORDER BY a.comp""",
    // brute-force all-pairs truth: the Spark side must reproduce it
    // EXACTLY (prefix filtering is lossless), so the oracle does not
    // replay the blocking at all — the strongest possible gate
    "q159_set_similarity_join" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          pairs AS (
            SELECT a.id AS id_a, b.id AS id_b,
              len(list_intersect(a.sh, b.sh))::DOUBLE /
                len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE AS jac
            FROM docs a JOIN docs b ON a.id < b.id
            WHERE len(a.sh) > 0 AND len(b.sh) > 0)
         SELECT id_a, id_b, round(jac, 4) AS jaccard
         FROM pairs WHERE jac >= 0.5 ORDER BY id_a, id_b""",
    // same G² formula, same double op order (a·ln(a/(c·g/n)) — products
    // < 2^53 so int vs double association is exact); rank on unrounded g2
    "q160_keyword_saliency" ->
      s"""WITH tok AS (
            SELECT source, u.t AS term
            FROM (SELECT source, $Toks AS ts FROM documents), unnest(ts) AS u(t)),
          tc AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS a
            FROM tok GROUP BY 1, 2),
          ct AS (SELECT source, CAST(sum(a) AS BIGINT) AS c FROM tc GROUP BY 1),
          gt AS (SELECT term, CAST(sum(a) AS BIGINT) AS g FROM tc GROUP BY 1),
          nn AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM tc),
          sc AS (
            SELECT tc.source, tc.term, tc.a, gt.g,
              2.0 * (tc.a * ln(tc.a / (ct.c * gt.g / nn.n)) +
                CASE WHEN gt.g - tc.a > 0
                  THEN (gt.g - tc.a) *
                    ln((gt.g - tc.a) / ((nn.n - ct.c) * gt.g / nn.n))
                  ELSE 0.0 END) AS g2
            FROM tc JOIN ct USING (source) JOIN gt USING (term) CROSS JOIN nn
            WHERE gt.g >= 5 AND tc.a / ct.c > gt.g / nn.n),
          rk AS (
            SELECT source, term, a, g, g2,
              row_number() OVER (
                PARTITION BY source ORDER BY g2 DESC, term ASC) AS rank
            FROM sc)
         SELECT source, CAST(rank AS INTEGER) AS rank, term,
           a AS n_in, g - a AS n_out, round(g2, 4) AS g2
         FROM rk WHERE rank <= 3 ORDER BY source, rank""",
    "q34_simhash" ->
      s"""SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 16), b ->
            CASE WHEN coalesce(list_sum(list_transform(toks, t ->
                CASE WHEN (('0x' || substr(md5(t), 1, 15))::BIGINT >> b) & 1 = 1
                     THEN 1 ELSE -1 END)), 0) > 0
                 THEN 1 << b ELSE 0 END)) AS BIGINT) AS simhash
          FROM (SELECT doc_id, list_distinct($Toks) AS toks FROM documents)
          ORDER BY doc_id""",
    "q36_ann_lsh" ->
      """WITH sig AS (
            -- random-hyperplane signature, table 0 ("hp0"), 6 planes:
            -- w(p,j) = (md5_60bit('hp0:p:j') % 2001 − 1000)/1000
            SELECT vec_id, embedding,
              list_sum(list_transform(range(0, 6), p ->
                CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), j ->
                  embedding[j]::DOUBLE *
                    (((('0x' || substr(md5('hp0:' || p::VARCHAR || ':' || (j-1)::VARCHAR), 1, 15))::BIGINT
                       % 2001) - 1000) / 1000.0))) >= 0
                THEN 1 << p ELSE 0 END)) AS s
            FROM embeddings),
          cand AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              q.embedding AS qv, c.embedding AS cv
            FROM sig q JOIN sig c ON q.s = c.s AND q.vec_id <> c.vec_id
            WHERE q.vec_id < 5),
          scored AS (
            SELECT query_id, neighbor_id,
              list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
               sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS cosine
            FROM cand)
          SELECT query_id, rank, neighbor_id, round(cosine, 4) AS cosine FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
          WHERE rank <= 5 ORDER BY query_id, rank""",
    "q35_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          scored AS (
            SELECT query_id, neighbor_id,
              list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
               sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS cosine
            FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
          SELECT query_id, rank, neighbor_id, round(cosine, 4) AS cosine FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
          WHERE rank <= 5 ORDER BY query_id, rank""",
    "q56_embedding_neardup" ->
      """WITH sig AS (
            SELECT vec_id, embedding,
              list_sum(list_transform(range(0, 4), p ->
                CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), j ->
                  embedding[j]::DOUBLE *
                    (((('0x' || substr(md5('hp:' || p::VARCHAR || ':' || (j-1)::VARCHAR), 1, 15))::BIGINT
                       % 2001) - 1000) / 1000.0))) >= 0
                THEN 1 << p ELSE 0 END)) AS s
            FROM embeddings)
          SELECT id_a, id_b, round(cosine, 4) AS cosine FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              list_sum(list_transform(range(1, len(a.embedding) + 1),
                i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
               sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) AS cosine
            FROM sig a JOIN sig b ON a.s = b.s AND a.vec_id < b.vec_id)
          WHERE cosine >= 0.3 ORDER BY id_a, id_b""",
    "q37_lang_id" ->
      """SELECT lang, pred, count(*) AS n FROM (
           SELECT lang,
             CASE
               WHEN s_de = best AND best > 0 THEN 'de'
               WHEN s_en = best AND best > 0 THEN 'en'
               WHEN s_es = best AND best > 0 THEN 'es'
               WHEN s_fr = best AND best > 0 THEN 'fr'
               ELSE 'und' END AS pred
           FROM (
             SELECT lang,
               len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|zu)\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it)\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|es|una|para)\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|une|dans)\b')) AS s_fr,
               greatest(
                 len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|zu)\b')),
                 len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it)\b')),
                 len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|es|una|para)\b')),
                 len(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|une|dans)\b'))) AS best
             FROM documents))
         GROUP BY lang, pred ORDER BY lang, pred""",
    "q38_quality" ->
      s"""SELECT doc_id,
          length(text) AS n_chars,
          len(toks) AS n_tokens,
          round(CASE WHEN len(toks) > 0
            THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks)
            ELSE 0.0 END, 4) AS mean_token_len,
          round(pr, 4) AS punct_ratio,
          round(sr, 4) AS stopword_ratio,
          round(0.4 * lok + 0.3 * (1.0 - least(pr * 5, 1.0)) + 0.3 * least(sr * 4, 1.0), 6)
            AS quality_score
          FROM (
            SELECT doc_id, text, toks,
              CASE WHEN length(text) > 0 THEN
                length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE / length(text)
                ELSE 0.0 END AS pr,
              CASE WHEN len(toks) > 0 THEN
                len(regexp_extract_all(lower(text),
                  '\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b'))::DOUBLE
                  / len(toks)
                ELSE 0.0 END AS sr,
              CASE WHEN len(toks) >= 5 AND len(toks) <= 100000 THEN 1.0 ELSE 0.0 END AS lok
            FROM (SELECT doc_id, text, $Toks AS toks FROM documents WHERE doc_id < 50))
          ORDER BY doc_id""",
    "q39_token_stats" ->
      s"""SELECT source, count(*) AS n_docs,
          CAST(sum(len(toks)) AS BIGINT) AS sum_tokens,
          CAST(sum(
            coalesce(list_sum(list_transform(toks, t -> CAST(ceil(len(t) / 4.0) AS BIGINT))), 0)
            + length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))) AS BIGINT) AS sum_bpe_tokens,
          round(avg(len(toks)), 4) AS avg_tokens
          FROM (SELECT source, text, $Toks AS toks FROM documents)
          GROUP BY source ORDER BY source""",
    "q54_token_topk" ->
      s"""SELECT token, count(*) AS freq
          FROM (SELECT unnest($Toks) AS token FROM documents)
          GROUP BY token ORDER BY freq DESC, token ASC LIMIT 20""",
    "q40_fingerprint" ->
      """SELECT doc_id,
          md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
          FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "q57_scrub_pii" ->
      """SELECT doc_id,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                text || ' contact bob@example.com or https://example.com/x?id=1 tel 5551234567',
                '(https?://|www\.)[^\s]+', '<URL>', 'g'),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\d{7,}', '<NUM>', 'g') AS clean
          FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
    "q41_media_bytes" ->
      """SELECT doc_id AS media_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          md5(text) AS payload_md5
          FROM documents WHERE doc_id < 20 ORDER BY media_id""",
    "q42_media_features" ->
      """SELECT doc_id AS media_id,
          round(ascii(substr(text, ((0 * greatest(1, length(text) // 4)) % length(text)) + 1, 1)) / 255.0, 6) AS f0,
          round(ascii(substr(text, ((1 * greatest(1, length(text) // 4)) % length(text)) + 1, 1)) / 255.0, 6) AS f1,
          round(ascii(substr(text, ((2 * greatest(1, length(text) // 4)) % length(text)) + 1, 1)) / 255.0, 6) AS f2,
          round(ascii(substr(text, ((3 * greatest(1, length(text) // 4)) % length(text)) + 1, 1)) / 255.0, 6) AS f3
          FROM documents WHERE doc_id < 20 ORDER BY media_id""",
    // hand-computed luminance histograms of the generated fixtures
    "q60_media_decode" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(4 AS INTEGER), CAST(4 AS INTEGER), CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
          (2, 2, 3, 0.0, 0.0, 0.0, 1.0),
          (3, 2, 2, 0.5, 0.0, 0.0, 0.5),
          (4, 3, 1, 0.0, 0.0, 1.0, 0.0),
          (5, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, img_width, img_height, f0, f1, f2, f3)
         ORDER BY media_id""",
    "q73_profile" ->
      """SELECT * FROM (
          SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
            count(*) - count(l_orderkey) AS n_nulls,
            count(DISTINCT l_orderkey) AS n_distinct,
            CAST(min(l_orderkey) AS DOUBLE) AS min_num,
            CAST(max(l_orderkey) AS DOUBLE) AS max_num,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
            count(DISTINCT l_quantity),
            min(l_quantity), max(l_quantity), NULL, NULL
          FROM lineitem
          UNION ALL
          SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
            count(DISTINCT l_returnflag),
            NULL, NULL, min(l_returnflag), max(l_returnflag)
          FROM lineitem
          UNION ALL
          SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
            count(DISTINCT l_shipdate),
            NULL, NULL, NULL, NULL
          FROM lineitem)
         ORDER BY "column"""",
    "q71_surprisal" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest($Toks) AS term FROM documents),
          freq AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
          tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
         SELECT doc_id, count(*) AS n_tokens,
           round(avg(-ln(c / t)), 6) AS surprisal
         FROM tok JOIN freq USING (term) CROSS JOIN tot
         WHERE doc_id < 30
         GROUP BY doc_id ORDER BY doc_id""",
    // the q32 LSH pairs verbatim, then id-ordered triangle
    // enumeration (a<b<c via two joins) — the declarative spec the
    // engine's degree-oriented wedge counting must reproduce
    "q133_triangle_cohesion" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          und AS (
            SELECT id_a AS u, id_b AS v FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          deg AS (
            SELECT id, count(*) AS degree FROM (
              SELECT u AS id FROM und UNION ALL SELECT v FROM und)
            GROUP BY id),
          tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM und e1
            JOIN und e2 ON e2.u = e1.v
            JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
          pern AS (
            SELECT id, count(*) AS triangles FROM (
              SELECT unnest([a, b, c]) AS id FROM tri)
            GROUP BY id)
         SELECT d.id, d.degree,
           coalesce(p.triangles, 0) AS triangles,
           CASE WHEN d.degree >= 2
             THEN round(coalesce(p.triangles, 0) * 2.0
                        / (d.degree * (d.degree - 1)), 4)
             ELSE 0.0 END AS clustering
         FROM deg d LEFT JOIN pern p USING (id)
         ORDER BY id""",
    // same total order (n_chars desc, doc_id), same snake deal; the
    // engine's two-phase ordinal must reproduce this global rank
    "q132_shard_manifest" ->
      """WITH ranked AS (
           SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1 AS rank
           FROM documents),
         assigned AS (
           SELECT n_chars,
             CASE WHEN (rank // 8) % 2 = 0 THEN rank % 8
                  ELSE 7 - rank % 8 END AS shard
           FROM ranked),
         per AS (
           SELECT shard, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_weight
           FROM assigned GROUP BY shard),
         tot AS (SELECT CAST(sum(total_weight) AS DOUBLE) AS t FROM per)
         SELECT shard, n_docs, total_weight,
           round(total_weight / (t / 8), 4) AS balance
         FROM per CROSS JOIN tot ORDER BY shard""",
    // q71's surprisal + per-source ntile(3) — rank arithmetic only at
    // the tier boundaries (no float cutpoint comparison cross-engine)
    "q131_perplexity_buckets" ->
      s"""WITH tok AS (
            SELECT doc_id, unnest($Toks) AS term FROM documents),
          freq AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
          tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq),
          sur AS (
            SELECT doc_id, count(*) AS n_tokens,
              round(avg(-ln(c / t)), 6) AS surprisal
            FROM tok JOIN freq USING (term) CROSS JOIN tot
            GROUP BY doc_id),
          b AS (
            SELECT d.doc_id, d.source, s.n_tokens, s.surprisal,
              ntile(3) OVER (
                PARTITION BY d.source
                ORDER BY s.surprisal, d.doc_id) AS bucket_ord
            FROM documents d JOIN sur s USING (doc_id))
         SELECT doc_id, source, n_tokens, surprisal, bucket_ord,
           CASE bucket_ord WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM b WHERE doc_id < 60 ORDER BY doc_id""",
    // one (i,j) grid cross the corpus; identical E[xy]−E[x]E[y]
    // arithmetic, 6dp absorbs partial-sum order
    "q134_cov_matrix" ->
      """WITH emb AS (
           SELECT list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         ij AS (
           SELECT a.i AS i, b.j AS j
           FROM (SELECT unnest(range(0, 64)) AS i) a
           CROSS JOIN (SELECT unnest(range(0, 64)) AS j) b),
         p AS (
           SELECT i, j, count(*) AS n,
             sum(e.v[CAST(i AS INT) + 1] * e.v[CAST(j AS INT) + 1]) AS sij,
             sum(e.v[CAST(i AS INT) + 1]) AS si,
             sum(e.v[CAST(j AS INT) + 1]) AS sj
           FROM emb e CROSS JOIN ij GROUP BY i, j)
         SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           round(sij / n - (si / n) * (sj / n), 6) + 0.0 AS cov
         FROM p ORDER BY i, j""",
    // the q134 covariance cells (6dp-rounded — the engine-neutral
    // start) power-iterated 8 rounds as MATERIALIZED CTEs; per-step
    // round(·,12) keeps the matvec sums on the shared grid, then a
    // sequential-fold projection scan per label
    "q226_pca_project" -> {
      val steps = (1 to 8).map { t =>
        s"""w$t AS MATERIALIZED (
              SELECT c.i, sum(c.cov * v.val) AS w
              FROM cov c JOIN v${t - 1} v ON c.j = v.i GROUP BY c.i),
            n$t AS (SELECT sqrt(sum(w * w)) AS nm FROM w$t),
            v$t AS MATERIALIZED (
              SELECT i, round(w / n$t.nm, 12) AS val
              FROM w$t CROSS JOIN n$t)"""
      }.mkString(",\n")
      s"""WITH emb AS (
           SELECT list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
         ij AS (
           SELECT a.i AS i, b.j AS j
           FROM (SELECT unnest(range(0, 64)) AS i) a
           CROSS JOIN (SELECT unnest(range(0, 64)) AS j) b),
         p AS (
           SELECT i, j, count(*) AS n,
             sum(e.v[CAST(i AS INT) + 1] * e.v[CAST(j AS INT) + 1]) AS sij,
             sum(e.v[CAST(i AS INT) + 1]) AS si,
             sum(e.v[CAST(j AS INT) + 1]) AS sj
           FROM emb e CROSS JOIN ij GROUP BY i, j),
         cov AS MATERIALIZED (
           SELECT i, j, round(sij / n - (si / n) * (sj / n), 6) + 0.0 AS cov
           FROM p),
         v0 AS (
           SELECT unnest(range(0, 64)) AS i, round(1 / sqrt(64), 12) AS val),
         $steps,
         fl AS (
           SELECT CASE WHEN (SELECT val FROM v8 WHERE abs(val) > 1e-6
                             ORDER BY i LIMIT 1) < 0
                  THEN -1.0 ELSE 1.0 END AS f),
         vf AS MATERIALIZED (
           SELECT i, f * val AS val FROM v8 CROSS JOIN fl),
         wf AS (
           SELECT c.i, sum(c.cov * v.val) AS w
           FROM cov c JOIN vf v ON c.j = v.i GROUP BY c.i),
         lam AS (
           SELECT sum(v.val * w.w) AS l
           FROM vf v JOIN wf w ON v.i = w.i),
         tr AS (SELECT sum(cov) AS t FROM cov WHERE i = j),
         ex AS (
           SELECT CASE WHEN t > 0 THEN l / t ELSE 0.0 END AS e
           FROM lam CROSS JOIN tr),
         varr AS (SELECT list(val ORDER BY i) AS vl FROM vf),
         embl AS (
           SELECT label, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
         proj AS (
           SELECT e2.label,
             list_sum(list_transform(range(1, 65),
               ix -> e2.v[ix] * va.vl[ix])) AS p
           FROM embl e2 CROSS JOIN varr va)
        SELECT label, count(*) AS n_vecs,
          round(avg(p), 4) AS mean_pc1,
          round(min(p), 6) AS min_pc1,
          round(max(p), 6) AS max_pc1,
          round((SELECT e FROM ex) * 1e6) / 1e6 AS explained_share
        FROM proj GROUP BY label ORDER BY label"""
    },

    // words = non-space runs, sentences = [.!?]+ runs (min 1),
    // syllables = per-word [aeiouy]+ groups (min 1); the score is one
    // branch-free expression evaluated identically, 4dp floor-grid
    "q228_readability" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
               x -> len(x) > 0) AS ws,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS n_sentences
           FROM documents),
         c AS (
           SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words, n_sentences,
             CAST(coalesce(list_sum(list_transform(ws, x ->
               greatest(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1)
             )), 0) AS BIGINT) AS n_syllables
           FROM w)
        SELECT doc_id, n_words, n_sentences, n_syllables,
          CASE WHEN n_words > 0 THEN
            floor((206.835
              - 1.015 * (n_words::DOUBLE / n_sentences)
              - 84.6 * (n_syllables::DOUBLE / n_words)) * 1e4 + 0.5) / 1e4
          END AS flesch,
          CASE WHEN n_words = 0 THEN 'empty'
               WHEN flesch >= 90 THEN 'very_easy'
               WHEN flesch >= 70 THEN 'easy'
               WHEN flesch >= 50 THEN 'medium'
               WHEN flesch >= 30 THEN 'hard'
               ELSE 'very_hard' END AS band
        FROM c ORDER BY doc_id""",

    // zero cells contribute E and Σ_all E = n, so χ² over observed
    // cells only is Σ((n·O−r·c)² − (r·c)²)/(r·c)/n + n; per-cell terms
    // are identical IEEE doubles in both engines, the cell sum rounds
    // at 6dp, and V is derived from the ROUNDED χ²
    "q232_cramers_v" ->
      """WITH o AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
         ra AS (SELECT lang, CAST(count(*) AS BIGINT) AS r
                FROM documents GROUP BY 1),
         cb AS (SELECT source, CAST(count(*) AS BIGINT) AS c
                FROM documents GROUP BY 1),
         t AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT lang) AS BIGINT) AS ca,
             CAST(count(DISTINCT source) AS BIGINT) AS cb2
           FROM documents),
         chi AS (
           SELECT t.n, t.ca, t.cb2,
             round(sum((pow(CAST(t.n * o.o - ra.r * cb.c AS DOUBLE), 2)
                 - pow(CAST(ra.r * cb.c AS DOUBLE), 2))
               / CAST(ra.r * cb.c AS DOUBLE)) / t.n + t.n, 6) AS chi2
           FROM o JOIN ra USING (lang) JOIN cb USING (source) CROSS JOIN t
           GROUP BY t.n, t.ca, t.cb2)
        SELECT n, ca AS card_a, cb2 AS card_b,
          (ca - 1) * (cb2 - 1) AS dof, chi2,
          floor(sqrt(chi2 / CAST(n * (least(ca, cb2) - 1) AS DOUBLE))
            * 1e6 + 0.5) / 1e6 AS cramers_v
        FROM chi""",

    // cumulative tokens N and first-occurrence vocabulary V per doc in
    // doc_id order (plain window cumsum here; the Spark side's bucketed
    // prefix decomposition yields identical integers), then zipf_fit's
    // 5-sum OLS on (ln N, ln V)
    "q237_heaps_fit" ->
      s"""WITH toks AS (
            SELECT doc_id, $Toks AS ts FROM documents),
          pd AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS nt FROM toks),
          fo AS (
            SELECT term, min(doc_id) AS fid FROM (
              SELECT doc_id, unnest(ts) AS term FROM toks) u
            GROUP BY 1),
          nvt AS (
            SELECT fid AS doc_id, CAST(count(*) AS BIGINT) AS nv
            FROM fo GROUP BY 1),
          base AS (
            SELECT pd.doc_id, pd.nt, coalesce(nvt.nv, 0) AS nv
            FROM pd LEFT JOIN nvt USING (doc_id)),
          cum AS (
            SELECT doc_id,
              CAST(sum(nt) OVER cw AS BIGINT) AS cn,
              CAST(sum(nv) OVER cw AS BIGINT) AS cv
            FROM base
            WINDOW cw AS (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          pts AS (
            SELECT ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y,
              cn, cv
            FROM cum WHERE cn > 0 AND cv > 0),
          a AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(max(cn) AS BIGINT) AS total_tokens,
              CAST(max(cv) AS BIGINT) AS vocab,
              sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
              sum(x * x) AS sxx, sum(y * y) AS syy
            FROM pts)
         SELECT n AS n_docs, total_tokens, vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
           round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
             / n), 6) AS k,
           round(CASE WHEN (n * syy - sy * sy) > 0
             THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy))
             ELSE 0.0 END, 6) AS r2
         FROM a""",

    // dedup (doc, 3-gram) incidence → shingle degrees (the [2,20] band
    // = the rarity filter) → within-shingle pairs; identical 1/ln(deg)
    // addends in both engines, 6dp floor-grid, id tie-break
    "q229_link_prediction" ->
      s"""WITH inc AS (
            SELECT DISTINCT doc_id AS u, s.s AS i
            FROM (SELECT doc_id, $Toks AS t FROM documents),
              unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                ix -> t[ix] || ' ' || t[ix+1] || ' ' || t[ix+2])) AS s(s)),
          deg AS (
            SELECT i, CAST(count(*) AS BIGINT) AS d FROM inc GROUP BY 1),
          k AS (
            SELECT inc.u, inc.i, deg.d FROM inc JOIN deg USING (i)
            WHERE d BETWEEN 2 AND 20),
          p AS (
            SELECT a.u AS node_a, b.u AS node_b,
              CAST(count(*) AS BIGINT) AS common,
              sum(1.0 / ln(CAST(a.d AS DOUBLE))) AS aa
            FROM k a JOIN k b ON a.i = b.i AND a.u < b.u
            GROUP BY 1, 2)
         SELECT node_a, node_b, common,
           floor(aa * 1e6 + 0.5) / 1e6 AS adamic_adar
         FROM p WHERE common >= 2
         ORDER BY adamic_adar DESC, node_a, node_b LIMIT 50""",

    // depth-capped recursive closure; min(d) per node = the BFS hop
    // distance (UNION-distinct keeps the state space (id, d) finite)
    "q238_bfs_hops" ->
      """WITH RECURSIVE und AS (
           SELECT doc_id AS a, (doc_id * 7 + 3) % 600 AS b
           FROM documents),
         e2 AS (
           SELECT a AS src, b AS dst FROM und WHERE a <> b
           UNION
           SELECT b AS src, a AS dst FROM und WHERE a <> b),
         walk(id, d) AS (
           SELECT doc_id, 0 FROM documents WHERE doc_id < 3
           UNION
           SELECT e2.dst, w.d + 1
           FROM walk w JOIN e2 ON w.id = e2.src
           WHERE w.d < 4)
        SELECT id, CAST(min(d) AS INT) AS hops
        FROM walk GROUP BY id ORDER BY id""",

    // q37's prediction expression, then exact-integer P/R and F1 from
    // the UNROUNDED ratios in the same operation order
    "q240_classification_report" ->
      """WITH pr AS (
           SELECT lang,
             CASE
               WHEN s_de = best AND best > 0 THEN 'de'
               WHEN s_en = best AND best > 0 THEN 'en'
               WHEN s_es = best AND best > 0 THEN 'es'
               WHEN s_fr = best AND best > 0 THEN 'fr'
               ELSE 'und' END AS pred
           FROM (
             SELECT lang,
               len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|zu)\b')) AS s_de,
               len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it)\b')) AS s_en,
               len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|es|una|para)\b')) AS s_es,
               len(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|une|dans)\b')) AS s_fr,
               greatest(
                 len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|zu)\b')),
                 len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in|that|it)\b')),
                 len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|es|una|para)\b')),
                 len(regexp_extract_all(lower(text), '\b(le|la|et|les|des|est|une|dans)\b'))) AS best
             FROM documents)),
         tr AS (SELECT lang AS clazz, CAST(count(*) AS BIGINT) AS n_true
                FROM pr GROUP BY 1),
         pd AS (SELECT pred AS clazz, CAST(count(*) AS BIGINT) AS n_pred
                FROM pr GROUP BY 1),
         tp AS (SELECT lang AS clazz, CAST(count(*) AS BIGINT) AS tp
                FROM pr WHERE lang = pred GROUP BY 1),
         j AS (
           SELECT coalesce(tr.clazz, pd.clazz) AS clazz,
             coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred
           FROM tr FULL OUTER JOIN pd ON tr.clazz = pd.clazz),
         f AS (
           SELECT j.clazz, n_true, n_pred, coalesce(tp.tp, 0) AS tp,
             CASE WHEN n_pred > 0
               THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) / n_pred
               ELSE 0.0 END AS p,
             CASE WHEN n_true > 0
               THEN CAST(coalesce(tp.tp, 0) AS DOUBLE) / n_true
               ELSE 0.0 END AS r
           FROM j LEFT JOIN tp ON j.clazz = tp.clazz)
        SELECT clazz, n_true, n_pred, tp,
          round(p, 6) AS "precision", round(r, 6) AS recall,
          round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
            ELSE 0.0 END, 6) AS f1
        FROM f ORDER BY clazz""",

    // q64's recursive closure for the assignment, then the integer
    // modularity core Σ(4m·l_c − d_c²) / 4m²
    "q271_modularity" ->
      """WITH RECURSIVE
          e AS (SELECT doc_id AS a, doc_id + 1 + (doc_id % 3) AS b
                FROM documents WHERE doc_id % 5 < 2),
          und AS (
            SELECT least(a, b) AS u, greatest(a, b) AS v
            FROM e WHERE a <> b GROUP BY 1, 2),
          u2 AS (SELECT u AS a, v AS b FROM und
                 UNION SELECT v, u FROM und),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u2
            UNION
            SELECT u2.a AS id, reach.r AS r
            FROM u2 JOIN reach ON u2.b = reach.id),
          comp AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
          tagged AS (
            SELECT und.u, und.v, cu.c AS cu, cv.c AS cv
            FROM und JOIN comp cu ON und.u = cu.id
                     JOIN comp cv ON und.v = cv.id),
          m AS (SELECT CAST(count(*) AS BIGINT) AS mm FROM tagged),
          lc AS (
            SELECT cu AS c, CAST(count(*) AS BIGINT) AS l
            FROM tagged WHERE cu = cv GROUP BY 1),
          dc AS (
            SELECT c, CAST(count(*) AS BIGINT) AS d FROM (
              SELECT cu AS c FROM tagged
              UNION ALL SELECT cv FROM tagged)
            GROUP BY 1)
         SELECT m.mm AS m_edges, CAST(count(*) AS BIGINT) AS n_communities,
           round(CAST(sum(4 * m.mm * coalesce(lc.l, 0) - dc.d * dc.d)
               AS DOUBLE)
             / (4.0::DOUBLE * m.mm * m.mm), 6) AS modularity
         FROM dc LEFT JOIN lc USING (c) CROSS JOIN m
         GROUP BY m.mm""",
    // three synchronous rounds unrolled; argmax = (count DESC, label
    // ASC) row_number, the exact mirror of the struct-min
    "q272_label_propagation" -> {
      val rounds = (1 to 3).map { t =>
        s"""f$t AS MATERIALIZED (
              SELECT s.src, l.label, CAST(count(*) AS BIGINT) AS n
              FROM sym s JOIN l${t - 1} l ON s.dst = l.id
              GROUP BY 1, 2),
            b$t AS (
              SELECT src AS id, label FROM (
                SELECT src, label, row_number() OVER (
                  PARTITION BY src ORDER BY n DESC, label ASC) AS rn
                FROM f$t) WHERE rn = 1),
            l$t AS MATERIALIZED (
              SELECT nodes.id, coalesce(b$t.label, nodes.id) AS label
              FROM nodes LEFT JOIN b$t USING (id))"""
      }.mkString(",\n")
      s"""WITH e AS (
            SELECT doc_id AS a, (doc_id * 7 + 3) % 600 AS b
            FROM documents),
          sym AS (
            SELECT a AS src, b AS dst FROM e WHERE a <> b
            UNION SELECT b, a FROM e WHERE a <> b),
          nodes AS (SELECT DISTINCT src AS id FROM sym),
          l0 AS (SELECT id, id AS label FROM nodes),
          $rounds
         SELECT id, label FROM l3 ORDER BY id"""
    },
    // md5-lowest-100 sample, all sample pairs, identical sequential
    // cosine folds, 0.1-wide bins
    "q268_pairdist_histogram" ->
      """WITH s AS (
           SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE)
             AS v
           FROM embeddings
           ORDER BY md5('pd:' || CAST(vec_id AS VARCHAR)) LIMIT 100),
         p AS (
           SELECT list_sum(list_transform(range(1, len(a.v) + 1),
               i -> a.v[i] * b.v[i])) /
             (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
              sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
           FROM s a JOIN s b ON a.id < b.id),
         bins AS (
           SELECT CAST(floor(cos * 10) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_pairs
           FROM p GROUP BY 1),
         t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tt FROM bins)
        SELECT bin, round(bin / 10.0::DOUBLE, 1) AS cos_lo, n_pairs,
          round(CAST(n_pairs AS DOUBLE) / tt, 6) AS share
        FROM bins CROSS JOIN t ORDER BY bin""",
    // depth-truncated rankings joined at the id; X_d counts pairs with
    // max rank ≤ d; the 50-term weighted fold rounds at 6dp
    "q269_rbo" ->
      s"""WITH a AS (
            SELECT doc_id, rank FROM (
              SELECT doc_id, row_number() OVER (
                ORDER BY n_chars DESC, doc_id) AS rank
              FROM documents) WHERE rank <= 50),
          b AS (
            SELECT doc_id, rank FROM (
              SELECT doc_id, row_number() OVER (
                ORDER BY len($Toks) DESC, doc_id) AS rank
              FROM documents) WHERE rank <= 50),
          m AS (
            SELECT greatest(a.rank, b.rank) AS m
            FROM a JOIN b USING (doc_id)),
          xd AS (
            SELECT d.d, CAST(count(*) AS BIGINT) AS x
            FROM m, unnest(range(1, 51)) AS d(d)
            WHERE m.m <= d.d GROUP BY 1)
         SELECT CAST(50 AS INT) AS depth, 0.9::DOUBLE AS p,
           CAST(coalesce(sum(CASE WHEN d = 50 THEN x END), 0) AS BIGINT)
             AS overlap_at_depth,
           round((1.0::DOUBLE - 0.9::DOUBLE)
             * coalesce(sum(pow(0.9::DOUBLE, d - 1) * x / d), 0.0), 6)
             AS rbo_min
         FROM xd""",
    // q72's 8-gram probe hit set reduced to a count, then the closed-
    // form Wilson 95% bounds in the identical operation order
    "q270_wilson_contamination" ->
      s"""WITH g AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                i -> array_to_string(t[i:i+7], ' '))) AS shs
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          probes AS (
            SELECT DISTINCT unnest(shs) AS sh FROM g WHERE doc_id % 7 = 0),
          docsh AS (
            SELECT doc_id, unnest(shs) AS sh FROM g WHERE doc_id % 7 <> 0),
          kk AS (
            SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS k
            FROM docsh JOIN probes USING (sh)),
          nn AS (
            SELECT CAST(count(*) AS BIGINT) AS n
            FROM documents WHERE doc_id % 7 <> 0)
         SELECT n, k,
           round(CAST(k AS DOUBLE) / n, 6) AS rate,
           round((CAST(k AS DOUBLE) / n
               + (1.96::DOUBLE * 1.96::DOUBLE) / (2.0::DOUBLE * n)
               - 1.96::DOUBLE * sqrt(
                   (CAST(k AS DOUBLE) / n) * (1.0::DOUBLE - CAST(k AS DOUBLE) / n) / n
                   + (1.96::DOUBLE * 1.96::DOUBLE)
                     / (4.0::DOUBLE * n * n)))
             / (1.0::DOUBLE + (1.96::DOUBLE * 1.96::DOUBLE) / n), 6)
             AS wilson_lo,
           round((CAST(k AS DOUBLE) / n
               + (1.96::DOUBLE * 1.96::DOUBLE) / (2.0::DOUBLE * n)
               + 1.96::DOUBLE * sqrt(
                   (CAST(k AS DOUBLE) / n) * (1.0::DOUBLE - CAST(k AS DOUBLE) / n) / n
                   + (1.96::DOUBLE * 1.96::DOUBLE)
                     / (4.0::DOUBLE * n * n)))
             / (1.0::DOUBLE + (1.96::DOUBLE * 1.96::DOUBLE) / n), 6)
             AS wilson_hi
         FROM kk CROSS JOIN nn""",
    // distinct 3-gram types → md5 buckets → count-of-counts + summary
    "q266_feature_hash_audit" ->
      s"""WITH ty AS (
            SELECT DISTINCT s.s AS t
            FROM (SELECT $Toks AS tk FROM documents),
              unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                ix -> tk[ix] || ' ' || tk[ix+1] || ' ' || tk[ix+2])) AS s(s)),
          ld AS (
            SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 256 AS b,
              CAST(count(*) AS BIGINT) AS load
            FROM ty GROUP BY 1),
          hist AS (
            SELECT load, CAST(count(*) AS BIGINT) AS n_buckets
            FROM ld GROUP BY 1),
          sm AS (
            SELECT CAST(sum(load) AS BIGINT) AS n_types,
              CAST(count(*) AS BIGINT) AS buckets_used
            FROM ld)
         SELECT load, n_buckets, n_types, buckets_used,
           round(1.0 - CAST(buckets_used AS DOUBLE) / n_types, 6)
             AS collision_rate
         FROM hist CROSS JOIN sm ORDER BY load""",
    // type-frequency count-of-counts: V₁/N and V + V₁²/(2V₂), all
    // integer until the two final divisions
    "q267_chao1_unseen" ->
      s"""WITH f AS (
            SELECT s.s AS t, CAST(count(*) AS BIGINT) AS f
            FROM (SELECT $Toks AS tk FROM documents),
              unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                ix -> tk[ix] || ' ' || tk[ix+1] || ' ' || tk[ix+2])) AS s(s)
            GROUP BY 1),
          a AS (
            SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS vocab,
              CAST(count(CASE WHEN f = 1 THEN 1 END) AS BIGINT) AS v1,
              CAST(count(CASE WHEN f = 2 THEN 1 END) AS BIGINT) AS v2
            FROM f)
         SELECT n_tokens, vocab, v1, v2,
           round(CAST(v1 AS DOUBLE) / n_tokens, 6) AS unseen_mass,
           round(vocab + CASE WHEN v2 > 0
             THEN CAST(v1 AS DOUBLE) * v1 / (2 * v2)
             ELSE v1 * (v1 - 1) / 2.0::DOUBLE END, 2) AS chao1
         FROM a""",

    // full-dim truth knn vs 16-dim-prefix knn (identical sequential
    // cosine folds), joined at (query, neighbor) for recall@5
    "q262_matryoshka_recall" ->
      """WITH q AS (
           SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv
               FROM embeddings),
         tru AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
               AS rank
             FROM (
               SELECT query_id, neighbor_id,
                 list_sum(list_transform(range(1, len(qv) + 1),
                   i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
                 (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                    i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
                  sqrt(list_sum(list_transform(range(1, len(cv) + 1),
                    i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS cosine
               FROM c CROSS JOIN q WHERE neighbor_id <> query_id))
           WHERE rank <= 5),
         apx AS (
           SELECT query_id, neighbor_id FROM (
             SELECT query_id, neighbor_id, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC)
               AS rank
             FROM (
               SELECT query_id, neighbor_id,
                 list_sum(list_transform(range(1, 17),
                   i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
                 (sqrt(list_sum(list_transform(range(1, 17),
                    i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
                  sqrt(list_sum(list_transform(range(1, 17),
                    i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS cosine
               FROM c CROSS JOIN q WHERE neighbor_id <> query_id))
           WHERE rank <= 5)
        SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
          CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
          round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 6)
            AS recall
        FROM tru t LEFT JOIN apx a
          USING (query_id, neighbor_id)
        GROUP BY t.query_id ORDER BY query_id""",

    // (doc, 8-gram) distinct → gram-grain min(doc) → doc-grain share
    "q283_novelty_rate" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(list_transform(
                range(1, greatest(len(t) - 7, 0) + 1),
                i -> array_to_string(t[i:i+7], ' ')))) AS gram
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          f AS (SELECT gram, min(doc_id) AS fid FROM g GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(CASE WHEN fid = doc_id THEN 1 END) AS BIGINT)
             AS n_new,
           round(CAST(count(CASE WHEN fid = doc_id THEN 1 END) AS DOUBLE)
             / count(*), 4) AS novelty_rate
         FROM g JOIN f USING (gram)
         GROUP BY doc_id ORDER BY doc_id""",
    // fixed-width token chunks rebuilt with single spaces, the q37
    // language CASE per chunk, doc-grain agreement
    "q280_code_switching" ->
      s"""WITH d AS (
            SELECT doc_id, text, $Toks AS t FROM documents),
          ch AS (
            SELECT doc_id, ${langCaseSql("text")} AS doc_lang,
              array_to_string(t[i.i * 32 + 1 : i.i * 32 + 32], ' ') AS chunk
            FROM d, unnest(range(0, greatest((len(t) - 1) // 32, 0) + 1))
              AS i(i)),
          cl AS (
            SELECT doc_id, doc_lang, ${langCaseSql("chunk")} AS chl
            FROM ch WHERE len(chunk) > 0),
          counts AS (
            SELECT doc_id, doc_lang, chl, CAST(count(*) AS BIGINT) AS c
            FROM cl GROUP BY 1, 2, 3)
         SELECT doc_id, doc_lang,
           CAST(sum(c) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_langs,
           round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS majority_share
         FROM counts GROUP BY doc_id, doc_lang ORDER BY doc_id""",
    // per-source exact deciles (quantile_cont ≡ Percentiles.exact),
    // W1 ≈ mean |q_a(i) − q_b(i)| over the 9-point grid — a fixed
    // expression, no float aggregation
    "q281_wasserstein_drift" -> {
      val qs = (1 to 9).map(i =>
        s"quantile_cont(n_chars, 0.$i) AS p$i").mkString(", ")
      val terms = (1 to 9).map(i => s"abs(a.p$i - b.p$i)").mkString(" + ")
      s"""WITH decs AS (
            SELECT source, $qs FROM documents GROUP BY source)
         SELECT a.source AS source_a, b.source AS source_b,
           round(($terms) / 9, 4) AS w1_chars
         FROM decs a JOIN decs b ON a.source < b.source
         ORDER BY source_a, source_b"""
    },
    // uniform waterfill against caps 1.5·n: capped groups are the
    // ascending-cap prefix where cap·(k−i+1)+prefix ≤ budget; the
    // uncapped remainder splits the leftover evenly. Caps are exact
    // multiples of 0.5 ⇒ every float sum here is exact and
    // order-independent.
    "q286_unimax" ->
      """WITH g AS (
            SELECT lang, CAST(sum(n_chars) AS BIGINT) AS n_weight
            FROM documents GROUP BY 1 HAVING sum(n_chars) > 0),
          t AS (SELECT CAST(sum(n_weight) AS BIGINT) AS tot,
            count(*) AS k FROM g),
          r AS (
            SELECT lang, n_weight, n_weight * 1.5 AS cap,
              tot * 1.2 AS budget, k,
              row_number() OVER (ORDER BY n_weight * 1.5 ASC, lang ASC) AS i,
              coalesce(sum(n_weight * 1.5) OVER (
                ORDER BY n_weight * 1.5 ASC, lang ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
            FROM g CROSS JOIN t),
          c AS (SELECT *, cap * (k - i + 1) + pre <= budget AS capped FROM r),
          s AS (SELECT *,
              coalesce(sum(CASE WHEN capped THEN cap END) OVER (), 0) AS csum,
              sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS m
            FROM c)
         SELECT lang, n_weight, capped,
           round(CASE WHEN capped THEN cap
             ELSE (budget - csum) / (k - m) END, 4) AS alloc,
           round((CASE WHEN capped THEN cap
             ELSE (budget - csum) / (k - m) END) / n_weight, 6) AS epochs
         FROM s ORDER BY lang""",
    // κ = (p_o − p_e)/(1 − p_e); p_e from the marginal inner product.
    // Integer counts until the two final divisions, identical order
    // both engines.
    "q287_cohens_kappa" ->
      """WITH r AS (
            SELECT label AS ra,
              CASE WHEN ('0x' || substr(md5('7:' || CAST(vec_id AS VARCHAR)),
                    1, 15))::BIGINT % 5 = 0
                THEN (label + 1) % 10 ELSE label END AS rb
            FROM embeddings),
          tot AS (SELECT count(*) AS n,
            CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree
            FROM r),
          ma AS (SELECT ra AS c, count(*) AS na FROM r GROUP BY 1),
          mb AS (SELECT rb AS c, count(*) AS nb FROM r GROUP BY 1),
          pe AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS pe_num
            FROM ma JOIN mb USING (c)),
          f AS (SELECT n, agree,
              CAST(agree AS DOUBLE) / n AS po,
              CAST(pe_num AS DOUBLE) / (n * n) AS pev
            FROM tot CROSS JOIN pe)
         SELECT n, agree AS n_agree, round(po, 6) AS po,
           round(pev, 6) AS pe,
           CASE WHEN pev < 1 THEN round((po - pev) / (1 - pev), 6) END AS kappa
         FROM f""",
    // PSI over the corpus decile grid, +0.5 Laplace smoothing per bin
    // (10 bins ⇒ +5 per denominator) so empty bins contribute their
    // log-odds penalty instead of ±∞
    "q288_psi_drift" -> {
      val qs = (1 to 9).map(i =>
        s"quantile_cont(x, 0.$i) AS p$i").mkString(", ")
      val bin = (1 to 9).map(i =>
        s"CASE WHEN x > p$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH v AS (
            SELECT source AS g, CAST(n_chars AS DOUBLE) AS x
            FROM documents WHERE n_chars IS NOT NULL),
          cuts AS (SELECT $qs FROM v),
          binned AS (SELECT g, ($bin) AS bin FROM v CROSS JOIN cuts),
          gb AS (SELECT g, bin, count(*) AS c FROM binned GROUP BY 1, 2),
          gt AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM gb GROUP BY 1),
          bt AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cb FROM gb GROUP BY 1),
          tt AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM gb),
          grid AS (SELECT g, n, u.b AS bin
            FROM gt, unnest(range(0, 10)) AS u(b)),
          j AS (
            SELECT grid.g, grid.n, coalesce(gb.c, 0) AS c,
              coalesce(bt.cb, 0) AS cb, nn
            FROM grid
            LEFT JOIN gb ON gb.g = grid.g AND gb.bin = grid.bin
            LEFT JOIN bt ON bt.bin = grid.bin
            CROSS JOIN tt)
         SELECT g AS source, n,
           round(sum(((c + 0.5) / (n + 5.0) - (cb + 0.5) / (nn + 5.0))
             * ln(((c + 0.5) / (n + 5.0)) / ((cb + 0.5) / (nn + 5.0)))), 6)
             AS psi
         FROM j GROUP BY 1, 2 ORDER BY 1"""
    },
    // q105's two-round k-means replay to the full assignment, then the
    // contingency-table purity and NMI from integer counts
    "q279_cluster_purity" ->
      """WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          train AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT 262144),
          c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, v AS c
            FROM (SELECT vec_id, v FROM train ORDER BY vec_id LIMIT 8)),
          s1 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c0)) n),
          a1 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s1) WHERE rn = 1),
          c1 AS (
            SELECT c0.list, coalesce(nw.c, c0.c) AS c
            FROM c0 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a1 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s2 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c1)) n),
          a2 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s2) WHERE rn = 1),
          c2 AS (
            SELECT c1.list, coalesce(nw.c, c1.c) AS c
            FROM c1 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a2 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s3 AS (
            SELECT e.vec_id, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM emb e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c2)) n),
          a3 AS (
            SELECT vec_id, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s3) WHERE rn = 1),
          cells AS MATERIALIZED (
            SELECT a3.list, e2.label AS lbl, CAST(count(*) AS BIGINT) AS c
            FROM a3 JOIN embeddings e2 USING (vec_id)
            GROUP BY 1, 2),
          rk AS (
            SELECT list, CAST(sum(c) AS BIGINT) AS nk,
              CAST(max(c) AS BIGINT) AS mk
            FROM cells GROUP BY 1),
          rl AS (
            SELECT lbl, CAST(sum(c) AS BIGINT) AS nl
            FROM cells GROUP BY 1),
          n1 AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
          mi AS (
            SELECT sum((c / nn) * ln(nn * c / (nk * nl))) AS mi
            FROM cells JOIN rk USING (list) JOIN rl USING (lbl)
            CROSS JOIN n1),
          ks AS (
            SELECT CAST(min(nn) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS n_lists,
              CAST(sum(mk) AS BIGINT) AS summax,
              -sum((nk / nn) * ln(nk / nn)) AS hk
            FROM rk CROSS JOIN n1),
          ls AS (
            SELECT CAST(count(*) AS BIGINT) AS n_labels,
              -sum((nl / nn) * ln(nl / nn)) AS hl
            FROM rl CROSS JOIN n1)
         SELECT n, n_lists, n_labels,
           round(CAST(summax AS DOUBLE) / n, 6) AS purity,
           round(CASE WHEN hk > 0 AND hl > 0
             THEN mi / sqrt(hk * hl) ELSE 0.0 END, 6) AS nmi
         FROM ks CROSS JOIN mi CROSS JOIN ls""",
    // q105's two-round k-means replay, then the centroid silhouette
    // (c1−c2)/(1−c2) from each vector's top-2 centroid cosines
    "q243_silhouette" ->
      """WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          train AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT 262144),
          c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, v AS c
            FROM (SELECT vec_id, v FROM train ORDER BY vec_id LIMIT 8)),
          s1 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c0)) n),
          a1 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s1) WHERE rn = 1),
          c1 AS (
            SELECT c0.list, coalesce(nw.c, c0.c) AS c
            FROM c0 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a1 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s2 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c1)) n),
          a2 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s2) WHERE rn = 1),
          c2 AS (
            SELECT c1.list, coalesce(nw.c, c1.c) AS c
            FROM c1 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a2 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s3 AS (
            SELECT e.vec_id, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s,
              sqrt(list_sum(list_transform(e.v, x -> x * x))) AS nv
            FROM emb e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c2)) n),
          rk AS (
            SELECT vec_id, list, s, nv,
              row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
            FROM s3),
          tv AS (
            SELECT a.vec_id, a.list,
              CASE WHEN a.nv > 0 THEN a.s / a.nv ELSE 0.0 END AS c1s,
              CASE WHEN a.nv > 0 THEN b.s / a.nv ELSE 0.0 END AS c2s
            FROM rk a JOIN rk b
              ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
          sil AS (
            SELECT list,
              CASE WHEN 1.0 - c2s > 0 THEN (c1s - c2s) / (1.0 - c2s)
                ELSE 0.0 END AS s
            FROM tv)
         SELECT list, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(s), 4) AS mean_sil
         FROM sil GROUP BY list ORDER BY list""",

    // per-determinant modal coverage; violations = Σ (n_a − m_a)
    "q245_functional_deps" ->
      """WITH p1 AS (
           SELECT 'lang' AS determinant, 'source' AS dependent, lang AS a,
             source AS b FROM documents),
         p2 AS (
           SELECT 'source', 'lang', source, lang FROM documents),
         p3 AS (
           SELECT 'doc_id', 'lang', CAST(doc_id AS VARCHAR), lang
           FROM documents),
         u AS (
           SELECT * FROM p1 UNION ALL SELECT * FROM p2
           UNION ALL SELECT * FROM p3),
         cells AS (
           SELECT determinant, dependent, a, b,
             CAST(count(*) AS BIGINT) AS c
           FROM u GROUP BY 1, 2, 3, 4),
         det AS (
           SELECT determinant, dependent, a, CAST(sum(c) AS BIGINT) AS n,
             CAST(max(c) AS BIGINT) AS m
           FROM cells GROUP BY 1, 2, 3)
        SELECT determinant, dependent, CAST(count(*) AS BIGINT) AS n_groups,
          CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(sum(n - m) AS BIGINT) AS violations,
          sum(n - m) = 0 AS fd_holds
        FROM det GROUP BY determinant, dependent
        ORDER BY determinant, dependent""",

    // the greedy unrolled: pool of 15 by relevance, pairwise cosines,
    // then 5 argmax steps as chained CTEs — λ = 1−λ = 0.5 exactly
    "q135_mmr_rerank" -> {
      val cosExpr = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 65), ix -> $a.v[ix] * $b.v[ix])) /
            (sqrt(list_sum(list_transform($a.v, x -> x * x))) *
             sqrt(list_sum(list_transform($b.v, x -> x * x))))"""
      val steps = (2 to 5).map { t =>
        s"""step$t AS (
              SELECT p.id, p.rel, 0.5 * p.rel - 0.5 * max(pc.c) AS score
              FROM pool p
              JOIN pc ON pc.ia = p.id
              JOIN sel${t - 1} s ON pc.ib = s.id
              WHERE p.id NOT IN (SELECT id FROM sel${t - 1})
              GROUP BY p.id, p.rel
              ORDER BY score DESC, p.id LIMIT 1),
            sel$t AS (SELECT id FROM sel${t - 1} UNION ALL SELECT id FROM step$t)"""
      }.mkString(",\n")
      val ranks = (1 to 5).map { t =>
        s"""SELECT $t AS rank, id AS vec_id, round(rel, 6) AS relevance,
              round(score, 6) AS mmr FROM step$t"""
      }.mkString("\n UNION ALL\n")
      s"""WITH emb AS (
            SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          qv AS (SELECT v FROM emb WHERE id = 0),
          pool AS (
            SELECT e.id, ${cosExpr("e", "q")} AS rel, e.v
            FROM emb e CROSS JOIN qv q WHERE e.id <> 0
            ORDER BY rel DESC, e.id LIMIT 15),
          pc AS (
            SELECT a.id AS ia, b.id AS ib, ${cosExpr("a", "b")} AS c
            FROM pool a JOIN pool b ON a.id <> b.id),
          step1 AS (
            SELECT id, rel, 0.5 * rel AS score FROM pool
            ORDER BY score DESC, id LIMIT 1),
          sel1 AS (SELECT id FROM step1),
          $steps
         SELECT rank, vec_id, relevance, mmr FROM (
           $ranks) ORDER BY rank"""
    },
    // RE2 char classes mirror the engine's Java classes 1:1 on this
    // ASCII corpus; both sides count code units of the same text
    "q136_charclass" ->
      """WITH c AS (
           SELECT doc_id, len(text) AS n_chars,
             len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_letter,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
             len(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS n_space
           FROM documents WHERE doc_id < 60)
         SELECT doc_id, n_chars, n_letter, n_digit, n_upper, n_space,
           n_chars - n_letter - n_digit - n_space AS n_other,
           CASE WHEN n_chars = 0 THEN 0.0
                ELSE round(n_letter::DOUBLE / n_chars, 6) END AS letter_frac,
           CASE WHEN n_chars = 0 THEN 0.0
                ELSE round(n_digit::DOUBLE / n_chars, 6) END AS digit_frac,
           CASE WHEN n_chars = 0 THEN 0.0
                ELSE round(n_upper::DOUBLE / n_chars, 6) END AS upper_frac,
           CASE WHEN n_chars = 0 THEN 'empty'
                WHEN n_letter >= greatest(n_digit, n_space,
                  n_chars - n_letter - n_digit - n_space) THEN 'letter'
                WHEN n_digit >= greatest(n_space,
                  n_chars - n_letter - n_digit - n_space) THEN 'digit'
                WHEN n_space >= n_chars - n_letter - n_digit - n_space
                  THEN 'space'
                ELSE 'other' END AS dominant
         FROM c ORDER BY doc_id""",
    // the q32 LSH candidate chain verbatim, then the asymmetric
    // containment kernels over the same verified shingle sets
    "q137_containment" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          scored AS (
            SELECT id_a, id_b,
              len(list_intersect(sh_a, sh_b))::DOUBLE AS inter,
              len(sh_a)::DOUBLE AS n_a, len(sh_b)::DOUBLE AS n_b
            FROM cand),
          f AS (
            SELECT id_a, id_b,
              CASE WHEN n_a + n_b - inter = 0 THEN 0.0
                   ELSE inter / (n_a + n_b - inter) END AS jac,
              CASE WHEN n_a = 0 THEN 0.0 ELSE inter / n_a END AS ca,
              CASE WHEN n_b = 0 THEN 0.0 ELSE inter / n_b END AS cb
            FROM scored)
         SELECT id_a, id_b, round(jac, 4) AS jaccard,
           round(ca, 4) AS cont_a, round(cb, 4) AS cont_b,
           round(greatest(ca, cb), 4) AS containment
         FROM f WHERE greatest(ca, cb) >= 0.6
         ORDER BY id_a, id_b""",
    // each check replayed as its defining aggregate; names/status
    // strings must match the engine's report() literals exactly
    "q139_expectations" ->
      """SELECT * FROM (
           SELECT 'not_null(o_totalprice)' AS check_name, 'orders' AS table_name,
             CAST(count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS BIGINT) AS violations,
             CASE WHEN count(CASE WHEN o_totalprice IS NULL THEN 1 END) = 0
                  THEN 'pass' ELSE 'fail' END AS status
           FROM orders
           UNION ALL
           SELECT 'unique(doc_id)', 'documents',
             CAST(coalesce(sum(n - 1), 0) AS BIGINT),
             CASE WHEN coalesce(sum(n - 1), 0) = 0 THEN 'pass' ELSE 'fail' END
           FROM (SELECT count(*) AS n FROM documents GROUP BY doc_id)
           UNION ALL
           SELECT 'between(l_quantity,1.0,50.0)', 'lineitem',
             CAST(count(CASE WHEN l_quantity IS NOT NULL
               AND (l_quantity < 1 OR l_quantity > 50) THEN 1 END) AS BIGINT),
             CASE WHEN count(CASE WHEN l_quantity IS NOT NULL
               AND (l_quantity < 1 OR l_quantity > 50) THEN 1 END) = 0
                  THEN 'pass' ELSE 'fail' END
           FROM lineitem
           UNION ALL
           SELECT 'in_set(lang)', 'documents',
             CAST(count(CASE WHEN lang IS NOT NULL
               AND lang NOT IN ('en','de','fr','es','zh') THEN 1 END) AS BIGINT),
             CASE WHEN count(CASE WHEN lang IS NOT NULL
               AND lang NOT IN ('en','de','fr','es','zh') THEN 1 END) = 0
                  THEN 'pass' ELSE 'fail' END
           FROM documents
           UNION ALL
           SELECT 'ref(l_orderkey→o_orderkey)', 'lineitem',
             CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT),
             CASE WHEN count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) = 0
                  THEN 'pass' ELSE 'fail' END
           FROM lineitem l
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
           UNION ALL
           SELECT 'ref(o_custkey→c_custkey)', 'orders',
             CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT),
             CASE WHEN count(CASE WHEN c.c_custkey IS NULL THEN 1 END) = 0
                  THEN 'pass' ELSE 'fail' END
           FROM orders ord
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON ord.o_custkey = c.c_custkey
           UNION ALL
           SELECT 'row_count(5,5)', 'region',
             CAST(CASE WHEN count(*) < 5 THEN 5 - count(*)
                       WHEN count(*) > 5 THEN count(*) - 5
                       ELSE 0 END AS BIGINT),
             CASE WHEN count(*) BETWEEN 5 AND 5 THEN 'pass' ELSE 'fail' END
           FROM region)
         ORDER BY check_name""",
    // the mutual half-steps unrolled; L1 normalization per half-step
    // keeps every value a plain sum-and-divide both engines replay
    "q140_hits" -> {
      val iters = (1 to 2).map { t =>
        s"""a${t}r AS (
              SELECT e.dst AS id, sum(h${t - 1}n.hub) AS s
              FROM e JOIN h${t - 1}n ON h${t - 1}n.id = e.src GROUP BY e.dst),
            a$t AS (
              SELECT n.id, coalesce(s, 0) AS v FROM n LEFT JOIN a${t}r USING (id)),
            a${t}n AS (
              SELECT id, CASE WHEN t.t > 0 THEN v / t.t ELSE 0 END AS auth
              FROM a$t CROSS JOIN (SELECT sum(v) AS t FROM a$t) t),
            h${t}r AS (
              SELECT e.src AS id, sum(a${t}n.auth) AS s
              FROM e JOIN a${t}n ON a${t}n.id = e.dst GROUP BY e.src),
            h$t AS (
              SELECT n.id, coalesce(s, 0) AS v FROM n LEFT JOIN h${t}r USING (id)),
            h${t}n AS (
              SELECT id, CASE WHEN t.t > 0 THEN v / t.t ELSE 0 END AS hub
              FROM h$t CROSS JOIN (SELECT sum(v) AS t FROM h$t) t)"""
      }.mkString(",\n")
      s"""WITH e AS (
            SELECT DISTINCT doc_id % 40 AS src, (doc_id * 17 + 3) % 40 AS dst
            FROM documents
            WHERE doc_id < 240 AND doc_id % 40 <> (doc_id * 17 + 3) % 40),
          n AS (
            SELECT DISTINCT id FROM (
              SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
          h0n AS (SELECT id, 1.0 AS hub FROM n),
          $iters
         SELECT a2n.id, round(a2n.auth, 6) AS authority,
           round(h2n.hub, 6) AS hub
         FROM a2n JOIN h2n USING (id) ORDER BY id"""
    },
    "q141_blocklist" ->
      s"""WITH bl(term, cat) AS (
            SELECT * FROM (VALUES ('slow', 'perf'), ('fast', 'perf'),
              ('big', 'size'), ('small', 'size'), ('dup', 'dupe'))),
          docs AS (SELECT doc_id, $Toks AS t FROM documents WHERE doc_id < 60),
          hits AS (
            SELECT doc_id, count(*) AS n_hits,
              array_to_string(list_sort(list_distinct(list(cat))), ',') AS categories
            FROM (SELECT d.doc_id, u.term FROM docs d, unnest(d.t) AS u(term))
            JOIN bl USING (term) GROUP BY doc_id)
         SELECT d.doc_id, len(d.t) AS n_tokens,
           coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.categories, '') AS categories,
           CASE WHEN len(d.t) = 0 THEN 0.0
                ELSE round(coalesce(h.n_hits, 0)::DOUBLE / len(d.t), 6)
           END AS hit_frac,
           coalesce(h.n_hits, 0) > 0 AND
             coalesce(h.n_hits, 0)::DOUBLE / len(d.t) > 0.05 AS blocked
         FROM docs d LEFT JOIN hits h USING (doc_id)
         ORDER BY d.doc_id""",
    "q142_embedding_audit" ->
      """WITH v AS (
           SELECT label, embedding,
             list_transform(embedding, x -> x::DOUBLE) AS vd
           FROM embeddings),
         n AS (
           SELECT label, embedding,
             len(list_filter(vd, x -> isnan(x))) > 0 AS has_nan,
             sqrt(list_sum(list_transform(vd, x -> x * x))) AS nrm
           FROM v)
         SELECT label, count(*) AS n_vecs,
           count(CASE WHEN has_nan THEN 1 END) AS n_nan,
           count(CASE WHEN NOT has_nan AND nrm = 0 THEN 1 END) AS n_zero_norm,
           count(CASE WHEN len(embedding) <> 64 THEN 1 END) AS n_bad_dim,
           round(min(CASE WHEN NOT has_nan THEN nrm END), 6) AS min_norm,
           round(max(CASE WHEN NOT has_nan THEN nrm END), 6) AS max_norm,
           round(avg(CASE WHEN NOT has_nan THEN nrm END), 6) AS avg_norm
         FROM n GROUP BY label ORDER BY label""",
    // quantile_cont interpolates at p·(n−1) like Spark's percentile
    "q143_winsorize" ->
      """WITH cuts AS (
           SELECT l_returnflag, quantile_cont(l_extendedprice, 0.01) AS lo,
             quantile_cont(l_extendedprice, 0.99) AS hi
           FROM lineitem GROUP BY l_returnflag)
         SELECT l.l_returnflag, count(*) AS n,
           round(min(c.lo), 6) AS lo_cut, round(min(c.hi), 6) AS hi_cut,
           count(CASE WHEN l.l_extendedprice < c.lo THEN 1 END) AS n_clipped_low,
           count(CASE WHEN l.l_extendedprice > c.hi THEN 1 END) AS n_clipped_high,
           round(avg(l.l_extendedprice), 6) AS mean_before,
           round(avg(greatest(least(l.l_extendedprice, c.hi), c.lo)), 6)
             AS mean_after
         FROM lineitem l JOIN cuts c USING (l_returnflag)
         GROUP BY l.l_returnflag ORDER BY l.l_returnflag""",
    // same sequential-fold cosine, same (votes desc, label) argmax
    "q144_label_consistency" ->
      """WITH emb AS (
           SELECT vec_id AS id, label,
             list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
         q AS (SELECT * FROM emb WHERE id < 100),
         sc AS (
           SELECT q.id AS qid, e.id AS nid, e.label AS nl,
             list_sum(list_transform(range(1, 65), ix -> q.v[ix] * e.v[ix])) /
             (sqrt(list_sum(list_transform(q.v, x -> x * x))) *
              sqrt(list_sum(list_transform(e.v, x -> x * x)))) AS c
           FROM q JOIN emb e ON e.id <> q.id),
         topk AS (
           SELECT qid, nl FROM (
             SELECT qid, nl,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rk
             FROM sc) WHERE rk <= 5),
         votes AS (SELECT qid, nl, count(*) AS v FROM topk GROUP BY qid, nl),
         pred AS (
           SELECT qid, nl FROM (
             SELECT qid, nl,
               row_number() OVER (PARTITION BY qid ORDER BY v DESC, nl) AS rk
             FROM votes) WHERE rk = 1)
         SELECT q.label, count(*) AS n_queries,
           count(CASE WHEN p.nl = q.label THEN 1 END) AS n_consistent,
           round(count(CASE WHEN p.nl = q.label THEN 1 END)::DOUBLE
             / count(*), 6) AS consistency
         FROM q JOIN pred p ON p.qid = q.id
         GROUP BY q.label ORDER BY label""",
    "q145_pair_lift" ->
      """WITH pairs AS (
           SELECT DISTINCT user_id AS b, event_type AS i FROM events
           WHERE event_type IS NOT NULL),
         itemn AS (
           SELECT i, count(*) AS n FROM pairs GROUP BY i
           HAVING count(*) >= 2),
         tot AS (SELECT count(DISTINCT b) AS total FROM pairs),
         freq AS (SELECT p.b, p.i FROM pairs p JOIN itemn USING (i)),
         co AS (
           SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
           FROM freq a JOIN freq b ON a.b = b.b AND a.i < b.i
           GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT item_a, item_b, na.n AS n_a, nb.n AS n_b, n_ab,
           round(n_ab::DOUBLE / t.total, 6) AS support,
           round(n_ab::DOUBLE / na.n, 6) AS conf_a_b,
           round(n_ab::DOUBLE / nb.n, 6) AS conf_b_a,
           round(n_ab::DOUBLE * t.total / (na.n * nb.n), 6) AS lift
         FROM co JOIN itemn na ON na.i = co.item_a
         JOIN itemn nb ON nb.i = co.item_b
         CROSS JOIN tot t ORDER BY item_a, item_b""",
    // H = ln N − (Σ c·ln c)/N, the algebraic −Σ p ln p
    "q146_token_entropy" ->
      s"""WITH tf AS (
            SELECT doc_id, term, count(*) AS c FROM (
              SELECT doc_id, unnest($Toks) AS term FROM documents
              WHERE doc_id < 60)
            GROUP BY doc_id, term)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
           CASE WHEN count(*) <= 1 THEN 0.0
                ELSE round((ln(sum(c)) - sum(c * ln(c)) / sum(c))
                  / ln(count(*)), 6) END AS evenness
         FROM tf GROUP BY doc_id ORDER BY doc_id""",
    // inner join on term + analytic 0.5·ln2 mass for one-sided terms
    "q147_js_divergence" ->
      s"""WITH cts AS (
            SELECT source AS s, term, count(*) AS c FROM (
              SELECT source, unnest($Toks) AS term FROM documents)
            GROUP BY s, term),
          tot AS (SELECT s, CAST(sum(c) AS DOUBLE) AS n FROM cts GROUP BY s),
          dist AS (SELECT cts.s, term, c / n AS p FROM cts JOIN tot USING (s)),
          ov AS (
            SELECT a.s AS source_a, b.s AS source_b,
              sum(0.5 * a.p * ln(2 * a.p / (a.p + b.p))
                + 0.5 * b.p * ln(2 * b.p / (a.p + b.p))) AS o,
              sum(a.p) AS pa, sum(b.p) AS pb
            FROM dist a JOIN dist b ON a.term = b.term AND a.s < b.s
            GROUP BY 1, 2),
          pairs AS (
            SELECT a.s AS source_a, b.s AS source_b
            FROM tot a CROSS JOIN tot b WHERE a.s < b.s)
         SELECT p.source_a, p.source_b,
           round(coalesce(o, 0)
             + 0.5 * ln(2) * ((1 - coalesce(pa, 0)) + (1 - coalesce(pb, 0))),
             6) + 0.0 AS js
         FROM pairs p LEFT JOIN ov USING (source_a, source_b)
         ORDER BY source_a, source_b""",
    // the q137 LSH chain + a quadratic truth join on the same sets
    "q148_lsh_recall" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents WHERE doc_id < 80)),
          ne AS (SELECT id, sh FROM docs WHERE len(sh) > 0),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM ne),
          banded AS (
            SELECT id, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          jacs AS (
            SELECT c.id_a, c.id_b,
              CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
                ELSE len(list_intersect(x.sh, y.sh))::DOUBLE /
                     len(list_distinct(list_concat(x.sh, y.sh))) END AS jac
            FROM cand c JOIN ne x ON x.id = c.id_a JOIN ne y ON y.id = c.id_b),
          truth AS (
            SELECT count(*) AS n_true FROM (
              SELECT 1 FROM ne a JOIN ne b ON a.id < b.id
              WHERE CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0
                  THEN 0.0
                  ELSE len(list_intersect(a.sh, b.sh))::DOUBLE /
                       len(list_distinct(list_concat(a.sh, b.sh))) END >= 0.5)),
          nd AS (SELECT count(*) AS n_docs FROM ne),
          f AS (SELECT count(*) AS n_found FROM jacs WHERE jac >= 0.5),
          cc AS (SELECT count(*) AS n_candidates FROM cand)
         SELECT n_docs,
           CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS n_pairs_checked,
           n_true AS n_true_pairs, n_found,
           CASE WHEN n_true = 0 THEN 1.0
                ELSE round(n_found::DOUBLE / n_true, 6) END AS recall,
           n_candidates,
           CASE WHEN n_docs <= 1 THEN 0.0
                ELSE round(n_candidates::DOUBLE
                  / (n_docs * (n_docs - 1) / 2), 6) END AS candidate_frac
         FROM nd, truth, f, cc""",
    // q71's corpus model scored per q76-style chunk; delta vs the
    // doc's mean chunk surprisal via a window
    "q149_span_surprisal" ->
      s"""WITH freq AS (
            SELECT term, count(*) AS c FROM (
              SELECT unnest($Toks) AS term FROM documents) GROUP BY term),
          tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq),
          d AS (SELECT doc_id, $Toks AS t FROM documents),
          s AS (SELECT doc_id, t,
              unnest(range(1, greatest(len(t) - 31, 1) + 1, 16)) AS st
            FROM d WHERE len(t) > 0),
          ct AS (
            SELECT doc_id, (st - 1) // 16 AS chunk_idx, st AS start_token,
              unnest(t[st:st + 31]) AS term
            FROM s),
          per AS (
            SELECT doc_id, chunk_idx, start_token,
              count(*) AS n_tokens, avg(-ln(c / t.t)) AS sr
            FROM ct JOIN freq USING (term) CROSS JOIN tot t
            GROUP BY doc_id, chunk_idx, start_token)
         SELECT doc_id, chunk_idx, start_token, n_tokens,
           round(sr, 6) AS surprisal,
           round(sr - avg(sr) OVER (PARTITION BY doc_id), 6) AS delta
         FROM per WHERE doc_id < 30
         ORDER BY doc_id, chunk_idx""",
    "q150_standardize" ->
      """WITH emb AS (
           SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS vd
           FROM embeddings),
         x AS (
           SELECT vec_id, ix.i, vd[ix.i] AS x
           FROM emb CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ix),
         st AS (
           SELECT i, avg(x) AS mu, stddev_pop(x) AS sd FROM x GROUP BY i)
         SELECT x.vec_id, CAST(x.i - 1 AS INT) AS i,
           round(CASE WHEN st.sd > 0 THEN (x.x - st.mu) / st.sd ELSE 0.0 END,
             6) + 0.0 AS z
         FROM x JOIN st USING (i) WHERE x.vec_id < 10
         ORDER BY vec_id, i""",
    "q151_dup_rate" ->
      """SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
             AS n_unique,
           round(1 - count(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))::DOUBLE
             / count(*), 6) AS dup_rate
         FROM documents GROUP BY source ORDER BY source""",
    // step CDFs over the pooled distinct-value grid; integer cumsums
    // divide by per-group totals identically in both engines
    "q152_ks_matrix" ->
      """WITH counts AS (
           SELECT source AS g, CAST(n_chars AS DOUBLE) AS v, count(*) AS c
           FROM documents GROUP BY 1, 2),
         grid AS (SELECT DISTINCT v FROM counts),
         grps AS (SELECT DISTINCT g FROM counts),
         tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY g),
         dense AS (
           SELECT gr.g, gd.v, coalesce(c.c, 0) AS c
           FROM grps gr CROSS JOIN grid gd
           LEFT JOIN counts c ON c.g = gr.g AND c.v = gd.v),
         cdf AS (
           SELECT g, v,
             sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS UNBOUNDED PRECEDING)::DOUBLE / n AS f
           FROM dense JOIN tot USING (g))
         SELECT a.g AS group_a, b.g AS group_b,
           round(max(abs(a.f - b.f)), 6) AS ks
         FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
         GROUP BY 1, 2 ORDER BY group_a, group_b""",
    // the q32 pair chain + the q66 naive split hash on each member
    "q153_split_contamination" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          sp AS (
            SELECT doc_id,
              CASE WHEN b < 800000 THEN 'train'
                   WHEN b < 900000 THEN 'val' ELSE 'test' END AS s
            FROM (SELECT doc_id,
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 AS b
              FROM documents))
         SELECT least(a.s, b.s) AS split_a, greatest(a.s, b.s) AS split_b,
           count(*) AS n_pairs,
           least(a.s, b.s) <> greatest(a.s, b.s) AS leak
         FROM verified v JOIN sp a ON a.doc_id = v.id_a
         JOIN sp b ON b.doc_id = v.id_b
         GROUP BY 1, 2, 4 ORDER BY split_a, split_b""",
    // the q110 closure, folds = md5(comp) mod 5
    "q154_leakage_safe_folds" ->
      s"""WITH RECURSIVE
          docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          u AS (SELECT id_a AS a, id_b AS b FROM verified
                UNION SELECT id_b AS a, id_a AS b FROM verified),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id),
          comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
          assigned AS (
            SELECT doc_id, comp,
              ('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 15))::BIGINT % 5
                AS fold
            FROM (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
                  FROM documents d LEFT JOIN comps c ON d.doc_id = c.id)),
          spanning AS (
            SELECT CAST(sum(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS clusters_spanning_folds
            FROM (SELECT comp, count(DISTINCT fold) AS nf
                  FROM assigned GROUP BY comp))
         SELECT fold, count(*) AS n_docs,
           count(DISTINCT comp) AS n_clusters, clusters_spanning_folds
         FROM assigned CROSS JOIN spanning
         GROUP BY fold, clusters_spanning_folds ORDER BY fold""",
    // the full-corpus verified pairs classified by parity: a new
    // (odd) doc drops on a history partner either direction, or a
    // smaller new partner
    "q155_ingest_novel_near" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          dropped AS (
            SELECT id_a AS id FROM verified
            WHERE id_a % 2 = 1 AND id_b % 2 = 0
            UNION
            SELECT id_b AS id FROM verified
            WHERE id_b % 2 = 1)
         SELECT doc_id FROM documents
         WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id FROM dropped)
         ORDER BY doc_id""",
    "q158_coverage_curve" ->
      s"""WITH freq AS (
            SELECT term, count(*) AS c FROM (
              SELECT unnest($Toks) AS term FROM documents) GROUP BY term),
          r AS (
            SELECT term, c,
              row_number() OVER (ORDER BY c DESC, term) AS rk,
              sum(c) OVER (ORDER BY c DESC, term
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM freq),
          tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq),
          ks AS (SELECT unnest([5, 10, 20, 50]) AS k)
         SELECT CAST(k AS INT) AS k, count(*) AS n_terms,
           round(max(cum) / t.t, 6) AS coverage
         FROM r JOIN ks ON r.rk <= ks.k CROSS JOIN tot t
         GROUP BY k, t.t ORDER BY k""",
    "q94_bigram_surprisal" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM documents),
          bg AS (SELECT doc_id,
              unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS b
            FROM d),
          c2 AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
          c1 AS (SELECT split_part(b, ' ', 1) AS w, sum(c) AS cp
                 FROM c2 GROUP BY 1)
         SELECT doc_id, count(*) AS n_bigrams,
           round(avg(-ln(c / CAST(cp AS DOUBLE))), 6) AS surprisal
         FROM bg JOIN c2 USING (b)
           JOIN c1 ON split_part(b, ' ', 1) = c1.w
         WHERE doc_id < 30
         GROUP BY doc_id ORDER BY doc_id""",
    "q72_decontaminate" ->
      s"""WITH g AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                i -> array_to_string(t[i:i+7], ' '))) AS shs
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          probes AS (
            SELECT DISTINCT unnest(shs) AS sh FROM g WHERE doc_id % 7 = 0),
          docsh AS (
            SELECT doc_id, unnest(shs) AS sh FROM g WHERE doc_id % 7 <> 0)
         SELECT doc_id, count(*) AS n_hits, min(sh) AS first_hit
         FROM docsh JOIN probes USING (sh)
         GROUP BY doc_id ORDER BY doc_id""",
    // same LSH derivation as q32, then undirected transitive closure
    // and min-label clusters; survivors = docs that are their own
    // cluster minimum (or in no cluster)
    "q69_near_dedup" ->
      s"""WITH RECURSIVE
          docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          u AS (SELECT id_a AS a, id_b AS b FROM verified
                UNION SELECT id_b AS a, id_a AS b FROM verified),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id),
          losers AS (
            SELECT id FROM (SELECT id, min(r) AS comp FROM reach GROUP BY id)
            WHERE comp <> id)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id FROM losers)
         ORDER BY doc_id""",
    // the q69 LSH + recursive closure verbatim, then per-cluster argmax
    // by (n_chars DESC, id ASC) instead of keep-min-id
    "q114_dedup_keep_best" ->
      s"""WITH RECURSIVE
          docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          u AS (SELECT id_a AS a, id_b AS b FROM verified
                UNION SELECT id_b AS a, id_a AS b FROM verified),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id),
          comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
          scored AS (
            SELECT c.comp, c.id, d.n_chars FROM comps c
            JOIN documents d ON c.id = d.doc_id)
         SELECT comp, id AS keeper_id, n_chars AS keeper_score, n_members
         FROM (
           SELECT comp, id, n_chars,
             row_number() OVER (PARTITION BY comp
               ORDER BY n_chars DESC, id ASC) AS rn,
             CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS n_members
           FROM scored)
         WHERE rn = 1 ORDER BY comp""",
    // hashed-n-gram bucket models with add-one smoothing; the Gumbel
    // draw replays via the md5-uniform; ORDER BY + LIMIT on the
    // UNROUNDED score, rounding applied outside the limit
    "q115_dsir_sample" ->
      s"""WITH tgt AS (
            SELECT text FROM documents WHERE source IN ('src0','src1')),
          rawd AS (
            SELECT doc_id, text FROM documents
            WHERE source NOT IN ('src0','src1')),
          tg AS (
            SELECT unnest(list_concat(t,
              list_transform(range(1, greatest(len(t)-1, 0) + 1),
                i -> t[i] || ' ' || t[i+1]))) AS g
            FROM (SELECT $Toks AS t FROM tgt)),
          rg AS (
            SELECT doc_id, unnest(list_concat(t,
              list_transform(range(1, greatest(len(t)-1, 0) + 1),
                i -> t[i] || ' ' || t[i+1]))) AS g
            FROM (SELECT doc_id, $Toks AS t FROM rawd)),
          tb AS (
            SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % 256 AS f,
              count(*) AS c
            FROM tg GROUP BY 1),
          docf AS (
            SELECT doc_id,
              ('0x' || substr(md5(g), 1, 15))::BIGINT % 256 AS f,
              count(*) AS c
            FROM rg GROUP BY 1, 2),
          rb AS (SELECT f, sum(c) AS c FROM docf GROUP BY f),
          n AS (SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM tb) AS nt,
                       (SELECT CAST(sum(c) AS DOUBLE) FROM rb) AS nr),
          ratio AS (
            SELECT coalesce(tb.f, rb.f) AS f,
              ln((coalesce(tb.c, 0) + 1) / (nt + 256)) -
              ln((coalesce(rb.c, 0) + 1) / (nr + 256)) AS lr
            FROM tb FULL JOIN rb ON tb.f = rb.f CROSS JOIN n),
          sc AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
              sum(c * lr) AS lw
            FROM docf JOIN ratio USING (f) GROUP BY doc_id),
          sel AS (
            SELECT doc_id, n_feats, lw,
              lw + -ln(-ln(
                (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 + 0.5) / 1000000.0)) AS s
            FROM sc)
         SELECT doc_id, n_feats, round(lw, 6) AS log_weight,
           round(s, 6) AS score
         FROM (SELECT * FROM sel ORDER BY s DESC, doc_id LIMIT 20)
         ORDER BY s DESC, doc_id""",
    // the 16×64 Rademacher sign matrix recomputed from md5 parity;
    // reduced components and cosine are sequential list_sum folds,
    // bit-matching Spark's aggregate/graft_cosine order
    "q116_rp_knn" ->
      """WITH red AS (
            SELECT vec_id, list_transform(range(0, 16), k ->
              list_sum(list_transform(range(1, 65), j ->
                embedding[j]::DOUBLE *
                  (CASE WHEN ('0x' || substr(md5('rp:' || k::VARCHAR || ':'
                      || (j-1)::VARCHAR), 1, 15))::BIGINT % 2 = 0
                    THEN 1.0 ELSE -1.0 END)))) AS r
            FROM embeddings),
          q AS (SELECT vec_id AS query_id, r AS qv FROM red WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, r AS cv FROM red),
          scored AS (
            SELECT query_id, neighbor_id,
              list_sum(list_transform(range(1, 17), i -> qv[i] * cv[i])) /
              (sqrt(list_sum(list_transform(range(1, 17), i -> qv[i] * qv[i]))) *
               sqrt(list_sum(list_transform(range(1, 17), i -> cv[i] * cv[i]))))
                AS cosine
            FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
         SELECT query_id, neighbor_id, round(cosine, 4) AS rp_cosine, rank
         FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // same 6-token sentence construction + injected repeats, then the
    // keep-first filter as NOT list_contains over the key prefix
    "q117_dedup_sentences" ->
      s"""WITH base AS (
            SELECT doc_id, $Toks AS t FROM documents WHERE doc_id < 100),
          sent AS (
            SELECT doc_id,
              list_transform(range(1, CAST(floor((len(t)+5)/6) AS BIGINT) + 1),
                i -> array_to_string(t[(i-1)*6+1:(i-1)*6+6], ' ')) AS s0
            FROM base),
          inj AS (
            SELECT doc_id, list_concat(list_concat(s0,
                CASE WHEN doc_id % 3 = 0 THEN [s0[1]] ELSE [] END),
                CASE WHEN doc_id % 5 = 0 THEN [s0[2], s0[2]] ELSE [] END) AS s
            FROM sent),
          txt AS (SELECT doc_id, array_to_string(s, '. ') AS text FROM inj),
          sp AS (
            SELECT doc_id,
              list_filter(string_split_regex(text, '\\.\\s+'),
                x -> len(x) > 0) AS s
            FROM txt),
          keyed AS (
            SELECT doc_id, s,
              list_transform(s,
                x -> trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))) AS k
            FROM sp),
          kept AS (
            SELECT doc_id, s, len(s) AS n_sent,
              list_filter(range(1, len(k) + 1),
                i -> NOT list_contains(k[1:i-1], k[i])) AS keep
            FROM keyed)
         SELECT doc_id, CAST(n_sent AS INTEGER) AS n_sent,
           CAST(len(keep) AS INTEGER) AS n_unique,
           array_to_string(list_transform(keep, i -> s[i]), '. ') AS text_clean
         FROM kept ORDER BY doc_id""",
    // boilerplate = normalized sentence (≥10 chars) in ≥4 distinct docs;
    // string_agg skips the dropped (NULL) sentences, coalesce covers a
    // fully-scrubbed doc (engine's array_join yields '')
    "q123_boilerplate_scrub" ->
      """WITH base AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 4 = 0
               THEN '. all rights reserved contact us for details' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
               THEN '. subscribe to our newsletter today' ELSE '' END AS text
           FROM documents WHERE doc_id < 200),
         sp AS (
           SELECT doc_id,
             list_filter(string_split_regex(text, '\.\s+'), x -> len(x) > 0) AS s
           FROM base),
         ex AS (
           SELECT doc_id, i AS pos, s[i] AS sent,
             trim(regexp_replace(lower(s[i]), '[^a-z0-9]+', ' ', 'g')) AS k
           FROM sp, unnest(range(1, len(s) + 1)) AS t(i)),
         bp AS (
           SELECT k FROM ex WHERE len(k) >= 10
           GROUP BY k HAVING count(DISTINCT doc_id) >= 4)
         SELECT e.doc_id, count(*) AS n_sent,
           count(CASE WHEN b.k IS NULL THEN 1 END) AS n_kept,
           coalesce(string_agg(CASE WHEN b.k IS NULL THEN e.sent END,
             '. ' ORDER BY e.pos), '') AS text_clean
         FROM ex e LEFT JOIN bp b ON e.k = b.k
         GROUP BY e.doc_id ORDER BY e.doc_id""",
    // same md5 draw (u = 60-bit md5("ws:"||id) / 2^60), same A-ES key
    // ln(u)/w, same tie-break; ranking on the unrounded key. `+ 0`
    // folds DuckDB's round(-1e-9,6) = -0.0 into +0.0 (Spark's
    // BigDecimal round has no signed zero)
    "q127_weighted_sample" ->
      """WITH keyed AS (
           SELECT source, doc_id,
             ln(CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  AS DOUBLE) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS key
           FROM documents WHERE n_chars > 0)
         SELECT source, doc_id, rank, round(key, 6) + 0 AS sample_key
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY source ORDER BY key DESC, doc_id) AS rank
               FROM keyed)
         WHERE rank <= 5 ORDER BY source, rank""",
    // exact side fully verified (same p·(n−1) linear interpolation);
    // approx_ok is the sketch's rank-error contract the Spark side
    // must make true (the q82 HLL pattern for order statistics)
    "q129_quantile_report" ->
      """WITH q AS (
           SELECT source, count(*) AS n,
             quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9]) AS qs
           FROM documents GROUP BY source)
         SELECT source, u.p, n, round(qs[u.i], 6) AS q_exact,
           true AS approx_ok
         FROM q, (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS p,
                         unnest([1, 2, 3, 4]) AS i) u
         ORDER BY source, p""",
    // winnowing replayed declaratively: same 60-bit gram hashes, same
    // forward-min / backward-max frame pair, same docfreq guard
    "q128_winnowing" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          grams AS (
            SELECT doc_id, i - 1 AS pos,
              ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT AS gh
            FROM toks, unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS u(i)),
          win AS (
            SELECT doc_id, pos, gh,
              count(*) OVER (PARTITION BY doc_id) AS n,
              min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mfwd
            FROM grams),
          sel AS (
            SELECT doc_id, gh FROM (
              SELECT doc_id, pos, gh,
                max(CASE WHEN pos <= greatest(0, n - 4) THEN mfwd END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS msel
              FROM win)
            WHERE msel = gh),
          fps AS (SELECT DISTINCT doc_id AS id, gh FROM sel),
          keep AS (
            SELECT gh FROM (
              SELECT gh, count(DISTINCT id) AS c FROM fps GROUP BY gh)
            WHERE c <= 20),
          kept AS (SELECT fps.* FROM fps JOIN keep USING (gh)),
          sizes AS (SELECT id, count(*) AS nf FROM kept GROUP BY id),
          pairs AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
            FROM kept a JOIN kept b ON a.gh = b.gh AND a.id < b.id
            GROUP BY 1, 2)
         SELECT id_a, id_b, n_shared,
           round(n_shared::DOUBLE / least(sa.nf, sb.nf), 4) AS overlap
         FROM pairs
         JOIN sizes sa ON sa.id = id_a
         JOIN sizes sb ON sb.id = id_b
         WHERE n_shared >= 2
         ORDER BY id_a, id_b""",
    // dominance by brute-force NOT EXISTS — the declarative spec the
    // engine's two-pass bucketed sweep must reproduce exactly
    "q126_skyline" ->
      s"""WITH f AS (
            SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
              CAST(len(list_distinct(t)) AS INTEGER) AS n_unique
            FROM (SELECT doc_id, $Toks AS t FROM documents))
         SELECT doc_id, n_tokens, n_unique FROM f p
         WHERE NOT EXISTS (
           SELECT 1 FROM f q
           WHERE q.n_tokens >= p.n_tokens AND q.n_unique >= p.n_unique
             AND (q.n_tokens > p.n_tokens OR q.n_unique > p.n_unique))
         ORDER BY doc_id""",
    // same hashing (md5 60-bit mod 512), same add-one smoothing, same
    // argmax tie-break (score desc, label asc)
    "q124_naive_bayes" ->
      s"""WITH docs AS (
            SELECT doc_id, source AS label, $Toks AS t FROM documents),
          tok AS (
            SELECT doc_id, label,
              ('0x' || substr(md5(u.term), 1, 15))::BIGINT % 512 AS f
            FROM docs, unnest(docs.t) AS u(term)),
          counts AS (SELECT label, f, count(*) AS c FROM tok GROUP BY 1, 2),
          totals AS (
            SELECT label, CAST(sum(c) AS DOUBLE) AS tt FROM counts GROUP BY 1),
          labels AS (SELECT label, count(*) AS n_docs FROM docs GROUP BY 1),
          nall AS (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM docs),
          model AS (
            SELECT l.label, ft.f,
              ln((coalesce(c.c, 0) + 1) / (t.tt + 512)) AS logp
            FROM (SELECT DISTINCT f FROM counts) ft
            CROSS JOIN labels l
            LEFT JOIN counts c ON c.label = l.label AND c.f = ft.f
            JOIN totals t ON t.label = l.label),
          docf AS (SELECT doc_id, f, count(*) AS n FROM tok GROUP BY 1, 2),
          scored AS (
            SELECT d.doc_id, m.label, sum(d.n * m.logp) AS ll
            FROM docf d JOIN model m ON d.f = m.f GROUP BY 1, 2),
          final AS (
            SELECT s.doc_id, s.label,
              s.ll + ln(l.n_docs / n.n_all) AS score
            FROM scored s JOIN labels l ON s.label = l.label CROSS JOIN nall n)
         SELECT doc_id, label AS pred_label, round(score, 4) AS score
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY doc_id ORDER BY score DESC, label) AS rk
               FROM final)
         WHERE rk = 1 ORDER BY doc_id""",
    "q118_class_tfidf" ->
      s"""WITH ex AS (
            SELECT source AS g, unnest($Toks) AS term FROM documents),
          tf AS (SELECT g, term, count(*) AS tf FROM ex GROUP BY 1, 2),
          ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ft FROM tf GROUP BY 1),
          a AS (SELECT avg(n) AS A FROM (
            SELECT CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY g)),
          sc AS (
            SELECT g, term, CAST(tf AS BIGINT) AS tf,
              tf * ln(1 + A / ft) AS ctfidf
            FROM tf JOIN ft USING (term) CROSS JOIN a)
         SELECT g AS source, rank, term, tf, round(ctfidf, 6) AS ctfidf
         FROM (SELECT *, row_number() OVER (
             PARTITION BY g ORDER BY ctfidf DESC, term ASC) AS rank
           FROM sc)
         WHERE rank <= 5 ORDER BY source, rank""",
    // the q69 LSH candidates WITHOUT the threshold filter; label by
    // the verified Jaccard
    "q119_contrastive_pairs" ->
      s"""WITH docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          scored AS (
            SELECT id_a, id_b,
              CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                     len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
            FROM cand)
         SELECT id_a, id_b, round(jac, 4) AS jaccard,
           CASE WHEN jac >= 0.5 THEN 'positive' ELSE 'hard_negative' END AS label
         FROM scored ORDER BY id_a, id_b""",
    "q65_tfidf" ->
      s"""WITH tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest($Toks) AS term FROM documents)
            GROUP BY doc_id, term),
          dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          n AS (SELECT count(*) AS n_docs FROM documents),
          scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
              round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 6) AS tfidf
            FROM tf JOIN dfq USING (term) CROSS JOIN n),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored)
         SELECT doc_id, rank, term, tf, df, tfidf FROM ranked
         WHERE rank <= 3 AND doc_id < 20 ORDER BY doc_id, rank""",
    "q66_dataset_split" ->
      """SELECT split, count(*) AS n_docs,
          min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM (SELECT doc_id,
            CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val'
                 ELSE 'test' END AS split
           FROM (SELECT doc_id,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1000000 AS b
             FROM documents))
         GROUP BY split ORDER BY split""",
    "q91_media_resize" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(2 AS INTEGER), CAST(2 AS INTEGER),
            CAST(2 AS INTEGER), CAST(2 AS INTEGER),
            CAST(0.5 AS DOUBLE), CAST(0.0 AS DOUBLE),
            CAST(0.0 AS DOUBLE), CAST(0.5 AS DOUBLE)),
          (2, 2, 2, 2, 2, 0.0, 0.0, 1.0, 0.0),
          (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, rw, rh, dw, dh, f0, f1, f2, f3)
         ORDER BY media_id""",
    "q85_stream_curation" ->
      s"""SELECT source, count(*) AS n_unique,
           count(CASE WHEN n >= 15 AND n <= 100000 AND mwl >= 2 AND mwl <= 12
             AND dr >= 0.55 AND stop >= 2 AND sym <= 0.1 THEN 1 END) AS n_keep
         FROM (
           SELECT source,
             len(t)::DOUBLE AS n,
             CASE WHEN len(t) > 0
               THEN list_sum(list_transform(t, w -> len(w)))::DOUBLE / len(t)
               ELSE 0.0 END AS mwl,
             CASE WHEN len(t) > 0
               THEN len(list_distinct(t))::DOUBLE / len(t)
               ELSE 0.0 END AS dr,
             len(regexp_extract_all(lower(text),
               '${TextAnalysis.allMarkersRegex}')) AS stop,
             CASE WHEN length(text) > 0
               THEN length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
                    / length(text)
               ELSE 0.0 END AS sym
           FROM (SELECT source, text, $Toks AS t
                 FROM (SELECT DISTINCT source, text FROM documents)))
         GROUP BY source ORDER BY source""",
    // the three pageRank rounds unrolled as chained CTEs; conventions
    // (r0 = 1, dangling mass dropped, parallel edges count) match the
    // operator's documented update rule
    "q84_pagerank" ->
      """WITH e AS (SELECT doc_id % 50 AS src, (doc_id * 13 + 7) % 50 AS dst
                    FROM documents WHERE doc_id < 300),
          nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
          deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
          e2 AS (SELECT src, dst, deg FROM e JOIN deg USING (src)),
          r0 AS (SELECT id, 1.0::DOUBLE AS rank FROM nodes),
          r1 AS (SELECT n.id, 0.15::DOUBLE + 0.85::DOUBLE * coalesce(s, 0) AS rank
                 FROM nodes n LEFT JOIN (
                   SELECT dst, sum(rank / deg) AS s
                   FROM e2 JOIN r0 ON e2.src = r0.id GROUP BY dst) c
                 ON n.id = c.dst),
          r2 AS (SELECT n.id, 0.15::DOUBLE + 0.85::DOUBLE * coalesce(s, 0) AS rank
                 FROM nodes n LEFT JOIN (
                   SELECT dst, sum(rank / deg) AS s
                   FROM e2 JOIN r1 ON e2.src = r1.id GROUP BY dst) c
                 ON n.id = c.dst),
          r3 AS (SELECT n.id, 0.15::DOUBLE + 0.85::DOUBLE * coalesce(s, 0) AS rank
                 FROM nodes n LEFT JOIN (
                   SELECT dst, sum(rank / deg) AS s
                   FROM e2 JOIN r2 ON e2.src = r2.id GROUP BY dst) c
                 ON n.id = c.dst)
         SELECT id, round(rank, 6) AS rank FROM r3 ORDER BY id""",
    // transitive closure via recursive CTE: reach(id, r) enumerates all
    // vertices reachable from id; min over them = the component label
    // (identical to converged min-label propagation)
    "q64_components" ->
      """WITH RECURSIVE
          e AS (SELECT doc_id AS a, doc_id + 1 + (doc_id % 3) AS b
                FROM documents WHERE doc_id % 5 < 2),
          u AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id)
         SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",
    // triangles enumerated once as ordered triples u<v<w over the
    // distinct undirected edge set; both ratios divide exact integers
    "q442_clustering_coeff" ->
      """WITH e0 AS (
            SELECT CAST(doc_id AS BIGINT) AS a,
              CAST(doc_id + 1 + k AS BIGINT) AS b
            FROM documents
            CROSS JOIN (SELECT unnest([0, 1]) AS k)
            WHERE doc_id % 5 < 2),
          und AS (
            SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
            FROM e0 WHERE a <> b AND a IS NOT NULL),
          tri AS (
            SELECT e1.u AS x, e1.v AS y, e2.v AS z
            FROM und e1 JOIN und e2
              ON e1.u = e2.u AND e1.v < e2.v
            JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
          pn AS (
            SELECT id, CAST(count(*) AS BIGINT) AS triangles
            FROM (SELECT unnest([x, y, z]) AS id FROM tri)
            GROUP BY id),
          deg AS (
            SELECT id, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT unnest([u, v]) AS id FROM und)
            GROUP BY id),
          gstats AS (
            SELECT coalesce(sum(degree * (degree - 1)), 0) AS w2
            FROM deg),
          tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tri)
         SELECT deg.id, deg.degree,
           coalesce(pn.triangles, 0) AS triangles,
           CASE WHEN deg.degree > 1 THEN
             floor(2.0 * coalesce(pn.triangles, 0)
               / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
               * 1e6 + 0.5) / 1e6 + 0.0
           END AS lcc,
           CASE WHEN w2 > 0 THEN
             floor(6.0 * t / CAST(w2 AS DOUBLE) * 1e6 + 0.5) / 1e6
               + 0.0
           END AS transitivity
         FROM deg LEFT JOIN pn ON deg.id = pn.id
         CROSS JOIN gstats CROSS JOIN tt
         ORDER BY deg.id""",
    // the incremental fold must land exactly where from-scratch CC
    // over the FULL edge set lands — q64's closure, unchanged
    "q302_incremental_components" ->
      """WITH RECURSIVE
          e AS (SELECT doc_id AS a, doc_id + 1 + (doc_id % 3) AS b
                FROM documents WHERE doc_id % 5 < 2),
          u AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id)
         SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""",
    // hand-computed: a sine of amplitude a has rms a/sqrt(2) and peak a
    // (up to 16-bit quantization, absorbed by round(…, 2)); silence is
    // all zeros; the 3-byte payload is not decodable audio
    "q63_audio_decode" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(8000 AS DOUBLE), CAST(1 AS INTEGER), CAST(200 AS BIGINT), CAST(0.35 AS DOUBLE), CAST(0.5 AS DOUBLE)),
          (2, 16000, 2, 125, 0.18, 0.25),
          (3, 8000, 1, 300, 0.0, 0.0),
          (4, NULL, NULL, NULL, NULL, NULL))
         t(media_id, audio_sample_rate, audio_channels, audio_duration_ms, rms, peak)
         ORDER BY media_id""",
    "q74_repetition" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM documents),
          wc AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS nd
            FROM (SELECT doc_id, w, count(*) AS c
                  FROM (SELECT doc_id, unnest(t) AS w FROM d)
                  GROUP BY doc_id, w)
            GROUP BY doc_id),
          bg AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
              count(*) AS ndb, max(c) AS maxb
            FROM (SELECT doc_id, b, count(*) AS c
                  FROM (SELECT doc_id,
                      unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                        i -> t[i] || ' ' || t[i+1])) AS b
                    FROM d)
                  GROUP BY doc_id, b)
            GROUP BY doc_id)
         SELECT wc.doc_id, n_tokens,
           round(1 - nd / CAST(n_tokens AS DOUBLE), 6) AS dup_word_frac,
           n_bigrams,
           round(1 - ndb / CAST(n_bigrams AS DOUBLE), 6) AS dup_bigram_frac,
           round(maxb / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_frac
         FROM wc LEFT JOIN bg ON wc.doc_id = bg.doc_id
         WHERE wc.doc_id < 40 ORDER BY wc.doc_id""",
    "q75_quality_filter" ->
      s"""SELECT doc_id, reasons = '' AS keep, reasons FROM (
            SELECT doc_id, concat_ws(',',
              CASE WHEN n < 15 OR n > 100000 THEN 'wc' END,
              CASE WHEN mwl < 2 OR mwl > 12 THEN 'mwl' END,
              CASE WHEN dr < 0.55 THEN 'rep' END,
              CASE WHEN stop < 2 THEN 'stop' END,
              CASE WHEN sym > 0.1 THEN 'sym' END) AS reasons
            FROM (
              SELECT doc_id,
                len(t)::DOUBLE AS n,
                CASE WHEN len(t) > 0
                  THEN list_sum(list_transform(t, w -> len(w)))::DOUBLE / len(t)
                  ELSE 0.0 END AS mwl,
                CASE WHEN len(t) > 0
                  THEN len(list_distinct(t))::DOUBLE / len(t)
                  ELSE 0.0 END AS dr,
                len(regexp_extract_all(lower(text),
                  '${TextAnalysis.allMarkersRegex}')) AS stop,
                CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
                       / length(text)
                  ELSE 0.0 END AS sym
              FROM (SELECT doc_id, text, $Toks AS t FROM documents
                    WHERE doc_id < 60)))
         ORDER BY doc_id""",
    "q76_chunking" ->
      s"""WITH d AS (SELECT doc_id, $Toks AS t FROM documents),
          s AS (SELECT doc_id, t,
              unnest(range(1, greatest(len(t) - 7, 1) + 1, 4)) AS st
            FROM d WHERE len(t) > 0 AND doc_id < 25)
         SELECT doc_id, (st - 1) // 4 AS chunk_idx, st AS start_token,
           len(t[st:st + 7]) AS n_chunk_tokens,
           array_to_string(t[st:st + 7], ' ') AS chunk_text
         FROM s ORDER BY doc_id, chunk_idx""",
    "q78_mixture_balance" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          m AS (SELECT min(n) AS mn FROM c),
          thr AS (SELECT source,
              CAST(floor(CAST(mn AS DOUBLE) / n * 1000000) AS BIGINT) AS thr
            FROM c CROSS JOIN m)
         SELECT source, count(*) AS n_kept,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents JOIN thr USING (source)
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 < thr
         GROUP BY source ORDER BY source""",
    "q81_curation_funnel" ->
      s"""WITH base AS (SELECT doc_id, text, source, $Toks AS t FROM documents),
          q AS (SELECT doc_id, text, source, t FROM (
              SELECT *, len(t)::DOUBLE AS n,
                CASE WHEN len(t) > 0
                  THEN list_sum(list_transform(t, w -> len(w)))::DOUBLE / len(t)
                  ELSE 0.0 END AS mwl,
                CASE WHEN len(t) > 0
                  THEN len(list_distinct(t))::DOUBLE / len(t)
                  ELSE 0.0 END AS dr,
                len(regexp_extract_all(lower(text),
                  '${TextAnalysis.allMarkersRegex}')) AS stop,
                CASE WHEN length(text) > 0
                  THEN length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE
                       / length(text)
                  ELSE 0.0 END AS sym
              FROM base)
            WHERE n >= 15 AND n <= 100000 AND mwl >= 2 AND mwl <= 12
              AND dr >= 0.55 AND stop >= 2 AND sym <= 0.1),
          dd AS (SELECT q.* FROM q JOIN (
              SELECT md5(array_to_string(t, ' ')) AS fp, min(doc_id) AS doc_id
              FROM q GROUP BY 1) k USING (doc_id)),
          probes AS (SELECT DISTINCT unnest(
              list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                i -> array_to_string(t[i:i+7], ' ')))) AS sh
            FROM base WHERE doc_id % 7 = 0),
          contam AS (SELECT DISTINCT doc_id FROM (
              SELECT doc_id, unnest(
                  list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                    i -> array_to_string(t[i:i+7], ' ')))) AS sh
              FROM dd) JOIN probes USING (sh)),
          clean AS (SELECT * FROM dd
            WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
          c AS (SELECT source, count(*) AS cn FROM clean GROUP BY source),
          m AS (SELECT min(cn) AS mn FROM c),
          thr AS (SELECT source,
              CAST(floor(CAST(mn AS DOUBLE) / cn * 1000000) AS BIGINT) AS thr
            FROM c CROSS JOIN m),
          bal AS (SELECT clean.* FROM clean JOIN thr USING (source)
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 < thr)
         SELECT 0 AS stage_ord, 'input' AS stage, count(*) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc FROM documents
         UNION ALL SELECT 1, 'quality', count(*), min(doc_id), max(doc_id) FROM q
         UNION ALL SELECT 2, 'dedup', count(*), min(doc_id), max(doc_id) FROM dd
         UNION ALL SELECT 3, 'decontaminate', count(*), min(doc_id), max(doc_id)
           FROM clean
         UNION ALL SELECT 4, 'balance', count(*), min(doc_id), max(doc_id) FROM bal
         ORDER BY stage_ord""",
    // exact sides fully verified; the boolean columns are the sketch
    // tolerance/soundness contracts the Spark side must make true
    "q82_hll_distinct" ->
      s"""WITH tok AS (SELECT source, unnest($Toks) AS t FROM documents)
         SELECT source, count(DISTINCT t) AS n_exact, true AS hll_ok
         FROM tok GROUP BY source
         UNION ALL
         SELECT 'ALL', count(DISTINCT t), true FROM tok
         ORDER BY source""",
    "q83_cms_heavyhitters" ->
      s"""SELECT t AS token, true AS cms_ok FROM (
            SELECT t, count(*) AS c
            FROM (SELECT unnest($Toks) AS t FROM documents)
            GROUP BY t ORDER BY c DESC, t ASC LIMIT 5)
         ORDER BY token""",
    "q79_oov" ->
      s"""WITH tok AS (SELECT doc_id, unnest($Toks) AS term FROM documents),
          v AS (SELECT term, 1 AS iv FROM (
              SELECT term, count(*) AS freq FROM tok GROUP BY term
              ORDER BY freq DESC, term ASC LIMIT 30))
         SELECT doc_id, count(*) AS n_tokens,
           count(CASE WHEN iv IS NULL THEN 1 END) AS n_oov,
           round(count(CASE WHEN iv IS NULL THEN 1 END)
                 / CAST(count(*) AS DOUBLE), 6) AS oov_frac
         FROM tok LEFT JOIN v USING (term)
         WHERE doc_id < 40
         GROUP BY doc_id ORDER BY doc_id""",
    // hand-computed from the muxed fixtures: solid JPEG frames decode
    // exactly (DC-only blocks), and the half/half frame splits on an
    // 8-px JPEG block boundary — 0x808080 → 128/255 → round4 0.502;
    // the 2-frame video has no third frame → NULL l2
    // pinned from the deterministic decode: v1 lumas (0, 1, 0.502) →
    // jump 1.0 at frame 2; v2's mirrored frames have equal means →
    // delta exactly 0.0, earliest tie = frame 2; v3 undecodable
    "q258_keyframes" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(3 AS INTEGER), CAST(2 AS INTEGER),
            CAST(1.0 AS DOUBLE)),
          (2, 2, 2, 0.0),
          (3, NULL, NULL, NULL))
         t(media_id, n_frames, keyframe_idx, keyframe_delta)
         ORDER BY media_id""",
    "q95_video_decode" ->
      """SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(8 AS INTEGER), CAST(8 AS INTEGER),
            CAST(3 AS INTEGER), CAST(300 AS BIGINT), CAST(10.0 AS DOUBLE),
            CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(0.502 AS DOUBLE)),
          (2, 16, 8, 2, 80, 25.0, 0.5, 0.5, NULL),
          (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL))
         t(media_id, video_width, video_height, video_n_frames,
           video_duration_ms, fps, l0, l1, l2)
         ORDER BY media_id""",
    // the IVF quantizer unrolled (the q84 PageRank pattern): c0 = the
    // vectors of the 8 smallest ids; each round = assignment (argmax of
    // dot(v, c/||c||), ties to the lower list) + re-estimation
    // (per-(list, dim) AVG; empty lists keep their previous centroid);
    // after 2 rounds, corpus rows join their 1 nearest list, queries
    // probe their 3 nearest, and exact cosine re-ranks to top-5
    "q68_ivf_knn" ->
      (IvfScoredCtes + """
         SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank"""),
    // the q68 train sample + per-subspace k-means unrolls (2 rounds,
    // squared-L2, ties to the lower code), encode over the full corpus,
    // then ADC = sum of per-subspace dot(query slice, neighbor's
    // centroid). CTE chains generated per subspace (m=4, ksub=4,
    // dsub=16) — the SQL mirror of Similarity.pqCodebooks/pqKnn.
        "q112_pq_adc" -> {
      val m = PqM; val dsub = PqDsub
      val adcSum = (0 until m).map { j =>
        val off = if (j == 0) "" else s"${j * dsub} + "
        s"list_sum(list_transform(range(1, ${dsub + 1}), i -> q.v[${off}i] * cb$j.c[i]))"
      }.mkString(" + ")
      val encJoins = (1 until m).map(j =>
        s"JOIN enc$j n$j ON n$j.vec_id = n0.vec_id").mkString(" ")
      val cbJoins = (0 until m).map(j =>
        s"JOIN c2_$j cb$j ON cb$j.code = n$j.code").mkString(" ")
      s"""WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          train AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT 262144),
          $PqSubChainCtes,
          scored AS (
            SELECT q.vec_id AS query_id, n0.vec_id AS neighbor_id,
              $adcSum AS adc
            FROM (SELECT vec_id, v FROM emb WHERE vec_id < 5) q
            CROSS JOIN enc0 n0 $encJoins $cbJoins
            WHERE n0.vec_id <> q.vec_id)
         SELECT query_id, neighbor_id, round(adc, 4) AS adc, rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank"""
    },
    // identical global max-abs scale, round-half-away int8 codes, and
    // integer dot ranking — the score column is exact on both engines
    "q125_sq_knn" ->
      """WITH emb AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
         s AS (
           SELECT CAST(max(list_max(list_transform(v, x -> abs(x)))) AS DOUBLE) AS sc
           FROM emb),
         enc AS (
           SELECT vec_id,
             list_transform(v, x -> CAST(round(x / sc * 127) AS INTEGER)) AS c
           FROM emb CROSS JOIN s),
         q AS (SELECT vec_id AS query_id, c AS qc FROM enc WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(range(1, len(qc) + 1),
               i -> CAST(qc[i] AS BIGINT) * e.c[i])) AS BIGINT) AS dot
           FROM q CROSS JOIN enc e WHERE e.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, dot, rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY dot DESC, neighbor_id ASC) AS rank
           FROM scored)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // sign bits packed 32-per-word (1<<63 would wrap signed BIGINT),
    // Hamming = popcount(xor) per word, top-20 shortlist, cosine rerank
    "q130_binary_knn" ->
      """WITH emb AS (
           SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
         enc AS (
           SELECT vec_id, v,
             list_transform(range(0, 2), w ->
               CAST(list_sum(list_transform(range(0, 32), j ->
                 CASE WHEN v[w * 32 + j + 1] > 0
                      THEN CAST(1::BIGINT << j AS BIGINT) ELSE 0 END))
               AS BIGINT)) AS c
           FROM emb),
         q AS (SELECT vec_id AS query_id, v AS qv, c AS qc
               FROM enc WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id, q.qv, e.v AS cv,
             CAST(list_sum(list_transform(range(1, 3),
               i -> bit_count(xor(qc[i], e.c[i])))) AS BIGINT) AS hamming
           FROM q CROSS JOIN enc e WHERE e.vec_id <> q.query_id),
         short AS (
           SELECT query_id, neighbor_id, hamming, qv, cv FROM (
             SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS hrank
             FROM scored)
           WHERE hrank <= 20),
         rer AS (
           SELECT query_id, neighbor_id, hamming,
             list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) /
             (sqrt(list_sum(list_transform(qv, x -> x * x))) *
              sqrt(list_sum(list_transform(cv, x -> x * x)))) AS cos
           FROM short)
         SELECT query_id, neighbor_id, hamming, round(cos, 4) AS cosine, rank
         FROM (
           SELECT *, row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM rer)
         WHERE rank <= 5 ORDER BY query_id, rank""",
    // merges after 5 rounds: (e,s)(es,t)(est,</w>)(l,o)(lo,w) — ties
    // break by count desc then pair lexicographic
    "q61_bpe_tokens" ->
      """SELECT * FROM (VALUES
          ('low',     'low </w>',          CAST(2 AS BIGINT)),
          ('lowest',  'low est</w>',       2),
          ('newest',  'n e w est</w>',     4),
          ('unknown', 'u n k n o w n </w>', 8),
          ('widest',  'w i d est</w>',     4))
         t(word, toks, n)
         ORDER BY word""",
    // keep-first duplicate 8-gram spans: gram hash = md5Long of the
    // space-joined tokens; removable where a lower-id doc has the same
    // gram; islands merge overlapping grams ([pos, pos+7] coverage)
    "q96_dup_spans" ->
      s"""WITH toks AS (
            SELECT doc_id, $Toks AS t FROM documents),
          grams AS (
            SELECT doc_id, u.i - 1 AS pos,
              ('0x' || substr(md5(array_to_string(t[u.i:u.i+7], ' ')), 1, 15))::BIGINT AS gh
            FROM toks, unnest(range(1, len(t) - 6)) u(i)),
          firsts AS (SELECT gh, min(doc_id) AS first_doc FROM grams GROUP BY gh),
          removable AS (
            SELECT g.doc_id, g.pos FROM grams g JOIN firsts f USING (gh)
            WHERE g.doc_id > f.first_doc),
          flagged AS (
            SELECT doc_id, pos,
              CASE WHEN pos > coalesce(max(pos + 7) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
            FROM removable),
          islands AS (
            SELECT doc_id, pos,
              sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM flagged),
          spans AS (
            SELECT doc_id, island, min(pos) AS s, max(pos) + 7 AS e
            FROM islands GROUP BY doc_id, island),
          summary AS (
            SELECT doc_id, count(*) AS n_spans,
              CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
            FROM spans GROUP BY doc_id)
         SELECT s.doc_id, s.n_spans, s.dup_tokens,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           round(s.dup_tokens * 1.0 / len(t.t), 4) AS dup_ratio
         FROM summary s JOIN toks t USING (doc_id)
         ORDER BY doc_id""",
    // per-(label, dim) AVG centroid, cosine against own centroid,
    // ascending rank (ties to lower vec_id)
    "q99_centroid_outliers" ->
      """WITH emb AS (
            SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          cents AS (
            SELECT label, list(m ORDER BY pos) AS c FROM (
              SELECT label, t.i AS pos, avg(v[t.i]) AS m
              FROM emb, range(1, 65) t(i) GROUP BY label, t.i)
            GROUP BY label),
          scored AS (
            SELECT e.label, e.vec_id,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * c.c[i])) /
              (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
               sqrt(list_sum(list_transform(c.c, x -> x * x)))) AS cos
            FROM emb e JOIN cents c USING (label))
         SELECT label, vec_id, round(cos, 4) AS cosine, rank FROM (
           SELECT *, row_number() OVER (
             PARTITION BY label ORDER BY cos ASC, vec_id ASC) AS rank
           FROM scored)
         WHERE rank <= 3 ORDER BY label, rank""",
    // window sum must CAST to BIGINT (DuckDB widens to HUGEINT); a doc
    // covering bucket tokens [end_cum-n, end_cum) contributes to
    // sequences [(end_cum-n)//512, (end_cum-1)//512]
    "q100_sequence_pack" ->
      s"""WITH toks AS (
            SELECT doc_id, CAST(doc_id // 100 AS BIGINT) AS bucket,
              CAST(len($Toks) AS BIGINT) AS n
            FROM documents
            WHERE len($Toks) > 0),
          cum AS (
            SELECT doc_id, bucket, n,
              CAST(sum(n) OVER (PARTITION BY bucket ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_cum
            FROM toks),
          spans AS (
            SELECT bucket, doc_id, end_cum,
              unnest(range((end_cum - n) // 512, (end_cum - 1) // 512 + 1)) AS seq
            FROM cum)
         SELECT bucket, seq, count(*) AS n_docs,
           least(512, max(end_cum) - seq * 512) AS n_tokens
         FROM spans GROUP BY bucket, seq ORDER BY bucket, seq""",
    // greedy priority-prefix per source: a doc is kept when the tokens
    // STRICTLY BEFORE it (md5-priority order, ties by id) are under
    // budget — the oracle replays it as one window cumsum
    "q101_token_budget" ->
      s"""WITH toks AS (
            SELECT doc_id, source, CAST(len($Toks) AS BIGINT) AS n,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS prio
            FROM documents),
          cum AS (
            SELECT *, CAST(sum(n) OVER (PARTITION BY source ORDER BY prio, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n AS start_cum
            FROM toks)
         SELECT source, count(*) AS n_docs_kept, CAST(sum(n) AS BIGINT) AS n_tokens_kept
         FROM cum WHERE start_cum < 1000
         GROUP BY source ORDER BY source""",
    // Lucene BM25: idf = ln((N - df + .5)/(df + .5) + 1), k1 = 1.2,
    // b = 0.75; expression association mirrors the engine exactly
    "q102_bm25" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
          stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
          terms AS (
            SELECT doc_id, u.term FROM toks, unnest(t) AS u(term)
            WHERE u.term IN ('spark', 'data', 'query', 'join')),
          tf AS (
            SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
            FROM terms GROUP BY doc_id, term),
          dfreq AS (
            SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
          scored AS (
            SELECT t.doc_id,
              ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) * t.tf * 2.2
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS s
            FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
            CROSS JOIN stats s)
         SELECT doc_id, round(sum(s), 4) AS bm25 FROM scored
         GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 15""",
    "q103_source_overlap" ->
      s"""WITH fps AS (
            SELECT DISTINCT md5(array_to_string(($Toks)[1:5], ' ')) AS fp, source
            FROM documents)
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
         FROM fps a JOIN fps b USING (fp)
         WHERE a.source < b.source
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // identical injection expressions, the same Java∩RE2 patterns, and
    // the residual recount on the scrubbed text (must be 0)
    "q111_pii_audit" -> {
      val Seq(em, ph, ip, sn) = TextAnalysis.piiPatterns.map(_._2)
      val scrub = s"regexp_replace(regexp_replace(regexp_replace(" +
        s"regexp_replace(t, '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g')," +
        s" '$ip', '<IP>', 'g'), '$sn', '<SSN>', 'g')"
      s"""WITH inj AS (
            SELECT source, doc_id,
              text ||
              CASE WHEN doc_id % 5 = 0 THEN ' contact user' ||
                CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END ||
              CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-' ||
                lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
                ELSE '' END ||
              CASE WHEN doc_id % 11 = 0 THEN ' host 192.168.' ||
                CAST(doc_id % 256 AS VARCHAR) || '.' ||
                CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END ||
              CASE WHEN doc_id % 13 = 0 THEN ' id 123-45-' ||
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
            FROM documents),
          counts AS (
            SELECT source,
              len(regexp_extract_all(t, '$em')) AS e,
              len(regexp_extract_all(t, '$ph')) AS p,
              len(regexp_extract_all(t, '$ip')) AS i,
              len(regexp_extract_all(t, '$sn')) AS s,
              len(regexp_extract_all($scrub, '$em')) +
              len(regexp_extract_all($scrub, '$ph')) +
              len(regexp_extract_all($scrub, '$ip')) +
              len(regexp_extract_all($scrub, '$sn')) AS resid
            FROM inj)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(e) AS BIGINT) AS emails,
           CAST(sum(p) AS BIGINT) AS phones,
           CAST(sum(i) AS BIGINT) AS ips,
           CAST(sum(s) AS BIGINT) AS ssns,
           CAST(sum(CASE WHEN e + p + i + s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(sum(resid) AS BIGINT) AS residual_matches
         FROM counts GROUP BY source ORDER BY source"""
    },
    // the same mutation (drop %17=3, re-source %13=5, add shifted
    // copies of %29=1) and the same null-safe fingerprint: md5 over
    // chr(1)-joined columns with chr(0) standing in for NULL
    "q113_snapshot_diff" -> {
      def fp(as: String) = s"""md5(concat_ws(chr(1),
              coalesce(CAST(text AS VARCHAR), chr(0)),
              coalesce(CAST(lang AS VARCHAR), chr(0)),
              coalesce(CAST(source AS VARCHAR), chr(0)),
              coalesce(CAST(n_chars AS VARCHAR), chr(0)))) AS $as"""
      s"""WITH newd AS (
            SELECT doc_id, text, lang,
              CASE WHEN doc_id % 13 = 5 THEN source || '-v2' ELSE source
                END AS source,
              n_chars
            FROM documents WHERE doc_id % 17 <> 3
            UNION ALL
            SELECT doc_id + 10000000, text, lang, source, n_chars
            FROM documents WHERE doc_id % 29 = 1),
          fpo AS (SELECT doc_id AS id, ${fp("fp_old")} FROM documents),
          fpn AS (SELECT doc_id AS id, ${fp("fp_new")} FROM newd)
         SELECT coalesce(fpo.id, fpn.id) AS id,
           CASE WHEN fp_old IS NULL THEN 'added'
                WHEN fp_new IS NULL THEN 'removed'
                WHEN fp_old <> fp_new THEN 'changed'
                ELSE 'unchanged' END AS change
         FROM fpo FULL OUTER JOIN fpn ON fpo.id = fpn.id
         ORDER BY id"""
    },
    // q69's LSH + recursive-CTE closure, then q66's md5 split buckets
    // keyed on the CLUSTER id; clusters_spanning_splits recomputed from
    // the assignment (must be 0)
    "q110_leakage_safe_split" ->
      s"""WITH RECURSIVE
          docs AS (
            SELECT doc_id AS id,
              list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          sigs AS (
            SELECT id, sh,
              list_transform(range(0, 16), i ->
                coalesce(list_min(list_transform(sh, s ->
                  (((i * 2654435761) % 2147483646 + 1)
                     * (('0x' || substr(md5(s), 1, 7))::BIGINT)
                   + (i * 40503 * 65537) % 2147483647) % 2147483647)),
                  9223372036854775807)) AS sig
            FROM docs WHERE len(sh) > 0),
          banded AS (
            SELECT id, sh, b.b AS band,
              array_to_string(list_transform(sig[b.b*4+1:b.b*4+4],
                h -> CAST(h AS VARCHAR)), '_') AS bucket
            FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) b),
          cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          verified AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) = 0 THEN 0.0
                  ELSE len(list_intersect(sh_a, sh_b))::DOUBLE /
                       len(list_distinct(list_concat(sh_a, sh_b))) END AS jac
              FROM cand)
            WHERE jac >= 0.5),
          u AS (SELECT id_a AS a, id_b AS b FROM verified
                UNION SELECT id_b AS a, id_a AS b FROM verified),
          reach(id, r) AS (
            SELECT a AS id, a AS r FROM u
            UNION
            SELECT u.a AS id, reach.r AS r FROM u JOIN reach ON u.b = reach.id),
          comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
          assigned AS (
            SELECT doc_id, comp,
              CASE WHEN b < 800000 THEN 'train'
                   WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
            FROM (
              SELECT doc_id, comp,
                ('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 15))::BIGINT
                  % 1000000 AS b
              FROM (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
                    FROM documents d LEFT JOIN comps c ON d.doc_id = c.id))),
          spanning AS (
            SELECT CAST(sum(CASE WHEN nsp > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS clusters_spanning_splits
            FROM (SELECT comp, count(DISTINCT split) AS nsp
                  FROM assigned GROUP BY comp))
         SELECT split, count(*) AS n_docs,
           count(DISTINCT comp) AS n_clusters,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           clusters_spanning_splits
         FROM assigned CROSS JOIN spanning
         GROUP BY split, clusters_spanning_splits ORDER BY split""",
    // same hyperplane family as q56; train = vec_id % 10 <> 0, probes
    // = the rest; smallest matching probe + hit count per train vector
    "q109_semantic_decontaminate" ->
      """WITH sig AS (
            SELECT vec_id, embedding,
              list_sum(list_transform(range(0, 4), p ->
                CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), j ->
                  embedding[j]::DOUBLE *
                    (((('0x' || substr(md5('hp:' || p::VARCHAR || ':' || (j-1)::VARCHAR), 1, 15))::BIGINT
                       % 2001) - 1000) / 1000.0))) >= 0
                THEN 1 << p ELSE 0 END)) AS s
            FROM embeddings),
          hits AS (
            SELECT t.vec_id AS train_id, p.vec_id AS probe_id,
              list_sum(list_transform(range(1, len(t.embedding) + 1),
                i -> t.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(range(1, len(t.embedding) + 1),
                i -> t.embedding[i]::DOUBLE * t.embedding[i]::DOUBLE))) *
               sqrt(list_sum(list_transform(range(1, len(p.embedding) + 1),
                i -> p.embedding[i]::DOUBLE * p.embedding[i]::DOUBLE)))) AS cos
            FROM sig t JOIN sig p ON t.s = p.s
            WHERE t.vec_id % 10 <> 0 AND p.vec_id % 10 = 0)
         SELECT train_id, probe_id, round(cos, 4) AS cosine, n_hits FROM (
           SELECT train_id, probe_id, cos,
             count(*) OVER (PARTITION BY train_id) AS n_hits,
             row_number() OVER (PARTITION BY train_id ORDER BY probe_id) AS rn
           FROM hits WHERE cos >= 0.3)
         WHERE rn = 1 ORDER BY train_id""",
    // SemDeDup: the q68 k-means unroll (c0 → 2 rounds → final
    // assignment), then within-cluster pairs with cosine >= 0.3; each
    // removed vector reports its smallest qualifying keeper
    "q105_semdedup" ->
      """WITH emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          train AS (
            SELECT vec_id, v FROM emb
            ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT 262144),
          c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list, v AS c
            FROM (SELECT vec_id, v FROM train ORDER BY vec_id LIMIT 8)),
          s1 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c0)) n),
          a1 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s1) WHERE rn = 1),
          c1 AS (
            SELECT c0.list, coalesce(nw.c, c0.c) AS c
            FROM c0 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a1 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s2 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM train e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c1)) n),
          a2 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s2) WHERE rn = 1),
          c2 AS (
            SELECT c1.list, coalesce(nw.c, c1.c) AS c
            FROM c1 LEFT JOIN (
              SELECT list, list(m ORDER BY pos) AS c FROM (
                SELECT a.list AS list, t.i AS pos, avg(a.v[t.i]) AS m
                FROM a2 a, range(1, 65) t(i)
                GROUP BY a.list, t.i)
              GROUP BY list) nw USING (list)),
          s3 AS (
            SELECT e.vec_id, e.v, n.list,
              list_sum(list_transform(range(1, 65), i -> e.v[i] * n.cn[i])) AS s
            FROM emb e CROSS JOIN (
              SELECT list, CASE WHEN nrm = 0 THEN c ELSE list_transform(c, x -> x / nrm) END AS cn
              FROM (SELECT list, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM c2)) n),
          a3 AS (
            SELECT vec_id, v, list FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, list ASC) AS rn
              FROM s3) WHERE rn = 1),
          pairs AS (
            SELECT a.list AS list, b.vec_id AS vec_id, a.vec_id AS keeper,
              list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) /
              (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
               sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
            FROM a3 a JOIN a3 b ON a.list = b.list AND a.vec_id < b.vec_id)
         SELECT list, vec_id, keeper AS keeper_id, round(cos, 4) AS cosine FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY keeper) AS rn
           FROM pairs WHERE cos >= 0.3)
         WHERE rn = 1 ORDER BY vec_id""",
    // prefix-blocked Levenshtein verify; the filter compares the raw
    // distance against len * 0.05 (norm_dist is rounded for display
    // only, so both engines filter on the unrounded quotient)
    "q106_fuzzy_dedup" ->
      s"""WITH t AS (
            SELECT doc_id, text,
              md5(array_to_string(($Toks)[1:2], ' ')) AS blk
            FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.text, b.text) AS dist,
           round(levenshtein(a.text, b.text)
                 / CAST(greatest(len(a.text), len(b.text)) AS DOUBLE), 4) AS norm_dist
         FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
         WHERE levenshtein(a.text, b.text)
               <= greatest(len(a.text), len(b.text)) * 0.05
         ORDER BY id_a, id_b""",
    // commonness = exp(mean ln(df/N)) over the doc's distinct 3-grams;
    // weight = (1/commonness) / corpus mean of (1/commonness) at α=1
    "q296_softdedup_weights" ->
      s"""WITH g AS (
            SELECT doc_id,
              unnest(list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> array_to_string(t[i:i+2], ' ')))) AS g
            FROM (SELECT doc_id, $Toks AS t FROM documents)),
          nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM g),
          f AS (SELECT g, count(*) AS df FROM g GROUP BY g),
          per AS (
            SELECT doc_id, count(*) AS n_grams,
              exp(avg(ln(df::DOUBLE / n_docs))) AS commonness
            FROM g JOIN f USING (g) CROSS JOIN nd
            GROUP BY doc_id),
          nrm AS (SELECT avg(1.0 / commonness) AS mean_raw FROM per)
         SELECT doc_id, n_grams, round(commonness, 6) AS commonness,
           round((1.0 / commonness) / mean_raw, 6) AS weight
         FROM per CROSS JOIN nrm ORDER BY doc_id""",

    // exhaustive probe (nProbe = nLists) ⇒ the persisted-index query IS
    // brute-force top-k — same oracle as q35
    "q299_ivf_persist" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          scored AS (
            SELECT query_id, neighbor_id,
              list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) /
              (sqrt(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
               sqrt(list_sum(list_transform(range(1, len(cv) + 1), i -> cv[i]::DOUBLE * cv[i]::DOUBLE)))) AS cosine
            FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
          SELECT query_id, rank, neighbor_id, round(cosine, 4) AS cosine FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored)
          WHERE rank <= 5 ORDER BY query_id, rank""",

    // p_temp = tokens^alpha / sum(tokens^alpha) — the 1/tot^alpha
    // factor cancels, so both engines compute the identical quotient
    "q107_temperature_mix" ->
      s"""WITH counts AS (
            SELECT source, CAST(sum(len($Toks)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY source),
          totals AS (
            SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
              sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS zn
            FROM counts)
         SELECT source, n_tokens,
           round(n_tokens / tot, 6) AS p_raw,
           round(pow(CAST(n_tokens AS DOUBLE), 0.5) / zn, 6) AS p_temp,
           round(pow(CAST(n_tokens AS DOUBLE), 0.5) / zn * 100000 / n_tokens, 4) AS epochs
         FROM counts CROSS JOIN totals ORDER BY source""",
    // RRF: both rankings truncate to their top-100 before fusing;
    // a doc present in one ranking only scores from that side alone
    "q108_rrf_hybrid" ->
      s"""WITH toks AS (SELECT doc_id, $Toks AS t FROM documents),
          dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
          stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
          terms AS (
            SELECT doc_id, u.term FROM toks, unnest(t) AS u(term)
            WHERE u.term IN ('spark', 'data', 'query', 'join')),
          tf AS (
            SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
            FROM terms GROUP BY doc_id, term),
          dfreq AS (
            SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
          bm AS (
            SELECT t.doc_id,
              sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1) * t.tf * 2.2
                / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS s
            FROM tf t JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
            CROSS JOIN stats s GROUP BY t.doc_id),
          lex AS (
            SELECT doc_id, bm25_rank FROM (
              SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS bm25_rank
              FROM bm) WHERE bm25_rank <= 100),
          emb AS (
            SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
          qv AS (SELECT v FROM emb WHERE vec_id = 0),
          sem AS (
            SELECT doc_id, cos_rank FROM (
              SELECT vec_id AS doc_id,
                row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS cos_rank
              FROM (
                SELECT e.vec_id,
                  list_sum(list_transform(range(1, 65), i -> e.v[i] * q.v[i])) /
                  (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
                   sqrt(list_sum(list_transform(q.v, x -> x * x)))) AS cos
                FROM emb e CROSS JOIN qv q WHERE e.vec_id <> 0))
            WHERE cos_rank <= 100),
          fused AS (
            SELECT coalesce(l.doc_id, m.doc_id) AS doc_id,
              l.bm25_rank, m.cos_rank,
              coalesce(1.0 / (60 + l.bm25_rank), 0) +
              coalesce(1.0 / (60 + m.cos_rank), 0) AS rrf
            FROM lex l FULL JOIN sem m ON l.doc_id = m.doc_id)
         SELECT doc_id, bm25_rank, cos_rank, round(r, 6) AS rrf FROM (
           SELECT doc_id, bm25_rank, cos_rank, rrf AS r FROM fused
           ORDER BY r DESC, doc_id LIMIT 15)
         ORDER BY r DESC, doc_id""",
    // ORDER BY the unrounded drift (both engines compute the same
    // exact-int-over-double quotients), ties by term
    "q104_term_drift" ->
      s"""WITH terms AS (
            SELECT s.doc_id % 2 = 0 AS old, u.term
            FROM (SELECT doc_id, $Toks AS t FROM documents) s,
              unnest(s.t) AS u(term)),
          counts AS (
            SELECT term,
              CAST(sum(CASE WHEN old THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
              CAST(sum(CASE WHEN old THEN 0 ELSE 1 END) AS BIGINT) AS c_b
            FROM terms GROUP BY term),
          totals AS (
            SELECT CAST(sum(c_a) AS DOUBLE) AS t_a,
              CAST(sum(c_b) AS DOUBLE) AS t_b FROM counts)
         SELECT term, round(c_a / t_a, 6) AS p_a, round(c_b / t_b, 6) AS p_b,
           round(abs(c_a / t_a - c_b / t_b), 6) AS drift
         FROM counts CROSS JOIN totals
         ORDER BY abs(c_a / t_a - c_b / t_b) DESC, term LIMIT 20""")
}
