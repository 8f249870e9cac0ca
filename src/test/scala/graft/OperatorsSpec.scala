package graft

import org.apache.spark.sql.functions._
import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Bpe.learnFromFreqs reproduces the classic merge sequence") {
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnFromFreqs(freqs, 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encode("lowest", ranks) == Seq("low", "est</w>"))
    assert(Bpe.encode("newest", ranks) == Seq("n", "e", "w", "est</w>"))
    // out-of-vocab word degrades to characters, never fails
    assert(Bpe.encode("xyz", ranks) == Seq("x", "y", "z", "</w>"))
  }

  test("Bpe.learn exhausts merges on a tiny corpus without looping") {
    val corpus = Seq("aa aa ab").toDF("text")
    val merges = Bpe.learn(corpus, "text", numMerges = 100)
    assert(merges.nonEmpty && merges.size < 100) // stopped when dry
    val toks = Bpe.tokenize(corpus, "text", merges)
      .select("n_bpe_tokens").as[Long].head
    assert(toks == 3L) // each word fully merged to one token
  }

  test("Bpe.learnDistributed: hand-computed merges, dry stop, tie-break") {
    // words: aaab ×2, ab ×1. Round 1: (a,a)=4 beats (a,b)=3 → "aa".
    // Round 2: (a,b)=3 beats (aa,a)=2 → "ab". Round 3: (aa,ab)=2.
    // Round 4: every word is one token → dry stop at 3 merges.
    val corpus = Seq("aaab aaab ab").toDF("text")
    val merges = Bpe.learnDistributed(corpus, "text", numMerges = 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
    // count tie (x,y)=2 vs (a,b)=2 → lexicographically smaller pair wins
    val tie = Seq("xy xy ab ab").toDF("text")
    val m1 = Bpe.learnDistributed(tie, "text", numMerges = 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m1 == Seq((1, "a", "b", "ab", 2L)))
    // left-to-right non-overlap: "a a a a" merges to "aa aa", so round 2
    // of pure-'a' text is (aa, aa) — the wrapped-string replace must not
    // let adjacent occurrences share a delimiter
    val runs = Seq("aaaa aaaa").toDF("text")
    val m2 = Bpe.learnDistributed(runs, "text", numMerges = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m2 == Seq((1, "a", "a", "aa", 6L), (2, "aa", "aa", "aaaa", 2L)))
  }

  test("Forecast.holtDaily: hand-computed fold, zero-filled grid") {
    val day = 86400L * 1000 * 1000 * 1000
    // key k: daily counts [4, 8, 2]; key m: [1, 0(filled), 3]
    val rows =
      (0 until 4).map(i => ("k", 0 * day + i)) ++
      (0 until 8).map(i => ("k", 1 * day + i)) ++
      (0 until 2).map(i => ("k", 2 * day + i)) ++
      Seq(("m", 10L)) ++ (0 until 3).map(i => ("m", 2 * day + i))
    val df = rows.toDF("k", "ts")
    val out = Forecast.holtDaily(df, "k", "ts")
      .orderBy("k")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    // k: l1=4,b1=0; t2: l=6,b=1; t3: l=4.5,b=-0.25 → f1=4.25 f3=3.75 f7=2.75
    // m: l1=1,b1=0; t2: l=0.5,b=-0.25; t3: l=1.625,b=0.4375 → f1=2.0625
    assert(out == Seq(
      ("k", 3L, 4.5, -0.25, 4.25, 3.75, 2.75),
      ("m", 3L, 1.625, 0.4375, 2.0625, 2.9375, 4.6875)))
  }

  test("TextAnalysis.fertilityReport: hand-computed single doc") {
    val df = Seq(("Hello, world!! ab", "en")).toDF("text", "lang")
    val r = TextAnalysis.fertilityReport(df, "text", "lang").collect()(0)
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 1L) // n_docs
    assert(r.getLong(2) == 3L) // words: hello, world, ab
    // bpe-ish: ceil(5/4)+ceil(5/4)+ceil(2/4)=5 word pieces + 3 symbols
    assert(r.getLong(3) == 8L)
    assert(r.getLong(4) == 17L && r.getLong(5) == 17L) // chars, bytes
    assert(r.getDouble(6) == 2.666667) // 8/3 on the 1e-6 grid
    assert(r.getDouble(7) == 2.125 && r.getDouble(8) == 2.125)
  }

  test("TextAnalysis.goodTuring: hand-computed bigram histogram") {
    val df = Seq("a a a b b c").toDF("text")
    val out = TextAnalysis.goodTuring(df, "text", n = 2).collect().toSeq
    // bigrams: "a a"×2, "a b", "b b", "b c" → N=5, N_1=3, N_2=1
    assert(out.map(_.getLong(0)) == Seq(0L, 1L, 2L))
    val r0 = out(0)
    assert(r0.getLong(1) == 0L && r0.isNullAt(2)
      && r0.getDouble(3) == 0.6) // unseen mass N1/N = 3/5
    assert(out(1).getLong(1) == 3L
      && out(1).getDouble(2) == 0.666667 // r* = 2·N2/N1 = 2/3
      && out(1).getDouble(3) == 0.4)     // p = 2·N2/N = 2/5
    assert(out(2).isNullAt(2) && out(2).isNullAt(3)) // N_3 = 0 → tail
  }

  test("TextAnalysis.logOddsTerms: signs, dense scaffold, zero cells") {
    val df = Seq(
      ("x x x x y", "s1"), ("y y y y x", "s2"), ("z z", "s3"))
      .toDF("text", "source")
    val out = TextAnalysis.logOddsTerms(df, "text", "source", topV = 3)
      .collect().toSeq
    assert(out.size == 9) // 3 sources × top-3 terms, zero cells kept
    def cell(s: String, t: String) =
      out.find(r => r.getString(0) == s && r.getString(1) == t).get
    // each source's own word scores positive, others' negative
    assert(cell("s1", "x").getDouble(3) > 0 && cell("s1", "x").getDouble(4) > 0)
    assert(cell("s1", "y").getDouble(3) < 0)
    assert(cell("s2", "y").getDouble(3) > 0)
    assert(cell("s3", "z").getDouble(3) > 0)
    assert(cell("s3", "x").getLong(2) == 0L) // zero-usage cell present
    assert(cell("s3", "x").getDouble(3) < 0)
  }

  test("Graph.partitionConductance: hand graph, isolated attr NULL") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (3L, 4L))
      .toDF("src", "dst")
    val nodes = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "c")).toDF("id", "attr")
    val out = Graph.partitionConductance(edges, "src", "dst",
        nodes, "id", "attr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1d else r.getDouble(5))).toSeq
    // a: within {12,23}, cut {34} → vol 5; b: within {45}, cut {34} →
    // vol 3; total vol 8; φ = 1/min(5,3) = 1/min(3,5) = 1/3 (floor grid
    // 0.333333); c: isolated → NULL
    assert(out == Seq(
      ("a", 3L, 2L, 1L, 5L, 0.333333),
      ("b", 2L, 1L, 1L, 3L, 0.333333),
      ("c", 1L, 0L, 0L, 0L, -1d)))
  }

  test("Similarity.hopkinsStatistic: clustered ≫ uniform-ish") {
    val rnd = new scala.util.Random(7)
    def jit() = (rnd.nextDouble() - 0.5) * 0.02
    // two tight blobs in 4-d
    val blobs = (1 to 60).map { i =>
      val c = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Array(c + jit(), c + jit(), c + jit(), c + jit()))
    }.toDF("vec_id", "embedding")
    // near-uniform cloud over the same box
    def u() = rnd.nextDouble() * 2 - 1
    val unif = (1 to 60).map(i =>
      (i.toLong, Array(u(), u(), u(), u()))).toDF("vec_id", "embedding")
    def h(df: org.apache.spark.sql.DataFrame): Double =
      Similarity.hopkinsStatistic(df, "embedding", "vec_id", m = 12)
        .collect()(0).getDouble(4)
    val hB = h(blobs)
    val hU = h(unif)
    assert(hB > 0.85, s"blobs should be clearly clustered: $hB")
    assert(hU > 0.3 && hU < 0.85, s"uniform cloud mid-range: $hU")
    assert(hB > hU + 0.1)
  }

  test("Eval.sprt: boundary crossings and continue, hand sequences") {
    // p0=0.2 vs p1=0.8 ⇒ c1 = ln4, c0 = −ln4, A ≈ 2.944: three
    // successes cross H1 at t=3, three failures cross H0 at t=3,
    // a 6-long alternating stream never crosses
    val rows =
      Seq(("g1", 1L, 1L, "hit"), ("g1", 2L, 2L, "hit"), ("g1", 3L, 3L, "hit"),
        ("g2", 1L, 4L, "miss"), ("g2", 2L, 5L, "miss"), ("g2", 3L, 6L, "miss")) ++
      (1 to 6).map(i =>
        ("g3", i.toLong, (6 + i).toLong, if (i % 2 == 1) "hit" else "miss"))
    val df = rows.toDF("g", "ts", "event_id", "kind")
    val out = graft.operators.Eval.sprt(df, "g", "ts", "event_id",
        success = col("kind") === "hit", p0 = 0.2, p1 = 0.8)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("g1", "accept_h1", 3, 3L),
      ("g2", "accept_h0", 3, 0L),
      ("g3", "continue", 6, 3L)))
    // llr at the g1 decision = 3·ln4 on the shared constant grid
    val (c1, _, _, _) =
      graft.operators.Eval.sprtConstants(0.2, 0.8, 0.05, 0.05)
    val llr = graft.operators.Eval.sprt(df, "g", "ts", "event_id",
        col("kind") === "hit", 0.2, 0.8)
      .filter(col("g") === "g1").collect()(0).getDouble(4)
    assert(llr == 3L * c1)
  }

  test("TextAnalysis.rakeKeyphrases: hand-computed phrase scores") {
    // stopwords "the"/"and" split two islands; RAKE scores:
    // quick/brown/fox deg 3 freq 1 → 3 each ⇒ phrase 9;
    // lazy/dog deg 2 freq 1 → 2 each ⇒ phrase 4
    val df = Seq((1L, "the quick brown fox and the lazy dog"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeyphrases(df, "text", "doc_id")
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq(
      (1, "quick brown fox", 1L, 9.0), (2, "lazy dog", 1L, 4.0)))
    // repeated phrase: deg/freq double but the ratio — and the phrase
    // score — is unchanged; occurrences count it
    val df2 = Seq((1L, "lazy dog and the lazy dog")).toDF("doc_id", "text")
    val out2 = TextAnalysis.rakeKeyphrases(df2, "text", "doc_id")
      .collect().map(r =>
        (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out2 == Seq(("lazy dog", 2L, 4.0)))
  }

  test("Privacy.randomizedResponse: deterministic replay, debiased share") {
    val docs = (1 to 400).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", s"s${i % 2}"))
      .toDF("doc_id", "lang", "source")
    def run() = Privacy.randomizedResponse(docs, "source", "doc_id",
      sensitive = col("lang") === "en", p = 0.75).collect().toSeq
    val a = run()
    assert(a == run()) // md5 coin ⇒ identical replay
    // s0 is all-en (true 1.0), s1 all-de (true 0.0); the debiased
    // estimator must land near truth (200 flips, p=0.75)
    val m = a.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(4), r.getDouble(5))).toMap
    assert(m("s0")._1 == 200L && m("s0")._3 == 1.0)
    assert(m("s1")._3 == 0.0)
    assert(math.abs(m("s0")._2 - 1.0) < 0.2, m.toString)
    assert(math.abs(m("s1")._2 - 0.0) < 0.2, m.toString)
  }

  test("Dedup.stitchingPairs: seams found, self-seam excluded") {
    val docs = Seq(
      (1L, "a b c d e"),        // tail "c d e"
      (2L, "c d e x y z"),      // head "c d e", tail "x y z"
      (3L, "x y z w"),          // head "x y z"
      (4L, "p q r p q r"))      // own head == own tail → excluded
      .toDF("doc_id", "text")
    val got = Dedup.stitchingPairs(docs, "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(got == Seq((1L, 2L, "c d e"), (2L, 3L, "x y z")))
  }

  test("Events.markovStationary: 2/3–1/3 chain, dangling state dropped") {
    val day = 1000000L
    // user 1: A A B A A B → P(A→A)=P(A→B)=1/2, P(B→A)=1 ⇒ π=(2/3,1/3)
    val rows = Seq("A", "A", "B", "A", "A", "B").zipWithIndex.map {
      case (t, i) => (1L, i * day, (i + 1).toLong, t)
    } ++ Seq((2L, 0L, 100L, "A"), (2L, day, 101L, "C")) // A→C dangling
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.markovStationary(df, "user_id", "ts", "event_type",
        "event_id", iters = 40)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // C is never a source → dropped from the state space entirely
    assert(got.keySet == Set("A", "B"))
    assert(math.abs(got("A") - 2d / 3) < 1e-9, got.toString)
    assert(math.abs(got("B") - 1d / 3) < 1e-9, got.toString)
  }

  test("Events.markovAttribution: hand-computed removal effects") {
    // journeys: u1 view→click→CONV, u2 view→NULL, u3 direct CONV.
    // P: START→{view ⅔, CONV ⅓}; view→{click ½, NULL ½}; click→CONV 1.
    // p_full(START) = ⅔·½ + ⅓ (on the 1e-6/1e-12 grids: 0.6666665);
    // removing click OR view both leave only the direct ⅓ → 0.333333;
    // removal effect = 1 − ⅓/(2/3) = ½ on the 1e-6 grid.
    val rows = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      (2L, 10L, 4L, "view"),
      (3L, 10L, 5L, "purchase"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.markovAttribution(df, "user_id", "ts", "event_type",
        "event_id", convType = "purchase")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("click", 0.6666665, 0.333333, 0.5),
      ("view", 0.6666665, 0.333333, 0.5)))
  }

  test("Events.shapleyAttribution: hand-computed coalition values") {
    // same journeys as the Markov spec: u1 {view,click}→conv,
    // u2 {view}→no, u3 {}→direct conv. n = 2 channels, weights all 1:
    // v(∅)=1(direct), v({c})=1, v({v})=1, v({c,v})=2 ⇒ φ = 1 each,
    // shapley = 1/2!/3 = 0.166667
    val rows = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      (2L, 10L, 4L, "view"),
      (3L, 10L, 5L, "purchase"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.shapleyAttribution(df, "user_id", "ts", "event_type",
        "event_id", convType = "purchase")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("click", 3L, 1L, 0.166667), ("view", 3L, 1L, 0.166667)))
  }

  test("Eval.quantileNormalizeGrid: hand-computed pooled mapping") {
    // group a: {1,1,3}; group b: {2}. Pooled sorted cents: 100,100,200,
    // 300 (cum 2,3,4). a@1.0: R=2,n=3 → t=⌈8/3⌉=3 → 2.0;
    // a@3.0: R=3 → t=4 → 3.0; b@2.0: R=1,n=1 → t=4 → 3.0
    val df = Seq(("a", 1d), ("a", 1d), ("a", 3d), ("b", 2d))
      .toDF("g", "v")
    val out = graft.operators.Eval.quantileNormalizeGrid(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("a", 1.0, 2L, 2.0), ("a", 3.0, 1L, 3.0), ("b", 2.0, 1L, 3.0)))
  }

  test("Similarity.twoNnIntrinsicDim: line ≈ 1-d, cube ≈ 4-d") {
    val rnd = new scala.util.Random(11)
    // RANDOMLY sampled 1-d manifold in 4-d ambient space — TwoNN's
    // Pareto model assumes Poisson sampling; a near-regular grid has
    // d2/d1 ≈ 1 everywhere and overestimates wildly
    val line = (1 to 60).map(i =>
      (i.toLong, Array(rnd.nextDouble() * 10, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val cube = (1 to 60).map(i =>
      (i.toLong, Array.fill(4)(rnd.nextDouble())))
      .toDF("vec_id", "embedding")
    def id(df: org.apache.spark.sql.DataFrame): Double =
      Similarity.twoNnIntrinsicDim(df, "embedding", "vec_id", m = 25)
        .collect()(0).getDouble(2)
    val idLine = id(line)
    val idCube = id(cube)
    assert(idLine > 0.4 && idLine < 2.0, s"line ID = $idLine")
    assert(idCube > 2.0 && idCube < 8.0, s"cube ID = $idCube")
    assert(idCube > idLine + 1.0)
  }

  test("Similarity.classSeparability: hand-computed scatter decomposition") {
    // a: (0,0),(2,0); b: (10,0),(12,0): within-var 1.0 each (dim0
    // scatter 2 over n=2), centroids 1 and 11 vs global 6 →
    // centroid_d2 = 25; fisher = ΣB/ΣW = 100/4 = 25
    val df = Seq(
      (1, Array(0d, 0d)), (1, Array(2d, 0d)),
      (2, Array(10d, 0d)), (2, Array(12d, 0d)))
      .toDF("label", "embedding")
    val out = Similarity.classSeparability(df, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      (1, 2L, 1.0, 25.0, 25.0), (2, 2L, 1.0, 25.0, 25.0)))
  }

  test("Eval.theilsU: determination → 1, independence → 0") {
    // X fully determines Y
    val det = Seq(("s", "en"), ("s", "en"), ("t", "de")).toDF("src", "lg")
    val r1 = graft.operators.Eval.theilsU(det, "src", "lg").collect()(0)
    assert(r1.getLong(0) == 3L)
    assert(r1.getDouble(1) == 0.636514) // H(Y) = ln3 − (2ln2)/3
    assert(r1.getDouble(2) == 0.0 && r1.getDouble(4) == 1.0)
    // perfect independence (uniform 2×2): MI floors to 0 (and the
    // −0.0 ulp-noise case folds to +0.0)
    val ind = Seq(("s", "en"), ("s", "de"), ("t", "en"), ("t", "de"))
      .toDF("src", "lg")
    val r2 = graft.operators.Eval.theilsU(ind, "src", "lg").collect()(0)
    // mi lands exactly on 0 at the grid; u can keep one grid step of
    // quantization residue (per-group ln terms round before the sums)
    assert(r2.getDouble(3) == 0.0 && math.abs(r2.getDouble(4)) <= 1e-6)
    assert(1d / r2.getDouble(3) > 0, "mi must be +0.0, not -0.0")
  }

  test("Multimodal.decodeImage: real PNG decode, corrupt bytes → None") {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, hist)) = Multimodal.decodeImage(4)(bos.toByteArray)
    assert(w == 2 && h == 2)
    assert(hist.toSeq == Seq(0.5, 0.0, 0.0, 0.5))
    assert(Multimodal.decodeImage(4)(Array[Byte](9, 9, 9)).isEmpty)
    assert(Multimodal.decodeImage(4)(null).isEmpty)
  }

  test("Multimodal.imageAHash: hand-computed bit patterns") {
    def png(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // half-black/half-white: each row packs 00001111 → 0x0F bytes
    val Some(half) = Multimodal.imageAHash(
      png((x, _) => if (x < 4) 0x000000 else 0xffffff))
    assert(half == 0x0F0F0F0F0F0F0F0FL)
    // flat image: no cell strictly above the mean → 0
    assert(Multimodal.imageAHash(png((_, _) => 0x808080)) == Some(0L))
    assert(Multimodal.imageAHash(Array[Byte](1)).isEmpty)
  }

  test("Multimodal.audioEnergyHash: alternating envelope → 0xAAAA…") {
    val alt = Seq.tabulate(64)(i => if (i % 2 == 0) 0.8 else 0.1)
    val Some(h) = Multimodal.audioEnergyHash(Multimodal.patternWav(alt))
    assert(h == 0xAAAAAAAAAAAAAAAAL)
    // silencing the first loud window flips exactly the MSB
    val Some(h3) = Multimodal.audioEnergyHash(
      Multimodal.patternWav(alt.updated(0, 0.1)))
    assert(java.lang.Long.bitCount(h ^ h3) == 1 && (h3 >>> 63) == 0L)
    assert(Multimodal.audioEnergyHash(Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.audioEnergyHash(null).isEmpty)
  }

  test("Privacy.kAnonymityAudit: hand-computed class-size histogram") {
    // classes: (a,1)×3 rows, (a,2)×1, (b,1)×1 → sizes {3:1, 1:2}
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1))
      .toDF("g", "v")
    val got = Privacy.kAnonymityAudit(df, Seq(col("g"), col("v")), k = 2)
      .orderBy("class_size").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("class_size") == 1 &&
      got(0).getAs[Long]("n_classes") == 2 &&
      got(0).getAs[Long]("n_rows") == 2 &&
      got(0).getAs[Boolean]("violating") &&
      got(0).getAs[Double]("row_share") == 0.4)
    assert(got(1).getAs[Long]("class_size") == 3 &&
      !got(1).getAs[Boolean]("violating") &&
      got(1).getAs[Double]("row_share") == 0.6)
  }

  test("Privacy.dpNoisyCounts: deterministic, integer noise, n preserved") {
    val df = (1 to 100).map(i => s"g${i % 7}").toDF("g")
    val a = Privacy.dpNoisyCounts(df, "g", epsilon = 0.5)
      .orderBy("g").collect()
    val b = Privacy.dpNoisyCounts(df, "g", epsilon = 0.5)
      .orderBy("g").collect()
    assert(a.toSeq == b.toSeq) // md5-seeded: replayable
    a.foreach { r =>
      assert(r.getAs[Long]("noisy_n") ==
        r.getAs[Long]("n") + r.getAs[Long]("noise"))
    }
    // ε controls spread: tighter ε=5 noise is no larger in magnitude
    // on every group than... (not a per-draw guarantee); instead check
    // the mechanism centers: across 7 groups, |noise| stays small at ε=5
    val tight = Privacy.dpNoisyCounts(df, "g", epsilon = 5.0).collect()
    assert(tight.forall(r => math.abs(r.getAs[Long]("noise")) <= 2))
  }

  test("Multimodal.decodeAudio: real WAV decode, corrupt bytes → None") {
    val wav = Multimodal.sineWav(440, 500, 8000f, 1, 0.5)
    val Some((sr, ch, ms, rms, peak)) = Multimodal.decodeAudio(wav)
    assert(sr == 8000.0 && ch == 1 && ms == 500L)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms $rms")
    assert(math.abs(peak - 0.5) < 1e-3, s"peak $peak")
    // stereo carries both channels; silence has zero energy
    val Some((sr2, ch2, ms2, _, _)) = Multimodal.decodeAudio(
      Multimodal.sineWav(1000, 125, 16000f, 2, 0.25))
    assert(sr2 == 16000.0 && ch2 == 2 && ms2 == 125L)
    val Some((_, _, _, rms0, peak0)) = Multimodal.decodeAudio(
      Multimodal.sineWav(440, 100, 8000f, 1, 0.0))
    assert(rms0 == 0.0 && peak0 == 0.0)
    assert(Multimodal.decodeAudio(Array[Byte](9, 9, 9)).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
  }

  test("MjpegAvi: encode→decode round-trip, randomized gray frames") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(6)
      val w = 8 * (1 + rnd.nextInt(3))
      val h = 8 * (1 + rnd.nextInt(3))
      val fps = 1 + rnd.nextInt(60)
      val greys = Seq.fill(n)(rnd.nextInt(256))
      val frames = greys.map(g =>
        MjpegAvi.jpegFrame(w, h, (_, _) => (g << 16) | (g << 8) | g))
      val m = MjpegAvi.decode(MjpegAvi.encode(frames, w, h, fps)).get
      assert(m.width == w && m.height == h && m.nFrames == n)
      assert(m.durationMs == n * (1000000L / fps) / 1000)
      assert(math.abs(m.fps - 1e6 / (1000000L / fps)) < 1e-9)
      // JPEG is lossy but solid frames stay within a hair of ideal
      (m.meanLuma zip greys).foreach { case (l, g) =>
        assert(math.abs(l - g / 255.0) < 0.02, s"luma $l vs gray $g") }
    }
    // corrupt/degenerate payloads degrade to None, never throw
    assert(MjpegAvi.decode(null).isEmpty)
    assert(MjpegAvi.decode(Array.empty[Byte]).isEmpty)
    assert(MjpegAvi.decode(Array.fill(64)(0x41.toByte)).isEmpty)
    val full = MjpegAvi.encode(
      Seq(MjpegAvi.jpegFrame(8, 8, (_, _) => 0xffffff)), 8, 8, 5)
    assert(MjpegAvi.decode(full.take(full.length / 2)).isEmpty)
  }

  test("Dedup.clearCaches releases signature caches after consumption") {
    val docs = (1 to 60).map(i => (i.toLong, s"some text body number ${i % 20} with words"))
      .toDF("id", "text")
    Dedup.clearCaches() // drain anything left by other tests
    Dedup.minHashLsh(docs, "text", "id").count()
    Dedup.ngramJaccardPairs(docs.withColumn("b", lit(1)), "text", "id", Seq("b")).count()
    // exactly the two signature caches were registered and released
    // (global getPersistentRDDs is racy across parallel suites)
    assert(Dedup.clearCaches() == 2)
    assert(Dedup.clearCaches() == 0)
  }

  test("Percentiles.exact ≡ built-in percentile() (randomized groups)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map { i =>
      (s"g${i % 7}", rnd.nextInt(100000) / 10.0)
    } ++ Seq(("solo", 42.0)) // single-element group
    val df = rows.toDF("k", "v")
    val got = Percentiles.exact(df, Seq("k"), "v",
        Seq(0.5 -> "p50", 0.9 -> "p90", 0.0 -> "p0", 1.0 -> "p100"))
      .orderBy("k")
      .select("k", "p50", "p90", "p0", "p100")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    val want = df.groupBy("k").agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.0)").as("p0"),
        expr("percentile(v, 1.0)").as("p100"))
      .orderBy("k")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._2 - w._2) < 1e-9 && math.abs(g._3 - w._3) < 1e-9 &&
        g._4 == w._4 && g._5 == w._5, s"$g != $w")
    }
  }

  test("Percentiles.exact ignores nulls; all-null group omitted") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("k", "v")
    val r = Percentiles.exact(df, Seq("k"), "v", Seq(0.5 -> "p50"))
      .as[(String, Double, Long)].collect().toSeq
    assert(r == Seq(("a", 2.0, 2L)))
  }

  test("Percentiles.exact dispatches a high-cardinality key to the window plan") {
    // force the guard with a tiny stats budget: 500 groups of ≤4 rows
    // must take the hash-partitioned window path (no driver offset
    // collect), and the answers must be bit-identical to the built-in
    val confKey = "spark.graft.percentiles.maxDriverStats"
    spark.conf.set(confKey, "50")
    try {
      val df = (1 to 2000).map(i => (s"g${i % 500}", (i * 37 % 1000) / 4.0))
        .toDF("k", "v")
      val got = Percentiles.exact(df, Seq("k"), "v",
          Seq(0.5 -> "p50", 0.9 -> "p90"))
        .orderBy("k").select("k", "p50", "p90")
        .as[(String, Double, Double)].collect().toSeq
      val want = df.groupBy("k").agg(
          expr("percentile(v, 0.5)").as("p50"),
          expr("percentile(v, 0.9)").as("p90"))
        .orderBy("k").as[(String, Double, Double)].collect().toSeq
      assert(got.size == 500 && got.map(_._1) == want.map(_._1))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g._2 - w._2) < 1e-9 && math.abs(g._3 - w._3) < 1e-9,
          s"$g != $w")
      }
      // and the dispatched rank plan really is window-shaped: a Window
      // node present, no stats collect (can't observe directly — but the
      // plan string must show the per-group window)
      val ranked = Percentiles.globalSortRanks(df, Seq("k"), "v")
      assert(ranked.queryExecution.executedPlan.toString.contains("Window"),
        "expected the window-plan dispatch above maxDriverStats")
    } finally {
      spark.conf.unset(confKey)
      Percentiles.clearCaches()
    }
  }

  test("Percentiles.approxWithBounds: sketch honors its rank contract") {
    val rnd = new scala.util.Random(29)
    val df = (1 to 30000).map(i => (s"g${i % 3}", rnd.nextGaussian() * 100))
      .toDF("k", "v")
    val r = Percentiles.approxWithBounds(df, Seq("k"), "v",
        Seq(0.5 -> "p50", 0.99 -> "p99"), accuracy = 1000)
      .select("p50_ok", "p99_ok").as[(Boolean, Boolean)].collect()
    assert(r.nonEmpty && r.forall(t => t._1 && t._2))
  }

  test("Percentiles.globalSortRanks: one giant group spans partitions, ranks exact") {
    val n = 40000
    val df = (1 to n).map(i => ("giant", (n - i).toDouble))
      .toDF("k", "v").repartition(8)
    val ranked = Percentiles.globalSortRanks(df, Seq("k"), "v")
    // the whole point: a single group must NOT serialize onto one task
    assert(ranked.rdd.getNumPartitions > 1,
      s"single group pinned to ${ranked.rdd.getNumPartitions} partition(s)")
    val rows = ranked.select("_v", "_rn", "_n").as[(Double, Long, Long)]
      .collect().sortBy(_._2)
    assert(rows.length == n)
    // ranks are the exact 1..n order statistics of the sorted values
    assert(rows.map(_._2).toSeq == (1L to n.toLong))
    assert(rows.map(_._1).toSeq == (0 until n).map(_.toDouble))
    assert(rows.forall(_._3 == n.toLong))
    assert(Percentiles.clearCaches() >= 1)
  }

  test("Percentiles.approxWithBounds keeps NULL-key and all-null groups") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
      (None, Some(5.0)), (None, Some(7.0)), // NULL group key
      (Some("b"), None)) // group with only null values
      .toDF("k", "v")
    val r = Percentiles.approxWithBounds(df, Seq("k"), "v", Seq(0.5 -> "p50"))
      .select("k", "p50", "p50_ok", "n_values")
      .as[(Option[String], Option[Double], Option[Boolean], Long)]
      .collect().sortBy(_._1)
    // plain percentile_approx emits all three groups; so must we
    assert(r.length == 3)
    val byKey = r.map(t => t._1 -> t).toMap
    assert(byKey(None)._3.contains(true) && byKey(None)._4 == 2L)
    assert(byKey(Some("a"))._3.contains(true) && byKey(Some("a"))._4 == 2L)
    // all-null group: NULL sketch, NULL ok-flag, 0 values — present, not dropped
    assert(byKey(Some("b"))._2.isEmpty && byKey(Some("b"))._3.isEmpty &&
      byKey(Some("b"))._4 == 0L)
  }

  test("RangeJoin.overlap ≡ naive theta join (randomized intervals)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, if (rnd.nextBoolean()) "k1" else "k2", s, s + rnd.nextInt(500))
    }.toDF("lid", "k", "ls", "le")
    val right = (1 to 80).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, if (rnd.nextBoolean()) "k1" else "k2", s, s + rnd.nextInt(2000))
    }.toDF("rid", "k", "rs", "re")

    val got = RangeJoin.overlap(left, right, Seq("k"), "ls", "le", "rs", "re", 256L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val naive = left.as("a").join(right.as("b"),
        $"a.k" === $"b.k" && $"a.ls" <= $"b.re" && $"a.le" >= $"b.rs")
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive && got.nonEmpty)
  }

  test("asofJoin: latest right row at-or-before each left ts, tolerance bound") {
    val left = Seq((1L, 100L, "a"), (1L, 205L, "b"), (2L, 50L, "c"), (3L, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 200L, 20.0), (2L, 60L, 6.0))
      .toDF("k", "ts", "v")
    val out = Events.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("tag", "asof_ts", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("a", Some(100L), Some(10.0)), // equal ts matches (<= semantics)
      ("b", Some(200L), Some(20.0)),
      ("c", None, None),             // right row is later than left
      ("d", None, None)))            // no right rows for key

    val bounded = Events.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
        toleranceNs = 4L)
      .select("tag", "asof_v").as[(String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(bounded == Seq(
      ("a", Some(10.0)), ("b", None), ("c", None), ("d", None)))
  }

  test("sessionize: gap starts new session") {
    val df = Seq((1L, 0L), (1L, 10L), (1L, 1000L), (1L, 1005L), (2L, 5L))
      .toDF("user_id", "ts")
    val out = Events.sessionize(df, "user_id", "ts", gapNs = 100L)
      .select("user_id", "ts", "session_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 1000L, 2L), (1L, 1005L, 2L), (2L, 5L, 1L)))
  }

  test("Events.funnel: ordered stages, strict progression, horizon bound") {
    // u1 completes all three; u2 reaches click (the click BEFORE its
    // view must not count); u3's purchase precedes its view; u4 never
    // views; u5's click lands beyond the horizon of its first view
    val df = Seq(
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
      (2L, 5L, "click", 4L), (2L, 10L, "view", 5L), (2L, 15L, "click", 6L),
      (3L, 5L, "purchase", 7L), (3L, 10L, "view", 8L),
      (4L, 50L, "purchase", 9L),
      (5L, 0L, "view", 10L), (5L, 200L, "click", 11L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Events.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonNs = 100L)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "view", 4L, 1.0), (2, "click", 2L, 0.5), (3, "purchase", 1L, 0.25)))
  }

  test("Events.cohortRetention: epoch-aligned cohorts, distinct users per cell") {
    // period 100: u1 (first 50 → cohort 0) active in periods 0,1,2 with
    // a duplicate in period 1; u2 (first 150 → cohort 100) in 0 and 2;
    // u3 (first 60 → cohort 0) only in its first period
    val df = Seq(
      (1L, 50L), (1L, 120L), (1L, 130L), (1L, 250L),
      (2L, 150L), (2L, 350L),
      (3L, 60L))
      .toDF("user_id", "ts")
    val out = Events.cohortRetention(df, "user_id", "ts", periodNs = 100L)
      .orderBy("cohort_start_ns", "period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (100L, 0L, 1L), (100L, 2L, 1L)))
  }

  test("Events.transitions: per-user consecutive pairs, tie-broken, row-conditional probs") {
    // u1: a→b→a→c; u2: a→b; u3: equal-ts pair ordered by event_id → a→b
    val df = Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), (1L, 3L, "a", 3L), (1L, 4L, "c", 4L),
      (2L, 5L, "a", 5L), (2L, 6L, "b", 6L),
      (3L, 5L, "a", 6L), (3L, 5L, "b", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Events.transitions(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 3L, 0.75), ("a", "c", 1L, 0.25), ("b", "a", 1L, 1.0)))
  }

  test("Profile.profile: one job, typed extrema, nulls counted") {
    val df = Seq((1L, Some(2.5), Some("b")), (2L, None, Some("a")),
      (3L, Some(1.5), None), (3L, Some(2.5), Some("a")))
      .toDF("id", "v", "s")
    val p = operators.Profile.profile(df, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4 && p("id").getLong(2) == 0 &&
      p("id").getLong(3) == 3 && p("id").getDouble(4) == 1.0 &&
      p("id").getDouble(5) == 3.0)
    assert(p("v").getLong(2) == 1 && p("v").getLong(3) == 2 &&
      p("v").getDouble(4) == 1.5 && p("v").getDouble(5) == 2.5)
    assert(p("s").getLong(2) == 1 && p("s").getString(6) == "a" &&
      p("s").getString(7) == "b")
    // approx mode still emits every column with plausible cardinalities
    val ap = operators.Profile.profile(df, Seq("id", "v", "s"),
      approxDistinct = true).collect()
    assert(ap.length == 3 && ap.forall(_.getLong(3) > 0))
  }

  test("TextAnalysis.tfIdf: hand-computed scores, deterministic ranks") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("id", "text")
    val r = operators.TextAnalysis.tfIdf(docs, "text", "id", topK = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._6)).toMap
    def s(tf: Int, df: Int) = math.rint(tf * math.log(3.0 / df) * 1e6) / 1e6
    // doc 1: apple tf=2 df=1 → 2ln3; banana tf=1 df=2 → ln1.5
    assert(r((1L, 1)) == ("apple", s(2, 1)))
    assert(r((1L, 2)) == ("banana", s(1, 2)))
    // doc 3: cherry tf=2 df=2; date tf=1 df=1 — ln3 > 2ln1.5
    assert(r((3L, 1)) == ("date", s(1, 1)))
    assert(r((3L, 2)) == ("cherry", s(2, 2)))
    // doc 2: banana/cherry tie (tf=1, df=2) → term order breaks it
    assert(r((2L, 1))._1 == "banana" && r((2L, 2))._1 == "cherry")
  }

  test("TextAnalysis.splitAssign: stable, complete, roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val split = operators.TextAnalysis.splitAssign(col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = df.withColumn("s", split).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1400 && counts("val") > 100 && counts("test") > 100)
    assert(counts.values.sum == 2000)
    // same ids → same assignment on re-evaluation (pure function of id)
    val again = df.withColumn("s", split).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("Graph.connectedComponents ≡ union-find on random graphs") {
    val rnd = new scala.util.Random(41)
    val nV = 300
    val edges = (1 to 350).map(_ => (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
    val got = operators.Graph.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

    // reference union-find
    val parent = Array.tabulate(nV)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min member id per component, for vertices that touch an edge
    val touched = edges.flatMap(e => Seq(e._1, e._2)).filter(e => edges.exists(x =>
      (x._1 == e || x._2 == e) && x._1 != x._2)).distinct
    val byRoot = touched.groupBy(v => find(v.toInt))
      .flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }
    assert(got == byRoot, s"${got.size} vs ${byRoot.size} labeled vertices")
  }

  test("Graph.connectedComponents converges in O(log n) on a chain graph") {
    // a 400-vertex path has diameter 399: min-label propagation needs
    // ~400 rounds and would blow a maxIter of 20; large-star/small-star
    // contraction must finish well inside it (O(log n) ≈ 9 rounds)
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("a", "b")
    val got = operators.Graph.connectedComponents(chain, "a", "b",
        maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 400)
    assert(got.values.forall(_ == 0L), "chain must collapse to root 0")
  }

  test("Graph.componentsWithSingletons labels isolated vertices with self") {
    val vertices = (1L to 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val got = operators.Graph.componentsWithSingletons(
        vertices, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 7L, 10L -> 10L))
  }

  test("Dedup.nearDedup drops transitive near-dups, keeps min id + distinct docs") {
    // A≈B (J=.58) and B≈C (J=.58) but A-C overlap (J=.31) is BELOW the
    // verify threshold: C can only drop through the transitive cluster
    // — pairwise-only filtering would keep it
    val base = (1 to 40).map(w => s"w$w").mkString(" ")
    val mid = (11 to 50).map(w => s"w$w").mkString(" ")
    val far = (21 to 60).map(w => s"w$w").mkString(" ")
    val unique = "completely different content about penguins and glaciers " +
      "nothing shared with the chain at all"
    val docs = Seq((1L, base), (2L, mid), (3L, far), (4L, unique)).toDF("id", "text")
    // 16 bands × 1 row surfaces all three candidate pairs (verified:
    // A-B .58, B-C .58 pass; A-C .31 fails the .4 threshold); the md5
    // family is deterministic, so this outcome is fixed, not flaky
    val kept = Dedup.nearDedup(docs, "text", "id",
        numHashes = 16, bands = 16, threshold = 0.4)
      .select("id").as[Long].collect().sorted.toSeq
    Dedup.clearCaches()
    assert(kept == Seq(1L, 4L), s"kept $kept")
  }

  test("Dedup keep-best: highest score survives, min-id tiebreak, keepers consistent") {
    // same transitive chain as the nearDedup spec (A≈B≈C, A-C below
    // threshold) plus an unrelated doc; scores pick doc 3 — the keep
    // rule must beat keep-min-id, and the cluster label stays min id
    val base = (1 to 40).map(w => s"w$w").mkString(" ")
    val mid = (11 to 50).map(w => s"w$w").mkString(" ")
    val far = (21 to 60).map(w => s"w$w").mkString(" ")
    val unique = "completely different content about penguins and glaciers " +
      "nothing shared with the chain at all"
    val docs = Seq((1L, base, 10L), (2L, mid, 25L), (3L, far, 25L),
      (4L, unique, 99L)).toDF("id", "text", "score")
    val keepers = Dedup.nearDupClusterKeepers(docs, "text", "id", "score",
        numHashes = 16, bands = 16, threshold = 0.4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    Dedup.clearCaches()
    // one cluster {1,2,3}: max score 25 is tied between 2 and 3 → min id 2
    assert(keepers == Seq((1L, 2L, 25L, 3L)), s"keepers $keepers")
    val kept = Dedup.nearDedupKeepBest(docs, "text", "id", "score",
        numHashes = 16, bands = 16, threshold = 0.4)
      .select("id").as[Long].collect().sorted.toSeq
    Dedup.clearCaches()
    assert(kept == Seq(2L, 4L), s"kept $kept")
  }

  test("Dedup.contrastivePairs labels the sub-threshold collision hard_negative") {
    // the nearDedup chain: A-B and B-C verify (J=.58), A-C collides in
    // a band but fails the .4 threshold → exactly the hard negative
    val base = (1 to 40).map(w => s"w$w").mkString(" ")
    val mid = (11 to 50).map(w => s"w$w").mkString(" ")
    val far = (21 to 60).map(w => s"w$w").mkString(" ")
    val docs = Seq((1L, base), (2L, mid), (3L, far)).toDF("id", "text")
    val got = Dedup.contrastivePairs(docs, "text", "id",
        numHashes = 16, bands = 16, threshold = 0.4)
      .select("id_a", "id_b", "label").as[(Long, Long, String)]
      .collect().sortBy(p => (p._1, p._2)).toSeq
    Dedup.clearCaches()
    assert(got == Seq((1L, 2L, "positive"), (1L, 3L, "hard_negative"),
      (2L, 3L, "positive")), s"got $got")
  }

  test("TextAnalysis.classTfidf: discriminative terms rank above shared ones") {
    // "spark" appears only in class a, "flink" only in b, "the" in
    // both — ctfidf must rank the exclusive term first per class
    val docs = Seq(
      ("a", "the spark engine"), ("a", "the spark planner"),
      ("b", "the flink engine"), ("b", "the flink runtime"))
      .toDF("source", "text")
    val got = TextAnalysis.classTfidf(docs, "text", "source", k = 1)
      .select("source", "term", "tf").as[(String, String, Long)]
      .collect().sortBy(_._1).toSeq
    Dedup.clearCaches()
    assert(got == Seq(("a", "spark", 2L), ("b", "flink", 2L)), s"got $got")
    // hand-check one value: tf=2, f_t=2, A = 12 tokens / 2 classes = 6
    val full = TextAnalysis.classTfidf(docs, "text", "source", k = 10)
      .where(col("term") === "spark").select("ctfidf").as[Double].head()
    Dedup.clearCaches()
    assert(math.abs(full - 2 * math.log(1 + 6.0 / 2)) < 1e-6, s"got $full")
  }

  test("Dedup.duplicateSpans: keep-first, overlapping grams merge, intra-doc repeats exempt") {
    val w12 = (1 to 12).map("w" + _).mkString(" ")
    val docs = Seq(
      (0L, w12),                                            // first owner: never flagged
      (1L, "u1 u2 " + (1 to 9).map("w" + _).mkString(" ") + " u3"), // 9-token run → 2 overlapping grams, 1 island
      (2L, (1 to 10).map("x" + _).mkString(" ")),           // unique: absent
      (3L, w12),                                            // whole-doc dup: one span = all 12 tokens
      (4L, (1 to 8).map("w" + _).mkString(" ") + " " +      // two disjoint copies → 2 islands
        (1 to 5).map("y" + _).mkString(" ") + " " +
        (1 to 8).map("w" + _).mkString(" ")),
      (5L, (1 to 8).map("z" + _).mkString(" ") + " " +      // intra-doc repeat only: absent
        (1 to 8).map("z" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "text", "doc_id", n = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "dup_tokens", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 9L, 12L), (3L, 1L, 12L, 12L), (4L, 2L, 16L, 21L)),
      s"got $got")
  }

  test("TextAnalysis.sequencePack: bucket-local concat-and-chunk, straddling docs count twice") {
    def words(k: Int): String = (1 to k).map("w" + _).mkString(" ")
    // bucket 0: docs of 6 + 8 tokens = 14 ⇒ seq0 full (10), seq1 tail (4);
    // doc 1 straddles the cut so it contributes to BOTH sequences.
    // bucket 1: one 25-token doc ⇒ 10 + 10 + 5.
    val docs = Seq((0L, words(6)), (1L, words(8)), (2L, words(25)))
      .toDF("doc_id", "text")
    val got = TextAnalysis.sequencePack(docs, "text", "doc_id",
        seqLen = 10, bucketDocs = 2)
      .orderBy("bucket", "seq")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 2L, 10L), (0L, 1L, 1L, 4L),
      (1L, 0L, 1L, 10L), (1L, 1L, 1L, 10L), (1L, 2L, 1L, 5L)), s"got $got")
  }

  test("Dedup.duplicateSpans matches a brute-force reference on random corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d") // 4^4 grams ⇒ collisions guaranteed
    val n = 4
    for (_ <- 1 to 3) {
      val docs = (0L until 12L).map { id =>
        val len = 5 + rnd.nextInt(20)
        (id, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
      }
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val firstOwner = scala.collection.mutable.Map[Seq[String], Long]()
      for ((id, ts) <- toks.toSeq.sortBy(_._1); i <- 0 to ts.size - n) {
        val g = ts.slice(i, i + n)
        if (!firstOwner.contains(g)) firstOwner(g) = id
      }
      val expected = toks.toSeq.sortBy(_._1).flatMap { case (id, ts) =>
        val ps = (0 to ts.size - n).filter(i => firstOwner(ts.slice(i, i + n)) < id)
        if (ps.isEmpty) None
        else {
          var spans = List.empty[(Int, Int)]
          for (p <- ps) spans = spans match {
            case (s, e) :: rest if p <= e => (s, math.max(e, p + n - 1)) :: rest
            case _ => (p, p + n - 1) :: spans
          }
          val dupTokens = spans.map { case (s, e) => e - s + 1 }.sum
          Some((id, spans.size.toLong, dupTokens.toLong, ts.size.toLong))
        }
      }
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id", n = n)
        .orderBy("doc_id")
        .select("doc_id", "n_spans", "dup_tokens", "n_tokens")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == expected, s"got $got\nexpected $expected")
    }
  }

  test("Mixture.sampleToTokenBudget: bucketed decomposition equals the naive per-group prefix") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0 until 300).map { i =>
      (i.toLong, s"g${i % 3}", ("tok " * (i % 17 + 1)).trim)
    }.toDF("doc_id", "source", "text")
    val budget = 200L
    val kept = Mixture.sampleToTokenBudget(docs, "text", "doc_id", "source", budget)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // naive: one window per group (fine at spec scale)
    val w = Window.partitionBy("source")
      .orderBy(graft.functions.md5Long(col("doc_id")), col("doc_id"))
    val expected = docs
      .withColumn("start_cum",
        sum(size(graft.functions.tokens(col("text"))).cast("long")).over(w)
          - size(graft.functions.tokens(col("text"))).cast("long"))
      .where(col("start_cum") < budget)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == expected, s"bucketed ${kept.size} vs naive ${expected.size}")
    assert(kept.nonEmpty && kept.size < 300) // budget actually binds
  }

  test("Mixture.importanceWeights matches a hand-rolled model; target-like docs score higher") {
    // raw docs 0-3 are made of "cat"/"dog" grams, 4-7 of "xyz" grams;
    // the target corpus speaks cat/dog — the DSIR ratio must separate
    // them, and the values must equal a plain-Scala reimplementation
    val raw = Seq(
      (0L, "cat dog cat"), (1L, "dog cat dog dog"),
      (2L, "cat cat"), (3L, "dog dog cat"),
      (4L, "xyz qqq xyz"), (5L, "qqq xyz qqq qqq"),
      (6L, "xyz xyz"), (7L, "qqq qqq xyz")).toDF("doc_id", "text")
    val target = Seq("cat dog", "dog dog cat cat", "cat dog cat")
      .toDF("text")
    val B = 16
    val got = Mixture.importanceWeights(raw, target, "text", "doc_id", B)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    def toks(s: String) = s.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def grams(s: String) = { val t = toks(s); t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    def h(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % B
    }
    val tgtC = Seq("cat dog", "dog dog cat cat", "cat dog cat")
      .flatMap(grams).groupBy(h).view.mapValues(_.size.toLong).toMap
    val rawDocs = Seq(0L -> "cat dog cat", 1L -> "dog cat dog dog",
      2L -> "cat cat", 3L -> "dog dog cat", 4L -> "xyz qqq xyz",
      5L -> "qqq xyz qqq qqq", 6L -> "xyz xyz", 7L -> "qqq qqq xyz")
    val rawC = rawDocs.flatMap(d => grams(d._2)).groupBy(h)
      .view.mapValues(_.size.toLong).toMap
    val nt = tgtC.values.sum.toDouble; val nr = rawC.values.sum.toDouble
    def lr(f: Long) = math.log((tgtC.getOrElse(f, 0L) + 1) / (nt + B)) -
      math.log((rawC.getOrElse(f, 0L) + 1) / (nr + B))
    rawDocs.foreach { case (id, text) =>
      val fs = grams(text).map(h)
      val exp = fs.groupBy(identity).map { case (f, g) => g.size * lr(f) }.sum
      assert(math.abs(got(id)._2 - exp) < 1e-9, s"doc $id: ${got(id)._2} vs $exp")
      assert(got(id)._1 == fs.size, s"doc $id n_feats")
    }
    val catDog = Seq(0L, 1L, 2L, 3L).map(got(_)._2).min
    val offDomain = Seq(4L, 5L, 6L, 7L).map(got(_)._2).max
    assert(catDog > offDomain, s"separation: $catDog vs $offDomain")
  }

  test("Similarity.rpKnn: projection preserves well-separated clusters; projection is linear") {
    // three tight orthogonal-ish clusters in 8-dim: JL to 4 dims keeps
    // them separated for THIS fixed md5 sign matrix (deterministic —
    // passes once ⇒ passes always), so every query's top-2 neighbors
    // are its own cluster mates
    def v(base: Int, eps: Float): Array[Float] = {
      val a = Array.fill(8)(0f); a(base) = 1f; a((base + 1) % 8) = eps; a
    }
    val rows = Seq(
      (0L, v(0, 0.01f)), (1L, v(0, 0.02f)), (2L, v(0, 0.03f)),
      (3L, v(3, 0.01f)), (4L, v(3, 0.02f)), (5L, v(3, 0.03f)),
      (6L, v(6, 0.01f)), (7L, v(6, 0.02f)), (8L, v(6, 0.03f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.rpKnn(rows, rows, "embedding", "vec_id",
        k = 2, dims = 8, outDims = 4)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val cluster = (id: Long) => id / 3
    (0L to 8L).foreach { q =>
      assert(got(q).forall(n => cluster(n) == cluster(q)),
        s"query $q got ${got(q)}")
    }
    // linearity: rp(a+b) = rp(a) + rp(b) (it's a fixed linear map)
    val a = Array.fill(8)(0.25f); val b = Array.tabulate(8)(_ * 0.1f)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val three = Seq((1L, a), (2L, b), (3L, ab)).toDF("id", "v")
      .select(col("id"), Similarity.randomProjection(col("v"), 8, 4).as("r"))
      .as[(Long, Seq[Double])].collect().toMap
    three(1).zip(three(2)).zip(three(3)).foreach { case ((ra, rb), rab) =>
      assert(math.abs(ra + rb - rab) < 1e-5, s"$ra + $rb != $rab")
    }
  }

  test("TextAnalysis.dedupSentences: keep-first, normalized keys, order preserved") {
    val docs = Seq(
      // dup via normalization ("Buy NOW!!" ≈ "buy now"), order kept
      (1L, "alpha beta. Buy NOW. gamma. buy;;now. alpha beta. delta"),
      (2L, "one two. one two. one two"),       // all same → 1 survivor
      (3L, "unique one. unique two")           // nothing to drop
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupSentences(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6, 4, "alpha beta. Buy NOW. gamma. delta"),
      (2L, 3, 1, "one two"),
      (3L, 2, 2, "unique one. unique two")), s"got $got")
  }

  test("Dedup.boilerplateScrub: cross-doc repeats scrubbed everywhere, short keys immune") {
    val docs = Seq(
      (1L, "hello world today. the weather is nice. unique one"),
      (2L, "Hello, WORLD today. something else entirely"), // dup via normalization
      (3L, "hello world today. third body text here"),
      (4L, "hello world today. fourth body line"),
      (5L, "short. tiny"),                  // both under minChars → never boilerplate
      (6L, "hello world today")             // fully scrubbed doc → empty text
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateScrub(docs, "text", "doc_id",
        minChars = 10, maxDocs = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, "the weather is nice. unique one"),
      (2L, 2L, 1L, "something else entirely"),
      (3L, 2L, 1L, "third body text here"),
      (4L, 2L, 1L, "fourth body line"),
      (5L, 2L, 2L, "short. tiny"),
      (6L, 1L, 0L, "")), s"got $got")
  }

  test("TextAnalysis.naiveBayes: learns source vocab, reassigns the off-label doc") {
    // label a is cat/fish, label b is dog/bird; doc 5 carries label b
    // but reads like a (cat-dominant) — the trained model must score it
    // into a despite its training label
    val docs = Seq(
      (1L, "a", "cat cat fish fish cat fish"),
      (2L, "a", "cat fish cat"),
      (3L, "b", "dog bird dog bird dog"),
      (4L, "b", "bird dog bird"),
      (5L, "b", "cat cat cat cat fish")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.naiveBayes(docs, "text", "doc_id", "source")
      .orderBy("doc_id")
      .select("doc_id", "pred_label").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "a")), s"got $got")
  }

  test("Similarity.sqKnn: int8 codes round half-away, integer dots rank exactly") {
    // S = 1 → codes: (127,0), (64,64) [0.5·127 = 63.5 rounds up],
    // (127,3) [0.02·127 = 2.54], (0,127); dots vs query 0:
    // id2 = 127·127 = 16129, id1 = 127·64 = 8128, id3 = 0
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.5f, 0.5f)),
      (2L, Array(1f, 0.02f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.sqKnn(emb, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", k = 3)
      .orderBy("rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 16129L, 1), (0L, 1L, 8128L, 2), (0L, 3L, 0L, 3)), s"got $got")
    // refine path re-ranks the shortlist by exact cosine — same order
    // here, with the cosine column carried
    val ref = Similarity.sqKnn(emb, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", k = 2, refine = 3)
      .orderBy("rank").select("neighbor_id", "rank")
      .as[(Long, Int)].collect().toSeq
    assert(ref == Seq((2L, 1), (1L, 2)), s"got $ref")
  }

  test("Mixture.weightedSample: A-ES keys match an independent md5 reimplementation") {
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ws:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      math.log(java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 60)) / w
    }
    val rows = Seq((1L, "g", 10.0), (2L, "g", 1.0), (3L, "g", 100.0),
      (4L, "g", 5.0), (5L, "g", 50.0), (6L, "h", 1.0), (7L, "g", 0.0))
    val expected = rows.filter(_._3 > 0).groupBy(_._2).flatMap { case (g, rs) =>
      rs.map(r => (g, r._1, key(r._1, r._3)))
        .sortBy { case (_, id, k) => (-k, id) }.take(2).zipWithIndex
        .map { case ((gr, id, k), i) => (gr, id, i + 1) }
    }.toSeq.sortBy(r => (r._1, r._3))
    val got = Mixture.weightedSample(
        rows.toDF("doc_id", "source", "w"), "source", "doc_id", "w", k = 2)
      .orderBy("source", "rank")
      .select("source", "doc_id", "rank").as[(String, Long, Int)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
    // zero-weight row 7 must never appear
    assert(!got.exists(_._2 == 7L))
  }

  test("Dedup.winnowingFingerprints matches a sequential reference winnower") {
    val k = 3; val w = 4
    def md5Long(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    // sequential reference: every valid window of w gram hashes (one
    // clipped window for short docs) selects all argmin positions
    def reference(text: String): Set[(Int, Long)] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val hs = toks.sliding(k).filter(_.length == k)
        .map(g => md5Long(g.mkString(" "))).toArray
      if (hs.isEmpty) Set.empty
      else {
        val starts = if (hs.length < w) Seq(0) else 0 to (hs.length - w)
        starts.flatMap { i =>
          val win = hs.slice(i, math.min(i + w, hs.length))
          val m = win.min
          win.zipWithIndex.collect { case (h, j) if h == m => (i + j, m) }
        }.toSet
      }
    }
    val docs = Seq(
      (1L, "a b c d e f g h i j a b c d e f"), // repeated run
      (2L, "z z z z z z z z"),                 // all-equal hashes (ties)
      (3L, "one two three"),                   // exactly one gram (n < w)
      (4L, "q w"),                             // shorter than k → no grams
      (5L, "m n o p q r s t u v w x y"))
    val got = Dedup.winnowingFingerprints(
        docs.toDF("doc_id", "text"), "text", "doc_id", k, w)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for ((id, text) <- docs) {
      val want = reference(text)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
    // density sanity: selected ≈ 2/(w+1) of grams on random-ish text
    val longDoc = (1 to 400).map(i => s"t${i * 7919 % 997}").mkString(" ")
    val sel = Dedup.winnowingFingerprints(
        Seq((9L, longDoc)).toDF("doc_id", "text"), "text", "doc_id", k, w)
      .count()
    val nGrams = 400 - k + 1
    assert(sel > nGrams / (w + 1) / 2 && sel < nGrams, s"density $sel/$nGrams")
  }

  test("Dedup.winnowingOverlap: shared-run guarantee and docfreq guard") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"intro text here $shared closing words one"),
      (2L, s"totally different opening $shared and another tail"),
      (3L, "no overlap with anything else at all whatsoever"))
    val out = Dedup.winnowingOverlap(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 3, w = 4, maxDocFreq = 20, minShared = 1)
      .as[(Long, Long, Long, Double)].collect()
    // winnowing guarantee: a shared run of w+k-1 = 6 tokens MUST yield
    // ≥1 shared fingerprint; docs 1,2 share 8 tokens
    val p = out.filter(r => r._1 == 1L && r._2 == 2L)
    assert(p.length == 1 && p.head._3 >= 1, s"got ${out.toSeq}")
    assert(!out.exists(r => r._1 == 3L || r._2 == 3L))
    // boilerplate guard: with a long identical body every selected
    // body fingerprint lands in ALL 6 docs, so maxDocFreq = 5 drops
    // them all; the doc-unique tail grams never match across docs
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val boiler = (1L to 6L).map(i => (i, s"$body unique$i"))
    val open = Dedup.winnowingOverlap(boiler.toDF("doc_id", "text"),
      "text", "doc_id", k = 3, w = 4, maxDocFreq = 20, minShared = 1)
    assert(open.count() > 0, "guard test is vacuous: no shared fingerprint")
    val guarded = Dedup.winnowingOverlap(boiler.toDF("doc_id", "text"),
      "text", "doc_id", k = 3, w = 4, maxDocFreq = 5, minShared = 1)
    assert(guarded.count() == 0)
    Dedup.clearCaches()
  }

  test("Graph.triangleCounts: clique vs star, matches brute force on a random graph") {
    // K4 clique (every node: deg 3, 3 triangles, clustering 1) + star
    // (center 10: deg 3, 0 triangles) + a dangling edge
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(edges, "id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    for (id <- 1L to 4L) assert(got(id) == (id, 3L, 3L, 1.0), s"got ${got(id)}")
    assert(got(10L) == (10L, 3L, 0L, 0.0))
    assert(got(11L) == (11L, 1L, 0L, 0.0))
    assert(got(20L) == (20L, 1L, 0L, 0.0))
    // brute-force parity on a deterministic pseudo-random graph
    // (duplicate + reversed edges exercise canonicalization)
    val rnd = (0 until 120).map { i =>
      val a = i * 7919 % 23; val b = (i * 104729 + 7) % 23
      (a.toLong, b.toLong)
    }.filter(e => e._1 != e._2)
    val undirected = rnd.map(e => (e._1 min e._2, e._1 max e._2)).distinct
    def adj(x: Long, y: Long) = undirected.contains((x min y, x max y))
    val ids = undirected.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val want = ids.map { v =>
      val nbrs = ids.filter(u => u != v && adj(u, v))
      val t = nbrs.combinations(2).count { case Seq(x, y) => adj(x, y) }
      v -> ((v, nbrs.size.toLong, t.toLong))
    }.toMap
    val got2 = Graph.triangleCounts(rnd.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect()
    assert(got2.length == want.size)
    got2.foreach { r =>
      assert(want(r._1) == ((r._1, r._2, r._3)), s"node ${r._1}: got $r")
    }
    Dedup.clearCaches()
  }

  test("Mixture.serpentineShards: snake deal matches hand computation, balance near 1") {
    // weights 8..1 into 3 shards: rounds deal 0,1,2 / 2,1,0 / 0,1
    val rows = (1L to 8L).map(i => (i, (9 - i).toInt)) // id 1 → weight 8 (rank 0)
    val got = Mixture.serpentineShards(rows.toDF("id", "w"), "id", "w", 3)
      .select("id", "rank", "shard").as[(Long, Long, Int)].collect()
      .sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq(0, 1, 2, 2, 1, 0, 0, 1), s"got ${got.toSeq}")
    assert(got.map(_._1).toSeq == (1L to 8L), "rank must follow weight desc")
    val manifest = Mixture.shardManifest(rows.toDF("id", "w"), "id", "w", 3)
      .orderBy("shard").as[(Int, Long, Long, Double)].collect().toSeq
    assert(manifest.map(m => (m._1, m._3)) == Seq((0, 13L), (1, 12L), (2, 11L)),
      s"got $manifest")
    // big skewed corpus: serpentine balance stays within 1%
    val skew = (1L to 5000L).map(i => (i, (i % 97 * i % 89 + 1).toInt))
    val bal = Mixture.shardManifest(skew.toDF("id", "w"), "id", "w", 16)
      .select("balance").as[Double].collect()
    assert(bal.forall(b => b > 0.99 && b < 1.01), s"got ${bal.toSeq}")
  }

  test("TextAnalysis.perplexityBuckets: equal-count tiers, rarest text lands in tail") {
    // 9 docs in one group: three share common words, three mixed, three rare
    val docs = (1L to 9L).map { i =>
      val text =
        if (i <= 3) "the the the and and of"            // common → low surprisal
        else if (i <= 6) s"the and rare$i word$i"       // mixed
        else s"zzz$i qqq$i xxx$i www$i"                 // unique → high
      (i, "s1", text)
    }
    val out = TextAnalysis.perplexityBuckets(
        docs.toDF("doc_id", "source", "text"), "text", "doc_id", "source", 3)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 3L).forall(out(_) == "head"), s"got $out")
    assert((7L to 9L).forall(out(_) == "tail"), s"got $out")
    assert((4L to 6L).forall(out(_) == "middle"), s"got $out")
    // equal-count contract: 3 per tier
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("head" -> 3, "middle" -> 3, "tail" -> 3))
  }

  test("Similarity.binaryKnn: sign packing, Hamming ranking, cosine rerank") {
    // 4-dim vectors: sign patterns chosen so codes/Hammings are hand-checkable
    val emb = Seq(
      (0L, Seq(1f, -1f, 1f, -1f)),   // code 0b0101 = 5
      (1L, Seq(1f, 1f, -1f, -1f)),   // code 0b0011 = 3, hamming to q=2
      (2L, Seq(1f, -1f, 1f, -1f)),   // identical signs to q, hamming 0
      (3L, Seq(-1f, 1f, -1f, 1f)))   // all bits flipped, hamming 4
      .toDF("vec_id", "embedding")
    val got = Similarity.binaryKnn(emb, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", k = 3, refine = 0)
      .select("query_id", "neighbor_id", "hamming", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(_._4)
    assert(got == Seq((0L, 2L, 0L, 1), (0L, 1L, 2L, 2), (0L, 3L, 4L, 3)),
      s"got $got")
    // refine path: exact cosine re-ranks the Hamming shortlist; vec 2
    // is parallel to the query (cos 1) and must stay rank 1
    val ref = Similarity.binaryKnn(emb, emb.filter(col("vec_id") === 0),
        "embedding", "vec_id", k = 2, refine = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(ref.head == (2L, 1), s"got $ref")
  }

  test("Sketches.quantileToleranceReport: hand-computed quantiles, contract holds") {
    val rows = (1 to 100).map(v => ("a", v)) ++ (1 to 10).map(v => ("b", v * 10))
    val out = Sketches.quantileToleranceReport(
        rows.toDF("g", "v"), "v", "g", probs = Seq(0.25, 0.5, 0.9),
        accuracy = 1000)
      .orderBy("g", "p")
      .as[(String, Double, Long, Double, Boolean)].collect().toSeq
    // linear interpolation at rank p·(n−1): a has 1..100 (n=100),
    // b has 10..100 step 10 (n=10)
    val expected = Seq(
      ("a", 0.25, 100L, 25.75, true), ("a", 0.5, 100L, 50.5, true),
      ("a", 0.9, 100L, 90.1, true),
      ("b", 0.25, 10L, 32.5, true), ("b", 0.5, 10L, 55.0, true),
      ("b", 0.9, 10L, 91.0, true))
    assert(out == expected, s"got $out")
  }

  test("Skyline.skyline2d: dominance with ties, duplicates survive, matches brute force") {
    val pts = Seq(
      (1L, 5, 5), (2L, 5, 5),   // exact duplicates — both survive
      (3L, 6, 1), (4L, 1, 6),
      (5L, 4, 4),               // dominated by (5,5)
      (6L, 5, 4),               // dominated at equal x by (5,5)
      (7L, 6, 0))               // dominated at equal x by (6,1)
      .toDF("id", "x", "y")
    val got = Skyline.skyline2d(pts, "x", "y", "id", nBuckets = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), s"got $got")

    // tie-heavy deterministic grid vs the quadratic definition
    val many = (1 to 120).map(i => (i.toLong, i * 7 % 13, i * 11 % 17))
    val df = many.toDF("id", "x", "y")
    val expected = many.filter { case (_, px, py) =>
      !many.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.map(_._1).sorted
    val got2 = Skyline.skyline2d(df, "x", "y", "id", nBuckets = 8)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got2 == expected, s"got $got2 expected $expected")
  }

  test("Similarity.centroidOutliers flags the planted off-distribution vector first") {
    val rows = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),
      (3L, Array(0f, 1f), 0), // planted outlier in label 0
      (4L, Array(0f, 1f), 1), (5L, Array(0f, 1f), 1), (6L, Array(1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidOutliers(rows, "embedding", "vec_id", "label", k = 1)
      .orderBy("label")
      .select("label", "vec_id").as[(Int, Long)].collect().toSeq
    assert(got == Seq((0, 3L), (1, 6L)), s"got $got")
  }

  test("Dedup.exact keeps min id per duplicate text") {
    val docs = Seq(
      (1L, "Hello World"), (2L, "hello,  world!"), (3L, "unique doc"),
      (4L, "HELLO WORLD"))
      .toDF("doc_id", "text")
    val kept = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L)) // 2,4 are normalized dups of 1
    val groups = Dedup.exactDupGroups(docs, "text", "doc_id")
    assert(groups.count() == 1)
    assert(groups.select("n_dups").as[Long].head == 3)
  }

  test("minHashLsh finds a planted near-duplicate and skips distinct docs") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("simHashNearPairs: near-dup within hamming ball, far docs out") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base + " extra"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.simHashNearPairs(docs, "text", "doc_id", bits = 24, maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("bruteForceKnn: exact ranks with deterministic tie-break") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)), (4L, Seq(1.0, 0.01)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 1),
        "embedding", "vec_id", k = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, 4L), (2, 2L)))
  }

  test("ivfKnn: scores exact, subset of corpus, decent recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 10)
    val k = 5
    val ivf = operators.Similarity.ivfKnn(emb, queries, "embedding", "vec_id",
        k, nLists = 8, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect()
    val brute = operators.Similarity.bruteForceKnn(emb, queries, "embedding",
        "vec_id", k)
      .as[(Long, Long, Double, Int)].collect()
    // cosines must be EXACT (same kernel) wherever ivf found a pair
    val bruteScore = brute.map(t => (t._1, t._2) -> t._3).toMap
    val all = operators.Similarity.bruteForceKnn(emb, queries, "embedding",
        "vec_id", 1000).as[(Long, Long, Double, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    ivf.foreach { t =>
      assert(math.abs(all((t._1, t._2)) - t._3) < 1e-12, s"score drift at $t")
    }
    // per-query results are ranked and at most k
    assert(ivf.groupBy(_._1).values.forall(g =>
      g.length <= k && g.map(_._4).sorted.toSeq == (1 to g.length)))
    // recall@5 against exact top-5: probing 3 of 8 lists must find a
    // solid majority (generous margin over tie/float jitter)
    val hit = ivf.count(t => bruteScore.contains((t._1, t._2)))
    val recall = hit.toDouble / brute.length
    assert(recall >= 0.5, s"recall@5 = $recall")
  }

  test("lshKnn results are a subset of brute-force candidates with same scores") {
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 50L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() - 0.5))).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" <= 3)
    val brute = Similarity.bruteForceKnn(vecs, queries, "embedding", "vec_id", 50)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val lsh = Similarity.lshKnn(vecs, queries, "embedding", "vec_id", 5,
        planes = 4, tables = 2)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, n, c) =>
      assert(math.abs(brute((q, n)) - c) < 1e-12)
    }
  }

  test("multimodal: byteStats + stub features shape") {
    val docs = Seq((1L, "abcdefgh"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text")
    assert(media.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    val stats = Multimodal.byteStats(media)
      .select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(stats == Map(1L -> 8L, 2L -> 0L))
    val feats = Multimodal.extractFeatures(media, dim = 4)
      .select("media_id", "features").as[(Long, Seq[Double])].collect().toMap
    assert(feats(1L).size == 4)
    assert(feats(1L).head == 'a'.toInt / 255.0)
    assert(feats(2L) == Seq(0d, 0d, 0d, 0d))
  }

  test("frameSamplePlan explodes deterministic frame times") {
    val media = Multimodal.asMedia(
      Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", "video")
      .withColumn("duration_ms", lit(250L))
    val frames = Multimodal.frameSamplePlan(media, everyMs = 100L)
      .select("frame_ms").as[Long].collect().sorted.toSeq
    assert(frames == Seq(0L, 100L, 200L))
  }

  test("repetitionStats: hand-computed fractions, short/empty docs") {
    val docs = Seq(
      (1L, "a b a b a"), // 5 toks 2 distinct; bigrams ab,ba,ab,ba
      (2L, "x y z"),
      (3L, "solo"), // no bigrams → NULL bigram stats
      (4L, "")) // no tokens → omitted
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .orderBy("doc_id")
      .collect()
    assert(got.length == 3)
    val r1 = got(0)
    assert(r1.getLong(1) == 5L && r1.getDouble(2) == 0.6)
    assert(r1.getLong(3) == 4L && r1.getDouble(4) == 0.5 && r1.getDouble(5) == 0.5)
    val r2 = got(1)
    assert(r2.getLong(1) == 3L && r2.getDouble(2) == 0.0)
    assert(r2.getLong(3) == 2L && r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.5)
    val r3 = got(2)
    assert(r3.getLong(1) == 1L && r3.isNullAt(3) && r3.isNullAt(5))
  }

  test("qualityFlags: each rule fires on its pathology, clean doc keeps") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the hills is nice today indeed"),
      (2L, "tiny text here"), // too short + no function words
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),
      (4L, "@@@@ #### %%%% the is and of to in that it la le"))
      .toDF("doc_id", "text")
    val got = docs.withColumn("qf", TextAnalysis.qualityFlags(col("text")))
      .select(col("doc_id"), col("qf.keep"), col("qf.reasons"))
      .as[(Long, Boolean, String)].collect()
      .map { case (k, v, r) => k -> ((v, r)) }.toMap
    assert(got(1L) == ((true, "")))
    assert(got(2L) == ((false, "wc,stop")))
    assert(got(3L) == ((false, "rep,stop")))
    assert(!got(4L)._1 && got(4L)._2.contains("sym"))
  }

  test("qualityFlags: NULL text drops (does not silently keep)") {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("doc_id", "text")
    val got = docs.withColumn("qf", TextAnalysis.qualityFlags(col("text")))
      .select(col("doc_id"), col("qf.keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(!got(1L) && !got(2L))
  }

  test("bigramSurprisal: hand-computed conditional surprisals") {
    // corpus: "a b a b", "a c" → bigrams: ab×2, ba×1, ac×1
    // prefixes: a·=3, b·=1 → p(ab)=2/3, p(ba)=1/1, p(ac)=1/3
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "surprisal")
      .as[(Long, Long, Double)].collect().toSeq
    val d1 = -(math.log(2.0 / 3) + math.log(1.0) + math.log(2.0 / 3)) / 3
    val d2 = -math.log(1.0 / 3)
    assert(got.map(_._1) == Seq(1L, 2L)) // "solo" has no bigrams
    assert(got(0)._2 == 3L && math.abs(got(0)._3 - d1) < 1e-6)
    assert(got(1)._2 == 1L && math.abs(got(1)._3 - d2) < 1e-6)
  }

  test("chunk: windows, stride overlap, short docs, drop-tail bound") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "text", "doc_id", size = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_token", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 1, 3, "a b c"), (1L, 1, 3, 3, "c d e"), (1L, 2, 5, 3, "e f g"),
      (2L, 0, 1, 2, "a b")))
    // drop-tail bound: at most stride-1 trailing tokens uncovered
    val long = Seq((9L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(long, "text", "doc_id", size = 8, stride = 5)
      .select("start_token", "n_chunk_tokens").as[(Int, Int)].collect()
    val covered = chunks.map { case (st, n) => st + n - 1 }.max
    assert(covered >= 100 - (5 - 1) && covered <= 100)
  }

  test("chunk ≡ Scala sliding-window reference (randomized)") {
    val rnd = new scala.util.Random(20260812)
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val size = 7; val stride = 3
    val got = TextAnalysis.chunk(docs.toDF("doc_id", "text"), "text", "doc_id",
        size, stride)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Int, String)].collect().toSeq.sorted
    val want = docs.flatMap { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.isEmpty) Seq.empty
      else (1 to math.max(t.length - size + 1, 1) by stride).zipWithIndex.map {
        case (st, idx) => (id, idx, t.slice(st - 1, st - 1 + size).mkString(" "))
      }
    }.sorted
    assert(got == want)
  }

  test("Mixture.balance: invariant under input partitioning") {
    val df = (1 to 500).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val a = Mixture.balance(df, "id", "g").select("id").as[Long].collect().sorted.toSeq
    val b = Mixture.balance(df.repartition(13), "id", "g")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("oovStats: vocabulary cut + per-doc OOV fraction") {
    val docs = Seq((1L, "a a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.oovStats(docs, "text", "doc_id", vocabSize = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "oov_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // vocab = {a (freq 4), b (freq 1, ties → lexicographic beats c)}
    assert(got == Seq((1L, 4L, 0L, 0.0), (2L, 2L, 1L, 0.5)))
  }

  test("Mixture.balance: smallest group survives whole, deterministic subset") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 110).map(i => (i.toLong, "small"))).toDF("id", "g")
    val kept = Mixture.balance(df, "id", "g")
    val counts = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts("small") == 10L) // threshold = 1e6 → keep all
    assert(counts.getOrElse("big", 0L) > 0 && counts("big") < 40L)
    // determinism: exact same ids on a rerun
    val ids1 = kept.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Mixture.balance(df, "id", "g").select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("Mixture.sampleToMixture: weighted targets, unlisted group dropped") {
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 120).map(i => (i.toLong, "b")) ++
      (121 to 130).map(i => (i.toLong, "c"))).toDF("id", "g")
    val kept = Mixture.sampleToMixture(df, "id", "g",
      Map("a" -> 0.5, "b" -> 0.5), targetRows = 40)
    val counts = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("c")) // weight 0 → dropped
    assert(counts("b") == 20L) // target 20 = group size → keep all
    assert(counts("a") > 5 && counts("a") < 40) // ~20 of 100 kept
  }

  test("Events.hoppingAgg: every event lands in window/hop windows") {
    val df = Seq((0L, "a", 1.0), (95L, "a", 2.0), (150L, "b", 3.0))
      .toDF("ts", "event_type", "value")
    val got = Events.hoppingAgg(df, "ts", windowNs = 100L, hopNs = 50L,
        Seq("event_type"), Seq(count(lit(1)).as("n"), sum("value").as("s")))
      .orderBy("window_start_ns", "event_type")
      .select("window_start_ns", "event_type", "n", "s")
      .as[(Long, String, Long, Double)].collect().toSeq
    // ts 0 → windows [-50, 0]; ts 95 → [50, 0]? no: [0, 50]; ts 150 → [100, 150]
    assert(got == Seq(
      (-50L, "a", 1L, 1.0), (0L, "a", 2L, 3.0), (50L, "a", 1L, 2.0),
      (100L, "b", 1L, 3.0), (150L, "b", 1L, 3.0)))
  }

  test("Graph.pageRank: hand-computed 2-iteration ranks, mass conserved") {
    // 1→2, 1→3, 2→3, 3→1 (no dangling nodes → total rank conserved)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val got = Graph.pageRank(edges, "a", "b", iters = 2)
      .select("id", "rank").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.36125, 2L -> 0.575, 3L -> 1.06375))
    assert(math.abs(got.values.sum - 3.0) < 1e-9)
    // dangling convention: 2 has no out-edges; its mass drops
    val dangling = Seq((1L, 2L)).toDF("a", "b")
    val g2 = Graph.pageRank(dangling, "a", "b", iters = 1)
      .select("id", "rank").as[(Long, Double)].collect().toMap
    assert(g2 == Map(1L -> 0.15, 2L -> 1.0))
  }

  test("Curation: funnel is monotone, curate ≡ final stage, probes removed") {
    val docs = Seq(
      (0L, "the cat and the dog is in the house that it likes to be in every day", "s1"),
      (1L, "the cat and the dog is in the house that it likes to be in every day", "s1"), // dup of 0
      (2L, "short", "s1"), // fails quality (wc)
      (3L, "one two three four five six seven eight the and of to is in that it", "s2"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta the and of to is in that it", "s2"),
      (7L, "iota kappa lambda mu nu xi omicron pi the and of to is in that it", "s1"))
      .toDF("doc_id", "text", "source")
    // probes share doc 3's text verbatim → decontamination drops doc 3
    val probes = Seq("one two three four five six seven eight the and of to is in that it")
      .toDF("probe")
    val funnel = Curation.funnel(docs, "text", "doc_id", "source", probes, "probe")
      .orderBy("stage_ord")
      .select("stage", "n_docs").as[(String, Long)].collect().toSeq
    assert(funnel.map(_._1) ==
      Seq("input", "quality", "dedup", "decontaminate", "balance"))
    val counts = funnel.map(_._2)
    assert(counts.head == 6L)
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a }) // monotone
    val kept = Curation.curate(docs, "text", "doc_id", "source", probes, "probe")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == counts.last)
    assert(!kept.contains(1L)) // dup loses to min id
    assert(!kept.contains(2L)) // quality-dropped
    assert(!kept.contains(3L)) // contaminated
  }

  test("Sketches.hllToleranceReport: groups + union rollup within tolerance") {
    val df = (1 to 2000).map(i => (s"v${i % 700}", if (i % 2 == 0) "a" else "b"))
      .toDF("v", "g")
    val rep = Sketches.hllToleranceReport(df, "v", "g", lgK = 12, tol = 0.05)
      .orderBy("g")
      .select("g", "n_exact", "hll_ok").as[(String, Long, Boolean)].collect().toSeq
    assert(rep.map(_._1) == Seq("ALL", "a", "b"))
    assert(rep.find(_._1 == "ALL").get._2 == 700L)
    assert(rep.forall(_._3), s"HLL estimate outside 5%: $rep")
    // mergeability: union of per-group sketches ≈ sketch of the whole
    // (not bit-exact — the union operator's target representation can
    // differ from a directly-built sketch — but both estimate the same
    // set, so they agree to well under 1%)
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), 12))).as[Double].head
    val merged = Sketches.hllByGroup(df, "v", "g")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))).as[Double].head
    assert(math.abs(whole - merged) / whole < 0.01, s"whole $whole vs merged $merged")
  }

  test("Sketches.cmsEstimates: never undercounts, eps·N-tight at fixed seed") {
    val n = 5000
    val df = (1 to n).map(i => s"t${i % 50}").toDF("v") // each token ×100
    val est = Sketches.cmsEstimates(df, "v", Seq("t0", "t7", "t49", "absent"),
        eps = 0.001, confidence = 0.99, seed = 7)
      .as[(String, Long)].collect().toMap
    Seq("t0", "t7", "t49").foreach { t =>
      assert(est(t) >= 100L && est(t) <= 100L + (0.001 * n).ceil.toLong * 3,
        s"$t -> ${est(t)}")
    }
    assert(est("absent") <= (0.001 * n).ceil.toLong * 3)
  }

  test("Layout.zValue: hand-computed Morton interleave") {
    val got = Seq((3L, 1L), (2L, 3L), (0L, 0L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 2).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(11L, 13L, 0L, 2L, 1L))
  }

  test("Layout.snapshotDiff: add/remove/change classes, null-safe fingerprints") {
    val oldDf = Seq(
      (1L, Some("a"), Some("x")),   // unchanged
      (2L, Some("a"), None),        // ("a",NULL) — vs ("a","") in new
      (3L, Some("b"), Some("y")),   // changed payload
      (4L, Some("c"), Some("z"))    // removed
    ).toDF("id", "p", "q")
    val newDf = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("a"), Some("")),    // NULL→"" must register as changed
      (3L, Some("b"), Some("y2")),
      (5L, Some("d"), Some("w"))    // added
    ).toDF("id", "p", "q")
    val got = Layout.snapshotDiff(oldDf, newDf, "id", Seq("p", "q"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // separator safety: ("ab","c") and ("a","bc") are distinct
    val s1 = Seq((9L, "ab", "c")).toDF("id", "p", "q")
    val s2 = Seq((9L, "a", "bc")).toDF("id", "p", "q")
    val cls = Layout.snapshotDiff(s1, s2, "id", Seq("p", "q"))
      .as[(Long, String)].collect().head._2
    assert(cls == "changed")
  }

  test("Dedup.semDedup: within-cluster keep-first removal, hand-computed") {
    // two orthogonal families; ids 0 and 1 seed the two k-means lists
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.1f, 0.9f)), (4L, Seq(0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val removed = Dedup.semDedup(emb, "embedding", "vec_id",
        nLists = 2, iters = 1, threshold = 0.99, dims = 2)
      .orderBy("vec_id")
      .select("vec_id", "keeper_id").as[(Long, Long)].collect().toSeq
    // cos(0,2)=.9939, cos(0,4)=.9986, cos(1,3)=.9939 all ≥ .99;
    // every removed vector keeps to the smallest qualifying lower id
    assert(removed == Seq((2L, 0L), (3L, 1L), (4L, 0L)))
    // cross-cluster near-ties are never compared: only 3 removals
    Dedup.clearCaches()
  }

  test("Dedup.editDistancePairs: prefix-blocked Levenshtein verify") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delty epsilon zeta"), // 1 edit, same block
      (2L, "alpha beta completely different words entirely unrelated"),
      (3L, "other prefix gamma delta epsilon zeta")) // different block
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "text", "doc_id",
        blockTokens = 2, maxNormDist = 0.05)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSeq
    assert(pairs == Seq((0L, 1L, 1)))
    Dedup.clearCaches()
  }

  test("Dedup.semanticContaminated/Decontaminate: bucketed probe matches") {
    // probe (1,0) lands in hyperplane bucket 11 (weights hand-derived
    // from the md5 family); train 1 and 3 share it with cos ≥ .95,
    // train 2 sits in bucket 10 and is never even compared
    val train = Seq(
      (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val probes = Seq((10L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val hits = Dedup.semanticContaminated(train, probes, "embedding", "vec_id",
        threshold = 0.95, planes = 4, dims = 2)
      .orderBy("train_id")
      .select("train_id", "probe_id", "n_hits").as[(Long, Long, Long)]
      .collect().toSeq
    assert(hits == Seq((1L, 10L, 1L), (3L, 10L, 1L)))
    val kept = Dedup.semanticDecontaminate(train, probes, "embedding", "vec_id",
        threshold = 0.95, planes = 4, dims = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("Dedup.editDistancePairs matches a brute-force reference on random corpora") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    val words = Vector("aa", "ab", "ba", "bb") // 16 possible 2-token blocks
    for (_ <- 1 to 3) {
      val docs = (0L until 20L).map { id =>
        (id, Seq.fill(4 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "))
      }
      val maxNorm = 0.4
      val byBlock = docs.groupBy(_._2.split(" ").take(2).mkString(" "))
      val expected = (for {
        blk <- byBlock.values.toSeq
        Seq((ia, ta), (ib, tb)) <- blk.sortBy(_._1).combinations(2).toSeq
        d = lev(ta, tb)
        if d <= math.max(ta.length, tb.length) * maxNorm
      } yield (ia, ib, d)).sortBy(p => (p._1, p._2))
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"), "text",
          "doc_id", blockTokens = 2, maxNormDist = maxNorm)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSeq
      assert(got == expected, s"got $got\nexpected $expected")
      Dedup.clearCaches()
    }
  }

  test("Dedup.semDedup matches brute-force within-cluster pairs on random vectors") {
    val rnd = new scala.util.Random(11)
    val dims = 6; val tau = 0.8
    val emb = (0L until 40L).map { id =>
      (id, Seq.fill(dims)(rnd.nextFloat() * 2f - 1f))
    }
    val df = emb.toDF("vec_id", "embedding")
    // same quantizer the operator runs; assignment replayed through the
    // operator's own argmax expression so the brute force differs ONLY
    // in the pairwise stage
    val cents = Similarity.kmeansCentroids(df, "embedding", "vec_id",
      nLists = 4, iters = 2, dims = dims)
    val assigned = df.select($"vec_id",
        element_at(Similarity.nearestLists($"embedding", cents, 1), 1).as("list"))
      .as[(Long, Int)].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d
      for (i <- 0 until dims) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = emb.toMap
    val expected = emb.map(_._1).flatMap { b =>
      val keepers = emb.map(_._1).filter(a =>
        a < b && assigned(a) == assigned(b) && cos(vecs(a), vecs(b)) >= tau)
      if (keepers.isEmpty) None else Some((b, keepers.min))
    }.sortBy(_._1)
    val got = Dedup.semDedup(df, "embedding", "vec_id",
        nLists = 4, iters = 2, threshold = tau, dims = dims)
      .orderBy("vec_id")
      .select("vec_id", "keeper_id").as[(Long, Long)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    Dedup.clearCaches()
  }

  test("TextAnalysis.piiAudit counts on the original text and redacts all families") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (0L, "mail a.b+c@x-y.co or 10.0.0.1, ssn 123-45-6789, tel +1-415-555-0199"),
      (1L, "no pii here at all"),
      (2L, "two mails a@b.io c@d.org")).toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(docs, "text").orderBy("doc_id")
      .select("pii_email", "pii_phone", "pii_ipv4", "pii_ssn", "pii_total",
        "text_scrubbed").collect()
    assert((0 to 4).map(got(0).getInt) == Seq(1, 1, 1, 1, 4))
    val s0 = got(0).getString(5)
    for (tok <- Seq("<EMAIL>", "<PHONE>", "<IP>", "<SSN>"))
      assert(s0.contains(tok), s0)
    // redaction proof: nothing detectable remains in the scrubbed text
    TextAnalysis.piiPatterns.foreach { case (name, re, _) =>
      assert(re.r.findFirstIn(s0).isEmpty, s"$name still matches: $s0") }
    assert(got(1).getInt(4) == 0 && got(1).getString(5) == "no pii here at all")
    assert(got(2).getInt(0) == 2 && got(2).getInt(4) == 2)
  }

  test("kmeansCentroids trains on the bounded md5-sample only") {
    val rnd = new scala.util.Random(7)
    val dims = 4
    val emb = (0L until 60L).map(id => (id, Seq.fill(dims)(rnd.nextFloat())))
    val df = emb.toDF("vec_id", "embedding")
    // the sample rule, replayed literally: smallest md5("km:" || id)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val cap = 20
    val sampleIds = emb.map(_._1).sortBy(id => md5hex(s"km:$id")).take(cap).toSet
    val sampleDf = df.where($"vec_id".isin(sampleIds.toSeq: _*))
    // training the full corpus with trainCap=cap ≡ training the
    // pre-materialized sample — proves nothing outside the sample
    // reaches the quantizer
    val fromFull = Similarity.kmeansCentroids(df, "embedding", "vec_id",
      nLists = 3, iters = 2, dims = dims, trainCap = cap)
    val fromSample = Similarity.kmeansCentroids(sampleDf, "embedding", "vec_id",
      nLists = 3, iters = 2, dims = dims, trainCap = Int.MaxValue)
    assert(fromFull.map(_.toSeq).toSeq == fromSample.map(_.toSeq).toSeq)
    // and cap ≥ corpus is exactly full-corpus training (the gate-SF
    // regime: oracles replay the same numbers with or without the rule)
    val capAll = Similarity.kmeansCentroids(df, "embedding", "vec_id",
      nLists = 3, iters = 2, dims = dims, trainCap = 60)
    val unbounded = Similarity.kmeansCentroids(df, "embedding", "vec_id",
      nLists = 3, iters = 2, dims = dims, trainCap = Int.MaxValue)
    assert(capAll.map(_.toSeq).toSeq == unbounded.map(_.toSeq).toSeq)
  }

  test("Similarity.pqKnn: codes cluster, ADC is code-determined, refine recovers exact ranking") {
    // 2 subspaces of 4 dims; sub0 clusters by id parity (≈1 vs ≈5),
    // sub1 by id half (<4 ≈1, ≥4 ≈5); +0.01·id jitter keeps every
    // vector distinct while the cluster structure stays obvious
    val vecs = (0 until 8).map { i =>
      val a = (if (i % 2 == 0) 1.0 else 5.0) + i * 0.01
      val b = (if (i < 4) 1.0 else 5.0) + i * 0.01
      (i.toLong, Seq.fill(4)(a) ++ Seq.fill(4)(b))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(df, "embedding", "vec_id",
      m = 2, ksub = 2, iters = 2, dims = 8)
    assert(cbs.length == 2 && cbs.forall(_.length == 2)
      && cbs.forall(_.forall(_.length == 4)))
    val codes = Similarity.pqEncode(df, "embedding", "vec_id", cbs)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1))
    // same-cluster rows share a code; cross-cluster rows differ
    assert(codes(0)(0) == codes(2)(0) && codes(1)(0) == codes(3)(0)
      && codes(0)(0) != codes(1)(0), codes.toSeq)
    assert(codes(0)(1) == codes(1)(1) && codes(4)(1) == codes(5)(1)
      && codes(0)(1) != codes(4)(1), codes.toSeq)
    // ADC ranks by reconstructed INNER PRODUCT: for query 0 the
    // (5,5)-cluster codes carry the largest centroid dots, and ids 5/7
    // share those codes → identical ADC, tie to the lower id = 5
    val adc = Similarity.pqKnn(df, df.where($"vec_id" === 0),
      "embedding", "vec_id", k = 7, m = 2, ksub = 2, iters = 2, dims = 8)
      .orderBy("rank").collect()
    assert(adc.head.getLong(1) == 5L, adc.toSeq)
    val byId = adc.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(byId(5L) == byId(7L), "same codes must score identically")
    // exact re-rank over the whole shortlist ≡ brute force (cosine
    // tie-breaks and all)
    val queries = df.where($"vec_id" < 2)
    val exact = Similarity.bruteForceKnn(df, queries, "embedding", "vec_id", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val refined = Similarity.pqKnn(df, queries, "embedding", "vec_id",
      k = 3, m = 2, ksub = 2, iters = 2, dims = 8, refine = 8)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(refined == exact)
  }

  test("Mixture.temperatureWeights: alpha=0.5 flattening, hand-computed") {
    val docs = Seq(
      (0L, "a b c d", "small"),
      (1L, "a b c d e f g h i j k l m n o p", "large"))
      .toDF("doc_id", "text", "source")
    val got = Mixture.temperatureWeights(docs, "text", "source",
        alpha = 0.5, budget = 20L)
      .orderBy("source")
      .select("source", "n_tokens", "p_raw", "p_temp", "epochs")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // sqrt(16)=4, sqrt(4)=2 → p_temp = 2/3 vs 1/3; epochs = p_temp·20/n
    assert(got == Seq(
      ("large", 16L, 0.8, 0.666667, 0.8333),
      ("small", 4L, 0.2, 0.333333, 1.6667)))
  }

  test("TextAnalysis.leakageSafeSplit keeps a dup family on one side") {
    // doc ids 0 (train bucket) and 1 (test bucket) carry the same text:
    // a doc-grain split WOULD put the pair on both sides of the eval
    // boundary; the cluster-grain split hashes comp=0 for both
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, shared), (1L, shared),
      (2L, "one two three four five six seven eight"),
      (6L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
      (7L, "red orange yellow green blue indigo violet ultraviolet"))
      .toDF("doc_id", "text")
    // the naive assignment leaks: 0 → train but its dup 1 → test
    val naive = docs.select($"doc_id",
        TextAnalysis.splitAssign($"doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
      .as[(Long, String)].collect().toMap
    assert(naive(0L) == "train" && naive(1L) == "test")
    val got = TextAnalysis.leakageSafeSplit(docs, "text", "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("split")
      .select("split", "n_docs", "n_clusters", "clusters_spanning_splits")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("test", 1L, 1L, 0L),   // doc 6
      ("train", 3L, 2L, 0L),  // docs 0, 1 (one cluster) + doc 2
      ("val", 1L, 1L, 0L)))   // doc 7
    Dedup.clearCaches()
  }

  test("TextAnalysis.hybridRrf: fusion math and one-sided rankings") {
    val docs = Seq(
      (0L, "spark spark spark"), (1L, "data"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = TextAnalysis.hybridRrf(docs, "text", "doc_id",
        emb, "embedding", "vec_id",
        queryTerms = Seq("spark", "data"), queryVecId = 0L, k = 3, depth = 2)
      .collect()
    // doc1 ranks on both sides (bm25 #2, cos #1): 1/62 + 1/61
    // doc0 is the vector query (excluded semantically): 1/61 + 0
    // doc2 never matches a term: 0 + 1/62
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 0L, 2L))
    val d1 = got(0)
    assert(d1.getInt(1) == 2 && d1.getInt(2) == 1)
    assert(math.abs(d1.getDouble(3) - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(got(1).isNullAt(2) && got(2).isNullAt(1)) // one-sided ranks stay NULL
  }

  test("Similarity.covarianceMatrix: hand-computed 2-d covariance, symmetric") {
    val emb = Seq(Seq(1d, 2d), Seq(3d, 4d), Seq(5d, 6d)).toDF("embedding")
    val got = Similarity.covarianceMatrix(emb, "embedding", dims = 2)
      .orderBy("i", "j")
      .as[(Int, Int, Double)].collect().toSeq
    // E[x²]−E[x]² = 35/3−9 = 8/3 for every cell of this fixture
    val c = math.rint(8d / 3 * 1e6) / 1e6
    assert(got == Seq((0, 0, c), (0, 1, c), (1, 0, c), (1, 1, c)))
    // symmetry on a less degenerate fixture
    val emb2 = Seq(Seq(1d, 7d, 2d), Seq(4d, 1d, 9d), Seq(2d, 2d, 2d),
      Seq(8d, 3d, 1d)).toDF("embedding")
    val m = Similarity.covarianceMatrix(emb2, "embedding", dims = 3)
      .as[(Int, Int, Double)].collect()
      .map { case (i, j, v) => (i, j) -> v }.toMap
    for (i <- 0 until 3; j <- 0 until 3) assert(m((i, j)) == m((j, i)))
  }

  test("Similarity.mmrSelect: greedy picks relevance then diversity") {
    // q=[1,0]; v1 rel .8, v2 rel .6 but sim(v2,v1)=.96, v3 rel 0
    val emb = Seq(
      (0L, Seq(1d, 0d)), (1L, Seq(0.8, 0.6)), (2L, Seq(0.6, 0.8)),
      (3L, Seq(0d, 1d)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(emb, "embedding", "vec_id",
        queryId = 0L, k = 3, poolSize = 3, lambda = 0.5)
      .orderBy("rank")
      .as[(Int, Long, Double, Double)].collect().toSeq
    // step1: v1 at λ·rel = .4; step2: v2 at .5·.6−.5·.96 = −.18
    // (beats v3's 0−.5·.6 = −.3); step3: v3 at 0−.5·max(.6,.8) = −.4
    assert(got == Seq(
      (1, 1L, 0.8, 0.4), (2, 2L, 0.6, -0.18), (3, 3L, 0.0, -0.4)))
  }

  test("Similarity.mmrSelect: oversized pool fails fast at the driver guard") {
    val emb = Seq((0L, Seq(1d, 0d)), (1L, Seq(0.8, 0.6)), (2L, Seq(0d, 1d)))
      .toDF("vec_id", "embedding")
    val confKey = "spark.graft.mmr.maxPoolBytes"
    spark.conf.set(confKey, "16") // 2 dims × 8 bytes: poolSize 1 is the cap
    try {
      val e = intercept[IllegalArgumentException] {
        Similarity.mmrSelect(emb, "embedding", "vec_id",
          queryId = 0L, k = 2, poolSize = 2, lambda = 0.5).collect()
      }
      assert(e.getMessage.contains("maxPoolBytes") &&
        e.getMessage.contains("chunked re-rank"))
      // at the cap it still runs
      val ok = Similarity.mmrSelect(emb, "embedding", "vec_id",
        queryId = 0L, k = 1, poolSize = 1, lambda = 0.5).collect()
      assert(ok.length == 1)
    } finally spark.conf.unset(confKey)
  }

  test("TextAnalysis.charClassProfile: hand-computed classes and dominant") {
    val docs = Seq((1L, "Ab 12!"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.charClassProfile(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select("n_chars", "n_letter", "n_digit", "n_upper", "n_space",
        "n_other", "letter_frac", "dominant")
      .collect()
    val r = got(0)
    assert(r.getInt(0) == 6 && r.getInt(1) == 2 && r.getInt(2) == 2 &&
      r.getInt(3) == 1 && r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(r.getDouble(6) == 0.333333 && r.getString(7) == "letter")
    assert(got(1).getString(7) == "empty")
  }

  test("Dedup.containmentPairs: full quote scores containment 1 at low-ish jaccard") {
    // doc 1's shingles are a strict subset of doc 2's
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally unrelated content here"))
      .toDF("doc_id", "text")
    // 16 single-row bands: a candidate needs only ONE shared minhash,
    // so the subset pair's collision is effectively certain (a 4-row
    // band at jaccard .57 collides with P≈.11 — a flaky fixture)
    val got = Dedup.containmentPairs(docs, "text", "doc_id",
        numHashes = 16, bands = 16, shingleSize = 2, threshold = 0.9)
      .select("id_a", "id_b", "jaccard", "cont_a", "cont_b", "containment")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.size == 1)
    val (a, b, jac, ca, cb, cont) = got.head
    assert(a == 1L && b == 2L)
    assert(ca == 1.0 && cont == 1.0)      // 1's 4 shingles all inside 2
    assert(cb == 4d / 7 && jac == 4d / 7) // 2 has 7 shingles
    Dedup.clearCaches()
  }

  test("Events.decayedActivity: half-life weighting anchored at max ts") {
    val hl = 1000L * 1000 * 1000 // 1s half-life, ns
    val ev = Seq(
      (1L, 0L, 10d), (1L, hl, 10d), // ages hl, 0 → weights .5, 1
      (2L, hl, 10d))                // single fresh event
      .toDF("user_id", "ts", "value")
    val got = Events.decayedActivity(ev, "user_id", "ts", "value", hl)
      .orderBy("user_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, hl / 1000, 15.0, 1.5),
      (2L, 1L, hl / 1000, 10.0, 1.0)))
  }

  test("Expectations: injected violations fail their checks, clean data passes") {
    import graft.operators.Expectations._
    val parent = Seq(1L, 2L, 3L).toDF("id")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L)) // 99 is an orphan
      .toDF("cid", "pid")
    val vals = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "y"), (null, "z")) // dup key + a null
      .toDF("k", "s")
    val rep = suite(Seq(
      expectNotNull(vals, "vals", "k"),
      expectUnique(vals, "vals", Seq("k")),
      expectBetween(child, "child", "pid", 1, 50),
      expectInSet(vals, "vals", "s", Seq("x", "y", "z")),
      refIntegrity(child, "child", "pid", parent, "id"),
      expectRowCount(parent, "parent", 3, 3)))
      .select("check_name", "violations", "status")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep("not_null(k)") == ((1L, "fail")))
    assert(rep("unique(k)") == ((1L, "fail"))) // one row beyond first (nulls group too)
    assert(rep("between(pid,1.0,50.0)") == ((1L, "fail"))) // 99
    assert(rep("in_set(s)") == ((0L, "pass")))
    assert(rep("ref(pid→id)") == ((1L, "fail")))
    assert(rep("row_count(3,3)") == ((0L, "pass")))
  }

  test("Graph.hits: hand-computed two-iteration hub/authority") {
    // 1→2, 3→2, 2→4: node 2 is the authority, 1 and 3 are the hubs
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, "src", "dst", iters = 2)
      .orderBy("id").as[(Long, Double, Double)].collect().toSeq
    // iter2 raw auth: {2: .8, 4: .2} (already L1); raw hub:
    // {1: .8, 3: .8, 2: .2} → /1.8 = {.444444, .444444, .111111}
    assert(got == Seq(
      (1L, 0.0, 0.444444), (2L, 0.8, 0.111111),
      (3L, 0.0, 0.444444), (4L, 0.2, 0.0)))
  }

  test("TextAnalysis.blocklistScreen: hits, categories, verdict") {
    val docs = Seq((1L, "big big data fast"), (2L, "clean words only"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.blocklistScreen(docs, "text", "doc_id",
        Seq("big" -> "size", "fast" -> "perf"), maxHitFrac = 0.5)
      .orderBy("doc_id")
      .select("n_tokens", "n_hits", "hit_frac", "categories", "blocked")
      .as[(Int, Long, Double, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (4, 3L, 0.75, "perf,size", true),
      (3, 0L, 0.0, "", false)))
  }

  test("Similarity.embeddingAudit: NaN/zero/bad-dim counts, clean norm envelope") {
    val emb = Seq(
      ("a", Seq(3d, 4d)),                  // norm 5
      ("a", Seq(0d, 0d)),                  // zero norm
      ("a", Seq(Double.NaN, 1d)),          // NaN-contaminated
      ("a", Seq(1d)))                      // wrong width, norm 1
      .toDF("label", "embedding")
    val got = Similarity.embeddingAudit(emb, "embedding", "label", dims = 2)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(("a", 4L, 1L, 1L, 1L, 0.0, 5.0, 2.0)))
  }

  test("Similarity.labelConsistency: mislabeled point drags its label's score") {
    // cluster around [1,0] labeled x, cluster around [0,1] labeled y,
    // plus one y-labeled point sitting inside the x cluster
    val emb = Seq(
      (1L, Seq(1d, 0d), "x"), (2L, Seq(0.99, 0.1), "x"), (3L, Seq(0.98, -0.1), "x"),
      (4L, Seq(0d, 1d), "y"), (5L, Seq(0.1, 0.99), "y"), (6L, Seq(-0.1, 0.98), "y"),
      (7L, Seq(0.97, 0.05), "y"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelConsistency(emb, "embedding", "vec_id", "label", k = 3)
      .orderBy("label")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("x", 3L, 3L, 1.0), ("y", 4L, 3L, 0.75)))
  }

  test("Itemsets.pairLift: a-priori pruning and hand-computed lift") {
    val baskets = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"))
      .toDF("basket", "item")
    val got = Itemsets.pairLift(baskets, "basket", "item", minSupport = 2)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    // C (support 1) is pruned before the join; (A,B) in 2 of 4 baskets
    assert(got == Seq(("A", "B", 3L, 3L, 2L,
      0.5, 0.666667, 0.666667, 0.888889)))
  }

  test("TextAnalysis.tokenEntropy: hand-computed entropy and evenness") {
    val docs = Seq((1L, "a a b b"), (2L, "a a a"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 0.693147, 1.0),   // ln 2, perfectly even
      (2L, 3L, 1L, 0.0, 0.0),        // degenerate distribution
      (3L, 4L, 4L, 1.386294, 1.0)))  // ln 4, all distinct
  }

  test("TextAnalysis.sourceJsDivergence: identical → 0, disjoint → ln 2") {
    val docs = Seq(
      (1L, "alpha beta", "s1"), (2L, "alpha beta", "s2"),
      (3L, "gamma delta", "s3"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceJsDivergence(docs, "text", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Double)].collect().toSeq
    assert(got == Seq(
      ("s1", "s2", 0.0), ("s1", "s3", 0.693147), ("s2", "s3", 0.693147)))
  }

  test("Dedup.lshRecallReport: perfect recall on an easy corpus, counts add up") {
    // two exact near-dup pairs + noise; single-row bands make every
    // true pair a candidate, so recall must be exactly 1
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta"), (4L, "epsilon zeta eta theta"),
      (5L, "totally different words here"))
      .toDF("doc_id", "text")
    val got = Dedup.lshRecallReport(docs, "text", "doc_id",
        numHashes = 16, bands = 16, shingleSize = 2, threshold = 0.5)
      .as[(Long, Long, Long, Long, Double, Long, Double)].collect().head
    val (nDocs, nPairs, nTrue, nFound, recall, nCand, candFrac) = got
    assert(nDocs == 5L && nPairs == 10L)
    assert(nTrue == 2L && nFound == 2L && recall == 1.0)
    assert(nCand >= 2L && candFrac == nCand.toDouble / 10)
    Dedup.clearCaches()
  }

  test("TextAnalysis.spanSurprisal: rare-token chunk scores above doc mean") {
    // doc 1: three chunks (size 2, stride 2) — the middle one holds the
    // corpus-rare tokens, so its delta must be positive
    val docs = Seq(
      (1L, "common common rare1 rare2 common common"),
      (2L, "common common common common"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.spanSurprisal(docs, "text", "doc_id",
        size = 2, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, Long, Double, Double)].collect().toSeq
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.size == 3)
    assert(doc1(1)._6 > 0 && doc1(0)._6 < 0 && doc1(2)._6 < 0)
    // deltas within a doc sum to ~0 (mean-centered)
    assert(math.abs(doc1.map(_._6).sum) < 1e-5)
    Dedup.clearCaches()
  }

  test("Similarity.standardizeEmbeddings: z-scores hand-computed, zero-variance dim → 0") {
    val emb = Seq((1L, Seq(1d, 5d)), (2L, Seq(3d, 5d))).toDF("vec_id", "embedding")
    val got = Similarity.standardizeEmbeddings(emb, "embedding", "vec_id")
      .orderBy("vec_id")
      .as[(Long, Seq[Double])].collect().toSeq
    // dim 0: μ=2, σ=1 → z = −1, 1; dim 1 constant → 0
    assert(got == Seq((1L, Seq(-1d, 0d)), (2L, Seq(1d, 0d))))
  }

  test("Dedup.dupRateByGroup: normalization-aware duplicate rates") {
    val docs = Seq(
      ("s1", "Hello World"), ("s1", "hello,  world!"), ("s1", "different"),
      ("s2", "unique one"), ("s2", "unique two"))
      .toDF("source", "text")
    val got = Dedup.dupRateByGroup(docs, "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    // "Hello World" and "hello,  world!" normalize to the same
    // fingerprint → s1 has 2 unique of 3
    assert(got == Seq(("s1", 3L, 2L, 0.333333), ("s2", 2L, 2L, 0.0)))
  }

  test("Profile.ksMatrix: hand-computed step-CDF distance") {
    val df = Seq(("A", 1), ("A", 2), ("B", 2), ("B", 3), ("C", 1), ("C", 2))
      .toDF("g", "v")
    val got = Profile.ksMatrix(df, "g", "v")
      .orderBy("group_a", "group_b")
      .as[(String, String, Double)].collect().toSeq
    // F_A = (.5, 1, 1), F_B = (0, .5, 1) over grid {1,2,3} → D = .5;
    // C is identical to A → D = 0
    assert(got == Seq(("A", "B", 0.5), ("A", "C", 0.0), ("B", "C", 0.5)))
    Dedup.clearCaches()
  }

  test("TextAnalysis.splitContamination: pair totals and leak flags consistent") {
    // 5 near-dup pairs (i, i+100): identical texts guarantee LSH finds
    // them; each pair's split classification must match splitAssign
    val docs = (0 until 5).flatMap(i => Seq(
      (i.toLong, s"shared text body number $i end"),
      (i + 100L, s"shared text body number $i end"))).toDF("doc_id", "text")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = TextAnalysis.splitContamination(docs, "text", "doc_id", weights)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got.map(_._3).sum == 5L) // every injected pair classified
    assert(got.forall(r => r._4 == (r._1 != r._2)))
    val expected = docs.select(col("doc_id"),
        TextAnalysis.splitAssign(col("doc_id"), weights).as("s"))
      .as[(Long, String)].collect().toMap
    val crossPairs = (0 until 5).count(i =>
      expected(i.toLong) != expected(i + 100L)).toLong
    assert(got.filter(_._4).map(_._3).sum == crossPairs)
    Dedup.clearCaches()
  }

  test("TextAnalysis.leakageSafeFolds: clusters never span folds") {
    val docs = ((0 until 20).map(i => (i.toLong, s"unique text $i")) ++
      Seq((100L, "dup family alpha beta"), (101L, "dup family alpha beta"),
        (102L, "dup family alpha beta"))).toDF("doc_id", "text")
    val got = TextAnalysis.leakageSafeFolds(docs, "text", "doc_id", k = 5)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).sum == 23L)          // every doc in some fold
    assert(got.forall(_._4 == 0L))            // no cluster spans folds
    assert(got.forall(r => r._1 >= 0 && r._1 < 5))
    // the dup family counts as ONE cluster in exactly one fold
    assert(got.map(_._3).sum == 21L)
    Dedup.clearCaches()
  }

  test("Dedup.ingestNovelNear: history hits and batch-internal dominance drop") {
    val hist = Seq((0L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val sidecar = Dedup.nearSignatures(hist, "text", "doc_id",
      numHashes = 16, shingleSize = 2)
    val newDocs = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // = history → drop
      (5L, "completely novel content here now"),
      (7L, "twin texts in this batch today"),  // batch twin, smaller → keep
      (9L, "twin texts in this batch today"))  // batch twin, larger → drop
      .toDF("doc_id", "text")
    val got = Dedup.ingestNovelNear(newDocs, "text", "doc_id", sidecar,
        numHashes = 16, bands = 16, shingleSize = 2, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(5L, 7L))
    Dedup.clearCaches()
  }

  test("Events.volumeAnomalies: the spike window flags, steady windows don't") {
    // key A: counts 1,1,1,1,1,10 across 6 windows — for the
    // (n−1)-equal + 1-outlier shape the outlier's z is exactly
    // √(n−1) = √5 ≈ 2.236 regardless of spike size (and the steady
    // windows sit at −1/√5); key B steady → σ=0 → no flags
    val win = 1000L
    val ev = ((0 until 5).map(w => (w * win + 1, "A")) ++
      (0 until 10).map(i => (5 * win + i + 1, "A")) ++
      (0 until 5).map(w => (w * win + 1, "B")))
      .map { case (t, k) => (t.toLong, k) }.toDF("ts", "event_type")
    val got = Events.volumeAnomalies(ev, "ts", win, Seq("event_type"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(("A", 5 * win, 10L)))
    assert(got.head._4 == math.rint(math.sqrt(5) * 1e6) / 1e6)
  }

  test("Events.twap: interval weights, last row carries none") {
    val ms = 1000000L
    // user 1: value 10 held 2 ms, 20 held 1 ms, 40 final (no weight)
    //   ⇒ (1000·2 + 2000·1)/3 cents = 1333.33… ⇒ 13.3333 dollars
    // user 2: single event ⇒ no interval ⇒ NULL
    val ev = Seq(
      (1L, 1L, 0L * ms, 10.0), (1L, 2L, 2L * ms, 20.0),
      (1L, 3L, 3L * ms, 40.0),
      (2L, 4L, 0L * ms, 99.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = Events.twap(ev, "user_id", "ts", "value")
      .orderBy("user_id").collect().toSeq
    assert(got(0).getLong(1) == 3L && got(0).getDouble(2) == 13.3333,
      s"got $got")
    assert(got(1).getLong(1) == 1L && got(1).isNullAt(2), s"got $got")
  }

  test("Events.twap: custom idCol on a frame without event_id") {
    val ms = 1000000L
    // same user-1 series as above, but the tie-break column is named
    // obs_id — r9 ADVICE: the hardcoded event_id failed analysis on
    // any frame lacking that exact name
    val ev = Seq(
      (1L, 1L, 0L * ms, 10.0), (1L, 2L, 2L * ms, 20.0),
      (1L, 3L, 3L * ms, 40.0)
    ).toDF("user_id", "obs_id", "ts", "value")
    val got = Events.twap(ev, "user_id", "ts", "value", idCol = "obs_id")
      .collect().toSeq
    assert(got.size == 1 && got(0).getDouble(2) == 13.3333, s"got $got")
  }

  test("Events.interEventStats: hand-computed gaps and burstiness") {
    val s = 1000L * 1000 * 1000
    val ev = Seq((1L, 0L), (1L, 10 * s), (1L, 20 * s), // periodic: B = −1
      (2L, 0L), (2L, 1 * s), (2L, 11 * s))             // gaps 1, 10
      .toDF("user_id", "ts")
    val got = Events.interEventStats(ev, "user_id", "ts")
      .orderBy("user_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got(0) == ((1L, 2L, 10.0, 0.0, -1.0)))
    // user 2: μ = 5.5, σ_pop = 4.5 → B = −1/10
    assert(got(1) == ((2L, 2L, 5.5, 4.5, -0.1)))
  }

  test("TextAnalysis.coverageCurve: cumulative mass at probe sizes") {
    // freqs: a×6, b×3, c×1 → top1 = .6, top2 = .9, top3 = 1.0
    val docs = Seq(Tuple1("a a a a a a b b b c")).toDF("text")
    val got = TextAnalysis.coverageCurve(docs, "text", ks = Seq(1, 2, 10))
      .orderBy("k")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((1, 1L, 0.6), (2, 2L, 0.9), (10, 3L, 1.0)))
  }

  test("Dedup.setSimilarityJoin: exactly reproduces brute-force all-pairs") {
    // three near-dup families + noise; the prefix filter must lose
    // NOTHING vs the quadratic truth (the operator's whole contract)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "spark shuffles wide joins across many executors"),
      (4L, "spark shuffles wide joins across many workers"),
      (5L, "completely unrelated text about cooking pasta"),
      (6L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(docs, "text", "doc_id",
        shingleSize = 2, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sets = docs.select(col("doc_id"),
        array_distinct(graft.functions.wordShingles(
          graft.functions.tokens(col("text")), 2)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).toSet.intersect(sets(b).toSet).size.toDouble
      uni = sets(a).toSet.union(sets(b).toSet).size.toDouble
      if inter / uni >= 0.4
    } yield (a, b)).toSet
    assert(brute.nonEmpty && got == brute)
    Dedup.clearCaches()
  }

  test("Dedup.setSimilarityJoin: lossless on a randomized shared-vocab corpus") {
    // adversarial shape for prefix filtering (the q159 corpus shape):
    // a SMALL vocabulary, so "rare" prefix tokens collide corpus-wide
    // and the counting-sketch filter carries the pruning. 120 docs of
    // 12-token texts over a 40-word vocab, with planted near-dup pairs
    // straddling the threshold — the result must equal brute force
    // exactly (every filter is exactness-preserving by construction).
    val rnd = new scala.util.Random(97)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (1 to 80).map { i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val planted = (1 to 40).map { i =>
      val src = base(rnd.nextInt(base.size))._2.split(" ").toSeq
      val k = rnd.nextInt(4) // 0-3 token edits: J from 1.0 down past t
      val mut = src.zipWithIndex.map { case (w, j) =>
        if (j < k) vocab(rnd.nextInt(vocab.size)) else w }
      ((100 + i).toLong, mut.mkString(" "))
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    val got = Dedup.setSimilarityJoin(docs, "text", "doc_id",
        shingleSize = 2, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sets = docs.select(col("doc_id"),
        array_distinct(graft.functions.wordShingles(
          graft.functions.tokens(col("text")), 2)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).toSet.intersect(sets(b).toSet).size.toDouble
      uni = sets(a).toSet.union(sets(b).toSet).size.toDouble
      if uni > 0 && inter / uni >= 0.5
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture must plant at least one real pair")
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    Dedup.clearCaches()
  }

  test("graft_packed_l1: codegen kernel == interpreted, lower-bounds |AΔB|") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextInt(300).toLong).distinct
      val b = Seq.fill(rnd.nextInt(60) + 1)(rnd.nextInt(300).toLong).distinct
      (i.toLong, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    def sk(c: org.apache.spark.sql.Column) =
      array((0 until 8).map { j =>
        aggregate(c, lit(0L), (acc, t) => {
          val bk = pmod(hash(t), lit(64))
          acc + when(bk >= j * 8 && bk < (j + 1) * 8,
            call_function("shiftleft", lit(1L),
              ((bk - lit(j * 8)) * 8).cast("int"))).otherwise(lit(0L))
        })
      }: _*)
    val got = df.select(col("i"),
        call_function("graft_packed_l1", sk(col("a")), sk(col("b"))).as("l1"),
        (size(array_union(col("a"), col("b"))) -
          size(array_intersect(col("a"), col("b")))).as("symdiff"))
      .as[(Long, Long, Int)].collect()
    assert(got.length == 200)
    got.foreach { case (i, l1, sd) =>
      assert(l1 <= sd, s"row $i: L1 $l1 must lower-bound |AΔB| $sd")
    }
    // identical sets ⇒ L1 = 0; disjoint same-bucket-free sets ⇒ = |AΔB|
    val self = df.select(
        call_function("graft_packed_l1", sk(col("a")), sk(col("a"))))
      .as[Long].collect()
    assert(self.forall(_ == 0L))
  }

  test("TextAnalysis.keywordSaliency: exclusive term tops its source, hand-checked G²") {
    val docs = Seq(
      ("s1", "spark spark spark spark spark common common common"),
      ("s2", "flink flink flink flink flink common common common"))
      .toDF("source", "text")
    val got = TextAnalysis.keywordSaliency(docs, "text", "source",
        topK = 1, minCount = 3)
      .select("source", "term", "n_in", "n_out", "g2")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // a=5, g=5, c=8, N=16: E1 = 8·5/16 = 2.5, b = 0 →
    // G² = 2·5·ln(2) ("common" is perfectly balanced → filtered out)
    val exp = math.rint(2d * 5 * math.log(5d / 2.5) * 1e4) / 1e4
    assert(got("s1") == (("s1", "spark", 5L, 0L, exp)))
    assert(got("s2") == (("s2", "flink", 5L, 0L, exp)))
    Dedup.clearCaches()
  }

  test("Events.rollingDistinct: hand-computed trailing-window distincts") {
    val ev = Seq((0L, 1L), (3L, 2L), (12L, 1L), (31L, 3L))
      .toDF("ts", "user_id") // periods 0,0,1,3 at periodNs = 10
    val got = Events.rollingDistinct(ev, "user_id", "ts",
        periodNs = 10L, periods = 3)
      .select("period", "n_distinct_1", "n_distinct_w")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // first full window ends at period 2: {p0,p1,p2}={1,2}→2, p2 alone→0
    // period 3: {p1,p2,p3}={1,3}→2, p3 alone→1
    assert(got == Seq((2L, 0L, 2L), (3L, 1L, 2L)))
  }

  test("Events.cusumShifts: sustained level shift peaks where the regime ends") {
    // counts per window: five at 5 then five at 9 → μ=7, σ_pop=2, z=±1;
    // slack .5 ⇒ S⁺ climbs .5/window through the high regime (peak 2.5
    // at w=9), S⁻ climbs through the low regime (peak 2.5 at w=4)
    val ev = (0 until 10).flatMap { w =>
      val c = if (w < 5) 5 else 9
      (0 until c).map(i => (w * 1000L + i, "a"))
    }.toDF("ts", "event_type")
    val got = Events.cusumShifts(ev, "event_type", "ts",
        windowNs = 1000L, slack = 0.5)
      .as[(String, Long, Double, Long, Double, Long)].collect().toSeq
    assert(got == Seq(("a", 10L, 2.5, 9000L, 2.5, 4000L)))
  }

  test("Events.cusumShifts: silent windows are gap-filled, not skipped") {
    // key "b" has events only in windows 0 and 9 — the 8 silent
    // windows must enter the series as zeros (downward evidence)
    val ev = (Seq((0L, "b"), (1L, "b"), (9000L, "b")) ++
      (0 until 10).map(w => (w * 1000L, "a"))).toDF("ts", "event_type")
    val got = Events.cusumShifts(ev, "event_type", "ts",
        windowNs = 1000L, slack = 0.5)
      .select("event_type", "n_windows")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 10L, "b" -> 10L))
  }

  test("TextAnalysis.bloomDecontaminate: identical to the exact join; empty probes -> empty") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta iota kappa"),
      (3L, "totally different words with no shared grams here"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta trailing"))
      .toDF("doc_id", "text")
    val probes = docs.where(col("doc_id") === 1).select(col("text").as("p"))
    val exact = TextAnalysis.contaminated(docs, "text", "doc_id", probes, "p", n = 6)
      .as[(Long, Long, String)].collect().toSet
    val bloom = TextAnalysis.bloomDecontaminate(docs, "text", "doc_id",
        probes, "p", n = 6, estimatedItems = 1024, numBits = 1 << 14)
      .as[(Long, Long, String)].collect().toSet
    assert(exact.nonEmpty && bloom == exact)
    val none = TextAnalysis.bloomDecontaminate(docs, "text", "doc_id",
      probes.limit(0), "p", n = 6)
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("doc_id", "n_hits", "first_hit"))
    Dedup.clearCaches()
  }

  test("TextAnalysis.sourceQualityGate: bad source drops, strong doc rescued") {
    val good = "the cat and the dog went to the park and it was sunny there today"
    val junk = "%%% ### !!! @@@ $$$ ^^^ &&& *** ((( ))) ___"
    val docs = Seq(
      (1L, "g", good), (2L, "g", good),
      (3L, "b", junk), (4L, "b", junk), (5L, "b", good))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceQualityGate(docs, "text", "doc_id", "source",
        minSourceScore = 0.7, keepDocScore = 0.8)
      .select("doc_id", "keep", "reason")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1) == ((true, "ok")) && got(2) == ((true, "ok")))
    assert(got(3) == ((false, "bad_source")) && got(4) == ((false, "bad_source")))
    assert(got(5) == ((true, "rescued"))) // strong doc survives its source
  }

  test("Similarity.centroidSimilarity: aligned groups -> 1, orthogonal -> 0") {
    val emb = Seq(
      ("a", Seq(1f, 0f, 0f, 0f)), ("a", Seq(1f, 0f, 0f, 0f)),
      ("b", Seq(2f, 0f, 0f, 0f)),
      ("c", Seq(0f, 0f, 3f, 0f)))
      .toDF("label", "embedding")
    val got = Similarity.centroidSimilarity(emb, "embedding", "label")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")) == 1.0 && got(("a", "c")) == 0.0 && got(("b", "c")) == 0.0)
  }

  test("Dedup.syndicationReport: origin is smallest id, sources sorted distinct") {
    val dup = "spark shuffles wide joins across many executors in one stage always"
    val docs = Seq(
      (10L, "reuters", dup),
      (11L, "blogspam", dup + " extra"),
      (12L, "mirror", dup),
      (20L, "reuters", "completely unrelated content about gardens and soil quality"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.syndicationReport(docs, "text", "doc_id", "source",
        numHashes = 16, bands = 4, shingleSize = 1, threshold = 0.5)
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq((10L, 3L, 3L, 10L, "reuters", "blogspam,mirror,reuters")))
    Dedup.clearCaches()
  }

  test("Similarity.ivfRecallReport: probing every list gives recall 1") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat - 5f).toSeq)
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfRecallReport(emb, emb.filter(col("vec_id") < 3),
        "embedding", "vec_id", k = 4, nLists = 4, nProbe = 4, iters = 1, dims = 8)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(0L, 1L, 2L))
    assert(got.forall { case (_, nt, nh, r) => nt == 4L && nh == 4L && r == 1.0 })
  }

  test("Similarity.kCenterSelect: farthest-point picks orthogonals, skips duplicates") {
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(1f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(emb, "embedding", "vec_id", k = 3)
      .as[(Int, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1, 2, 3))
    assert(got.head._3.isEmpty)                       // seed has no distance
    assert(got.tail.forall(_._3.contains(1.0)))       // both picks orthogonal
    // the seed's exact duplicate (cosine 1) is never selected
    val ids = got.map(_._2).toSet
    assert(!(ids.contains(1L) && ids.contains(2L)))
  }

  test("TextAnalysis.saturationReport: later duplicate has zero novelty") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.saturationReport(docs, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 2L, 1.0)))
    Dedup.clearCaches()
  }

  test("Sketches.rollingDistinctHll: estimates within tolerance, exact sides match") {
    val ev = (0 until 8).flatMap(day =>
      (0 until 20).map(u => (day * 1000L + u, (u % (day + 3)).toLong)))
      .toDF("ts", "user_id")
    val got = Sketches.rollingDistinctHll(ev, "user_id", "ts",
      periodNs = 1000L, periods = 3, tol = 0.05)
    val exact = Events.rollingDistinct(ev, "user_id", "ts", 1000L, 3)
      .select("period", "n_distinct_w").as[(Long, Long)].collect().toMap
    val rows = got.select("period", "n_distinct_w", "hll_ok")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall { case (p, w, ok) => ok && exact(p) == w })
  }

  test("Dedup.minHashEstimateAudit: identical docs estimate 1.0 with zero error") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, t), (2L, t),
      (3L, "other words entirely unrelated to those previous documents here"))
      .toDF("doc_id", "text")
    val got = Dedup.minHashEstimateAudit(docs, "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0, 1.0, 0.0)))
    Dedup.clearCaches()
  }

  test("TextAnalysis.dataCard: counts, dup rate, and dominant language") {
    val docs = Seq(
      (1L, "s1", "en", "the cat sat on the mat and then it left"),
      (2L, "s1", "en", "the cat sat on the mat and then it left"),
      (3L, "s1", "de", "der hund und die katze sind nicht da heute"),
      (4L, "s2", "fr", "le chat est dans la maison avec les autres"))
      .toDF("doc_id", "source", "lang", "text")
    val got = TextAnalysis.dataCard(docs, "text", "doc_id", "source", "lang")
      .select("source", "n_docs", "n_unique", "dup_rate", "main_lang",
        "main_lang_frac")
      .as[(String, Long, Long, Double, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1") == (("s1", 3L, 2L, math.rint(1d / 3 * 1e6) / 1e6, "en", 0.666667)))
    assert(got("s2") == (("s2", 1L, 1L, 0.0, "fr", 1.0)))
    Dedup.clearCaches()
  }

  test("Dedup.dupFlowMatrix: pair sources ordered, intra-source on the diagonal") {
    val dup = "spark shuffles wide joins across many executors in one stage always"
    val docs = Seq(
      (1L, "b_src", dup), (2L, "a_src", dup), (3L, "b_src", dup),
      (4L, "a_src", "entirely different content about gardens and soil here"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.dupFlowMatrix(docs, "text", "doc_id", "source",
        numHashes = 16, bands = 4, shingleSize = 1, threshold = 0.5)
      .select("source_a", "source_b", "n_pairs")
      .as[(String, String, Long)].collect().toSet
    // pairs: (1,2) a_src-b_src, (1,3) b_src-b_src, (2,3) a_src-b_src
    assert(got == Set(("a_src", "b_src", 2L), ("b_src", "b_src", 1L)))
    Dedup.clearCaches()
  }

  test("Similarity.pqDistortionReport: centroid-coincident corpus has zero MSE") {
    // 4 distinct subvector patterns, each repeated — k-means with
    // ksub=4 lands centroids ON the points, so encode error is 0
    val pats = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f), Seq(0f, 0f, 0f, 1f))
    // same pattern in both subspaces so the id-ordered k-means init
    // (ids 0..3) already covers all four patterns in each subspace
    val emb = (0L until 16L).map(i =>
      (i, pats((i % 4).toInt) ++ pats((i % 4).toInt)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pqDistortionReport(emb, "embedding", "vec_id",
        m = 2, ksub = 4, iters = 2, dims = 8)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0, 16L, 0.0), (1, 16L, 0.0)))
  }

  test("Events.volumeTrend: exact OLS on a hand-built ramp") {
    // counts 1,2,3,4,5 per window -> slope 1, intercept 1
    val ev = (0 until 5).flatMap(w => (0 to w).map(i => (w * 100L + i, "a")))
      .toDF("ts", "event_type")
    val got = Events.volumeTrend(ev, "event_type", "ts", windowNs = 100L)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 5L, 15L, 1.0, 1.0)))
  }

  test("Events.diurnalProfile: ratio reflects the hour-of-day mix") {
    val hour = 3600L * 1000000000L
    // two days: hour 0 gets 3 events/day, hour 1 gets 1 event/day;
    // grid spans 25 hours (day1 hour0 included) -> hod 0 appears twice
    val ev = (0 until 2).flatMap { d =>
      (0 until 3).map(i => (d * 24 * hour + i, "a")) :+
        ((d * 24 * hour + hour + 5, "a"))
    }.toDF("ts", "event_type")
    val got = Events.diurnalProfile(ev, "event_type", "ts")
      .select("hour_of_day", "n_windows", "avg_n")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.head == ((0L, 2L, 3.0)))   // both days' hour-0 average 3
    // the grid runs through day-1 hour-1 (the max event), so hod 1
    // appears twice, averaging (1 + 1) / 2
    assert(got(1) == ((1L, 2L, 1.0)))
  }

  test("Dedup.weightedJaccardPairs: rare-gram overlap outweighs boilerplate") {
    // chrome tokens (home/about/contact) appear in ALL docs -> idf 0.
    // Pair (1,2) shares all the rare content and differs only on
    // chrome -> weighted score 1.0 beats its set Jaccard; a pair
    // sharing only chrome would score 0.
    val docs = Seq(
      (1L, "home about contact quantum entanglement decoherence theory"),
      (2L, "quantum entanglement decoherence theory"),
      (3L, "home about contact apples bananas cherries dates elderberry"),
      (4L, "home about contact figs grapes honeydew kiwis lemons"))
      .toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 1, threshold = 0.2)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // hand-check: rare grams df=2 -> ln 2 each (4 shared); chrome
    // df=3 -> ln(4/3) each (3, unshared, doc1 side only)
    // wJ = 4·ln2 / (4·ln2 + 3·ln(4/3)) ≈ 0.7626 > J = 4/7
    val p12 = got((1L, 2L))
    assert(p12._4 == 0.7626 && p12._4 > p12._3)
    got.get((3L, 4L)).foreach(p => assert(p._4 < p._3))
    Dedup.clearCaches()
  }

  test("Percentiles.winsorizeReport: clip counts and means, hand-computed") {
    val df = ((1 to 10).map(_.toDouble) :+ 1000d).map(("g", _))
      .toDF("grp", "v")
    val got = Percentiles.winsorizeReport(df, "grp", "v", 0.1, 0.9)
      .as[(String, Long, Double, Double, Long, Long, Double, Double)]
      .collect().toSeq
    // cuts at rank p·(n−1): lo = sorted[1] = 2, hi = sorted[9] = 10;
    // clipped sum = 2 + (2..10) + 10 = 66 → mean_after 6
    assert(got == Seq(("g", 11L, 2.0, 10.0, 1L, 1L,
      math.rint(1055d / 11 * 1e6) / 1e6, 6.0)))
  }

  test("TextAnalysis.zipfFit: exact power law fits slope −1, R² = 1") {
    // freqs 12/6/4/3 = 12/rank: the log-log points are collinear
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val docs = words.grouped(5).map(_.mkString(" ")).toSeq.toDF("text")
    val r = TextAnalysis.zipfFit(docs, "text").collect().head
    assert(r.getAs[Long]("n_terms") == 4)
    assert(r.getAs[Double]("slope") == -1.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Double]("intercept") ==
      math.rint(math.log(12d) * 1e6) / 1e6)
  }

  test("Profile.giniConcentration: uniform → 0, hand case 0.25") {
    val uniform = Seq(1, 2, 3, 4).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val u = Profile.giniConcentration(uniform, "k").collect().head
    assert(u.getAs[Long]("n_keys") == 4 && u.getAs[Long]("total") == 12)
    assert(u.getAs[Double]("gini") == 0.0)
    // counts {1, 3}: G = Σ|xi−xj| / (2n²μ) = 4/16 = 0.25
    val skewed = (Seq.fill(1)(10) ++ Seq.fill(3)(20)).toDF("k")
    val s = Profile.giniConcentration(skewed, "k").collect().head
    assert(s.getAs[Double]("gini") == 0.25)
  }

  test("Events.volumeTrendQuadratic recovers an exact quadratic series") {
    // window t carries y = 2 + 3t + t² events (t = 0..4): a zero-
    // residual fit must return the generating coefficients exactly
    val rows = for {
      t <- 0 to 4
      i <- 0 until (2 + 3 * t + t * t)
    } yield ("k", t * 1000L + i)
    val df = rows.toDF("key", "ts")
    val r = Events.volumeTrendQuadratic(df, "key", "ts", 1000L).collect().head
    assert(r.getAs[Long]("n_windows") == 5)
    assert(r.getAs[Long]("total") == 70)
    assert(r.getAs[Double]("a0") == 2.0)
    assert(r.getAs[Double]("a1") == 3.0)
    assert(r.getAs[Double]("a2") == 1.0)
  }

  test("Itemsets.tripleLift: hand-computed support and 3-way lift") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "y"),
      (4L, "z")).toDF("b", "i")
    val got = Itemsets.tripleLift(baskets, "b", "i", minSupport = 2).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getAs[String]("item_a"), r.getAs[String]("item_b"),
      r.getAs[String]("item_c")) == (("x", "y", "z")))
    assert(r.getAs[Long]("n_abc") == 2)
    assert(r.getAs[Double]("support") == 0.5)
    // lift = n_abc·N² / (n_a·n_b·n_c) = 2·16/27
    assert(r.getAs[Double]("lift") == math.rint(32d / 27 * 1e6) / 1e6)
    Dedup.clearCaches()
  }

  test("Percentiles.quantileAlign: single group matches global, exact deciles") {
    val df = (1 to 10).map(v => ("a", v / 10d)).toDF("g", "s")
    val got = Percentiles.quantileAlign(df, "g", col("s"))
      .orderBy("decile").collect()
    assert(got.length == 9)
    got.zipWithIndex.foreach { case (r, i) =>
      // decile d over 0.1..1.0: min s with 10·cum ≥ d·10 ⇒ s = d/10
      assert(r.getAs[Double]("src_q") == (i + 1) / 10d)
      assert(r.getAs[Double]("global_q") == (i + 1) / 10d)
      assert(r.getAs[Double]("gap") == 0.0)
    }
    Dedup.clearCaches()
  }

  test("Events.nextEventEval: a deterministic grammar scores accuracy 1") {
    // every user emits a→b→a→b, so the majority model (b after a,
    // a after b) is perfect on any train/test split
    val rows = for {
      u <- 1L to 10L
      (t, i) <- Seq("a", "b", "a", "b").zipWithIndex
    } yield (u, i * 1000L, t, u * 10 + i)
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.nextEventEval(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type").collect()
    assert(got.map(_.getAs[String]("from_type")).toSeq == Seq("a", "b"))
    got.foreach { r =>
      assert(r.getAs[Double]("accuracy") == 1.0)
      assert(r.getAs[Long]("n_test") > 0)
    }
    assert(got(0).getAs[String]("predicted") == "b")
    assert(got(1).getAs[String]("predicted") == "a")
    Dedup.clearCaches()
  }

  test("TextAnalysis.burrowsDelta: identical sources at distance 0") {
    val docs = Seq(
      ("A", "x x y"), ("B", "x x y"), ("C", "y y x"))
      .toDF("src", "text")
    val got = TextAnalysis.burrowsDelta(docs, "text", "src", vocabSize = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("delta"))).toMap
    assert(got(("A", "B")) == ((2L, 0.0)))
    assert(got(("A", "C"))._2 > 0 && got(("B", "C"))._2 > 0)
    Dedup.clearCaches()
  }

  test("Mixture.waterfillAllocation: small source caps, rest splits by weight") {
    // n = {a: 9, b: 400}, α = ½ ⇒ w = {3, 20}; B = 100 caps a at 9
    // and levels b at λ·w = 91/20·20 = 91
    val docs = Seq(
      ("a", Seq.fill(9)("t").mkString(" ")),
      ("b", Seq.fill(100)("t").mkString(" ")),
      ("b", Seq.fill(100)("t").mkString(" ")),
      ("b", Seq.fill(100)("t").mkString(" ")),
      ("b", Seq.fill(100)("t").mkString(" "))).toDF("src", "text")
    val got = Mixture.waterfillAllocation(docs, "text", "src", budget = 100L)
      .orderBy("src").collect()
    assert(got(0).getAs[Long]("n_tokens") == 9 &&
      got(0).getAs[Double]("alloc") == 9.0 &&
      got(0).getAs[Double]("rate") == 1.0)
    assert(got(1).getAs[Long]("n_tokens") == 400 &&
      got(1).getAs[Double]("alloc") == 91.0 &&
      got(1).getAs[Double]("rate") == 0.2275)
    // budget beyond supply: everything caps, λ unused (no div-by-zero)
    val all = Mixture.waterfillAllocation(docs, "text", "src", budget = 10000L)
      .orderBy("src").collect()
    assert(all.map(_.getAs[Double]("alloc")).toSeq == Seq(9.0, 400.0))
  }

  test("Graph.kCore: triangle survives k=2, pendant chain peels away") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Graph.kCore(edges, "a", "b", k = 2)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("degree")).toSeq
    assert(got == Seq(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // no 3-core exists in this graph
    assert(Graph.kCore(edges, "a", "b", k = 3).count() == 0)
  }

  test("TextAnalysis.coverageSelect: greedy picks, tie to smaller id") {
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "c d e"),
      (4L, "f")).toDF("doc_id", "text")
    val got = TextAnalysis.coverageSelect(docs, "text", "doc_id",
      shingleSize = 1, rounds = 3)
      .collect().map(r => (r.getAs[Int]("round"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("gain"),
        r.getAs[Long]("covered_total"))).toSeq
    // round 2: d3 and d4 both gain 1 — the smaller id wins
    assert(got == Seq((1, 1L, 4L, 4L), (2, 3L, 1L, 5L),
      (3, 4L, 1L, 6L)), s"got $got")
  }

  test("Similarity.knnLooLabelCheck: separated blobs vote their labels") {
    val emb = (Seq(0f, 1f, 2f, 3f).map(x => (x, 0)) ++
      Seq(100f, 101f, 102f, 103f).map(x => (x, 1))).zipWithIndex
      .map { case ((x, lb), i) => (i.toLong, Seq(x), lb) }
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.knnLooLabelCheck(emb,
      "embedding", "vec_id", "label", mProbes = 8, k = 3).collect()
    assert(out.length == 8)
    assert(out.forall(_.getAs[Boolean]("correct")))
    assert(out.forall(_.getAs[Double]("panel_accuracy") == 1.0))
    assert(out.forall(_.getAs[Long]("votes") == 3L))
  }

  test("Similarity.kMeans: separated 1-d blobs recovered in 3 rounds") {
    val emb = Seq(0f, 1f, 2f, 100f, 101f, 102f).zipWithIndex
      .map { case (x, i) => (i.toLong, Seq(x)) }
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.kMeans(emb, "embedding",
      "vec_id", k = 2, rounds = 3).collect()
    assert(out.map(_.getAs[Long]("n_points")).sorted.toSeq ==
      Seq(3L, 3L))
    // each blob: centroid at its middle ⇒ Σd² = 1 + 0 + 1 = 2
    assert(out.map(_.getAs[Double]("inertia")).toSeq == Seq(2.0, 2.0))
  }

  test("Similarity.lofScores: isolated point scores far above the bulk") {
    // 1-d line 0..9 plus an outlier at 100; probe everything
    val emb = ((0 to 9).map(i => (i.toLong, Seq(i.toFloat))) :+
      (100L, Seq(100f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.lofScores(emb, "embedding",
      "vec_id", mProbes = 11, k = 3)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        r.getAs[Double]("lof")).toMap
    assert(out.size == 11)
    assert(out(100L) > 3.0, s"outlier lof = ${out(100L)}")
    // interior bulk points sit near 1
    assert(out(5L) > 0.7 && out(5L) < 1.4, s"bulk lof = ${out(5L)}")
    assert(out.count { case (id, v) => id != 100L && v < 2.0 } >= 9)
  }

  test("Graph.percolation: components shatter as the threshold rises") {
    val pairs = Seq((1L, 2L, 0.95), (2L, 3L, 0.6), (4L, 5L, 0.55),
      (5L, 6L, 0.4)).toDF("a", "b", "sim")
    val got = Graph.percolation(pairs, "a", "b", "sim", Seq(0.5, 0.9))
      .collect().map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_components"),
          r.getAs[Long]("largest_component"))).toMap
    assert(got(0.5) == ((5L, 2L, 3L))) // {1,2,3} and {4,5}
    assert(got(0.9) == ((2L, 1L, 2L))) // only the 0.95 edge survives
  }

  test("Events.eventuallyFollows: strict precedence over user history") {
    val rows = Seq((1L, 1L, "a"), (1L, 5L, "b"), (1L, 10L, "a"),
      (2L, 3L, "a"), (3L, 2L, "b"), (3L, 7L, "a"))
      .toDF("u", "tsns", "ty")
    val got = graft.operators.Events.eventuallyFollows(rows, "u",
      "tsns", "ty").collect()
      .map(r => (r.getAs[String]("from_type"),
        r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_follows"), r.getAs[Long]("n_both"),
          r.getAs[Double]("share"))).toMap
    // u1: a(1..10), b(5); u3: a(7), b(2)
    assert(got(("a", "b")) == ((1L, 2L, 0.5)))
    assert(got(("b", "a")) == ((2L, 2L, 1.0)))
  }

  test("Graph.richClub: clique core at phi 1, lone top hub NULL") {
    // K4 on 1-4 (deg 3; node 1 deg 4 via pendant 5)
    val edges = ((for (i <- 1 to 4; j <- i + 1 to 4)
      yield (i.toLong, j.toLong)) :+ (1L, 5L)).toDF("a", "b")
    val got = Graph.richClub(edges, "a", "b", Seq(2, 3))
      .collect().map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          Option(r.get(r.fieldIndex("phi"))))).toMap
    assert(got(2) == ((4L, 6L, Some(1.0)))) // the clique is a rich club
    assert(got(3) == ((1L, 0L, None))) // a single hub has no club
  }

  test("Graph.kTruss: strip unzips over rounds, clique core survives") {
    // K4 on 1-4 (support 2 per edge) + a triangle strip 10-13 whose
    // end edges have support 1 and cascade away under k=4
    val edges = (
      (for (i <- 1 to 4; j <- i + 1 to 4) yield (i.toLong, j.toLong)) ++
        Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 12L), (11L, 13L)))
      .toDF("a", "b")
    val got = Graph.kTruss(edges, "a", "b", k = 4)
      .orderBy("u", "v").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("support")))
    assert(got.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
    // k=3 keeps every triangle-closing edge (strip included)
    assert(Graph.kTruss(edges, "a", "b", k = 3).count() == 11)
    // k=5 empties the graph (K4 edges only reach support 2)
    assert(Graph.kTruss(edges, "a", "b", k = 5).count() == 0)
  }

  test("TextAnalysis.textRank: hub word outranks peripherals") {
    // "core" is adjacent to every other surviving word; window-2 pairs
    // from one doc; 3-char min drops the "a of" filler
    val docs = Seq(
      (1L, "core alpha a of core beta a of core gamma"),
      (2L, "core alpha of a core beta")).toDF("doc_id", "text")
    val out = TextAnalysis.textRank(docs, "text", "doc_id",
      iters = 3, topK = 10).collect()
    assert(out.head.getAs[String]("word") == "core")
    assert(out.head.getAs[Int]("pos") == 1)
    val words = out.map(_.getAs[String]("word")).toSet
    assert(words == Set("core", "alpha", "beta", "gamma"))
    // ranks descend with pos and stay on the 1e-6 grid
    val ranks = out.map(_.getAs[Double]("rank"))
    assert(ranks.sorted.reverse.toSeq == ranks.toSeq)
    assert(ranks.forall(r => (r * 1e6).round / 1e6 == r))
  }

  test("TextAnalysis.kneserNeyBigrams: hand-computed continuation mix") {
    // "a b a b a c": c(ab)=2, c(ba)=2, c(ac)=1; N1+ marginals all 1
    // except N1+(a·)=2; 3 distinct bigrams
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyBigrams(docs, "text", "doc_id")
      .collect()
    assert(out.length == 3)
    val byPair = out.map(r => (r.getAs[String]("v"),
      r.getAs[String]("w")) -> r).toMap
    val ab = byPair(("a", "b"))
    assert(ab.getAs[Int]("pos") == 1 && ab.getAs[Long]("c_vw") == 2)
    assert(ab.getAs[Double]("p_disc") == 0.416667) // 1.25/3
    assert(ab.getAs[Double]("lambda") == 0.5) // 0.75·2/3
    assert(ab.getAs[Double]("p_cont") == 0.333333) // 1/3
    assert(ab.getAs[Double]("p_kn") == 0.583333)
    assert(byPair(("b", "a")).getAs[Double]("p_kn") == 0.75)
    assert(byPair(("a", "c")).getAs[Double]("p_kn") == 0.25)
  }

  test("TextAnalysis.logisticRegressionGd: separable data learns the labels") {
    // y = 1 iff x1 high — GD from 0 with enough signal classifies
    // everything correctly within 5 full-batch steps
    val docs = (Seq.fill(20)((0.9, 1.0)) ++ Seq.fill(20)((0.1, 0.0)))
      .toDF("f", "yv")
    val r = TextAnalysis.logisticRegressionGd(docs,
      features = Seq(col("f")), label = col("yv") === 1.0,
      eta = 5.0, iters = 5).collect().head
    assert(r.getAs[Long]("n") == 40)
    assert(r.getAs[Double]("accuracy") == 1.0)
    // the feature weight must point toward the positive class
    assert(r.getAs[Double]("w_1") > 0)
    // determinism: the trajectory replays exactly
    val r2 = TextAnalysis.logisticRegressionGd(docs,
      features = Seq(col("f")), label = col("yv") === 1.0,
      eta = 5.0, iters = 5).collect().head
    assert(r == r2)
    Dedup.clearCaches()
  }

  test("Similarity.hubnessReport: duplicated hub point dominates in-degree") {
    // 20 scattered unit vectors + one direction duplicated 3× — the
    // duplicated direction's members are everyone's nearest neighbors
    val base = (0 until 20).map(i =>
      (i.toLong, Seq.tabulate(4)(j => math.cos(i * 0.7 + j).toFloat)))
    val hubs = (20 until 23).map(i =>
      (i.toLong, Seq(1f, 0f, 0f, 0f)))
    val emb = (base ++ hubs).toDF("vec_id", "embedding")
    val got = Similarity.hubnessReport(emb, "embedding", "vec_id",
      k = 2, sampleSize = 23).collect()
      .map(r => r.getAs[Long]("in_degree") -> r.getAs[Long]("n_points")).toMap
    // histogram covers the whole corpus
    assert(got.map { case (_, n) => n }.sum == 23)
    // the three identical hub members soak up large in-degrees (each
    // is at least the other two hub members' top-1 at cosine 1)
    assert(got.keys.max >= 2)
    // a 5-query sample emits ≤ 10 edges over 23 points — anti-hubs
    // (in-degree 0) are forced structurally
    val sampled = Similarity.hubnessReport(emb, "embedding", "vec_id",
      k = 2, sampleSize = 5).collect()
      .map(r => r.getAs[Long]("in_degree") -> r.getAs[Long]("n_points")).toMap
    assert(sampled(0L) >= 13)
    Dedup.clearCaches()
  }

  test("Events.kaplanMeier: textbook worked example with censoring") {
    // durations (+ = event, c = censored): 1, 2c, 3, 3, 4c
    // t=1: n=5, d=1 → S = 4/5
    // t=3: n=3, d=2 → S = 4/5 · 1/3 = 4/15
    val durations = Seq((1L, false), (2L, true), (3L, false),
      (3L, false), (4L, true)).toDF("duration", "censored")
    val got = Events.kaplanMeier(durations, "duration", "censored")
      .orderBy("duration").collect()
      .map(r => (r.getAs[Long]("duration"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_events"), r.getAs[Double]("survival")))
    assert(got.length == 2)
    assert(got(0) == ((1L, 5L, 1L, 0.8)))
    assert(got(1) == ((3L, 3L, 2L,
      math.rint(4d / 15 * 1e6) / 1e6)))
    // total extinction pins survival to exactly 0 (no ln(0) anywhere)
    val ext = Seq((1L, false), (2L, false)).toDF("duration", "censored")
    val e = Events.kaplanMeier(ext, "duration", "censored")
      .orderBy("duration").collect()
    assert(e.last.getAs[Double]("survival") == 0.0)
  }

  test("Events.saxMotifs: alternating series yields alternating motifs") {
    // windows 0..15 alternate 10/0 events; paa=1 keeps the alternation,
    // so every length-3 word is cdc or dcd (c/d for the high windows
    // depends only on the breakpoints; the two motifs must each
    // repeat ≥ 6 times and no other motif may appear)
    val rows = for {
      w <- 0 until 16
      i <- 0 until (if (w % 2 == 0) 10 else 0)
    } yield ("k", w * 1000L + i)
    val df = rows.toDF("key", "ts")
    val got = Events.saxMotifs(df, "key", "ts", 1000L,
      paa = 1, wordLen = 3, minCount = 2).collect()
      .map(r => r.getAs[String]("motif") -> r.getAs[Long]("n")).toMap
    assert(got.size == 2, got)
    // the observed grid ends at the last NON-EMPTY window (w=14), so
    // 15 frames → 13 sliding words
    assert(got.values.sum == 13)
    assert(got.keys.forall(m => m.toSet.size == 2), got)
  }

  test("Events.seasonalityStrength: pure diurnal pattern scores ~1, flat ~0") {
    // key "a": volume depends only on hour-of-day (2-hour cycle proxy:
    // exact 24h-periodic); key "b": constant
    val rows = for {
      day <- 0 until 4
      h <- 0 until 24
      i <- 0 until (if (h < 12) 5 else 1)
    } yield ("a", (day * 24 + h) * 3600L * 1000 * 1000 * 1000 + i)
    val flat = for {
      day <- 0 until 4
      h <- 0 until 24
      i <- 0 until 3
    } yield ("b", (day * 24 + h) * 3600L * 1000 * 1000 * 1000 + i)
    val df = (rows ++ flat).toDF("key", "ts")
    val got = Events.seasonalityStrength(df, "key", "ts").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(got("a") == 1.0) // volume is a pure function of hour-of-day
    assert(got("b") == 0.0) // no between-hour variance at all
  }

  test("Graph.assortativity: star is strongly disassortative") {
    val star = (2L to 6L).map(i => (1L, i)).toDF("a", "b")
    val r = Graph.assortativity(star, "a", "b").collect().head
    assert(r.getAs[Long]("m_edges") == 5)
    assert(r.getAs[Double]("assortativity") == -1.0)
    // a clique is regular → zero variance → NULL by convention
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.assortativity(tri, "a", "b").collect().head.isNullAt(1))
  }

  test("Events.mannKendall: strictly rising series, hand-computed S and z") {
    // daily counts 1,2,3,4,5 → S = 10, no ties ⇒ 18·Var = 5·4·15 = 300
    val rows = for {
      d <- 0 until 5
      i <- 0 to d
    } yield ("k", d * 1000L + i)
    val r = Events.mannKendall(rows.toDF("key", "ts"), "key", "ts", 1000L)
      .collect().head
    assert(r.getAs[Long]("n_windows") == 5)
    assert(r.getAs[Long]("s") == 10)
    val z = 9d / math.sqrt(300d / 18)
    assert(r.getAs[Double]("z") == math.rint(z * 1e6) / 1e6)
    Dedup.clearCaches()
  }

  test("Events.theilSen: outlier-immune where OLS is not") {
    // counts 1,2,3,4,100: six of the ten pairwise slopes are exactly 1,
    // so both central order statistics are 1 → slope 1.0
    val counts = Seq(1, 2, 3, 4, 100)
    val rows = for {
      (c, d) <- counts.zipWithIndex
      i <- 0 until c
    } yield ("k", d * 1000L + i)
    val r = Events.theilSen(rows.toDF("key", "ts"), "key", "ts", 1000L)
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 10)
    assert(r.getAs[Double]("slope") == 1.0)
    Dedup.clearCaches()
  }

  test("Eval.abTest: hand-computed two-proportion z") {
    val df = Seq(
      (1L, "purchase"), (1L, "view"), // b, converted
      (2L, "purchase"), // a, converted
      (3L, "purchase"), // b, converted
      (4L, "view")) // a, not converted
      .toDF("user_id", "event_type")
    val r = Eval.abTest(df, "user_id",
      groupPred = col("user_id") % 2 === 0,
      convPred = col("event_type") === "purchase").collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b")) == ((2L, 2L, 1L, 2L)))
    assert(r.getAs[Double]("p_a") == 0.5 && r.getAs[Double]("p_b") == 1.0)
    // pp = 3/4; se = √(0.75·0.25·1); z = −0.5/se
    val z = -0.5 / math.sqrt(0.1875)
    assert(r.getAs[Double]("z") == math.rint(z * 1e6) / 1e6)
  }

  test("Mixture.neymanAllocation: zero-variance stratum gets nothing") {
    val df = Seq(("A", 0L), ("A", 10L), ("B", 5L), ("B", 5L))
      .toDF("src", "v")
    val got = graft.operators.Mixture.neymanAllocation(df, "src",
      col("v"), budget = 1000L).orderBy("src").collect()
    assert(got(0).getAs[Double]("sd") == 5.0 &&
      got(0).getAs[Double]("alloc") == 1000.0)
    assert(got(1).getAs[Double]("sd") == 0.0 &&
      got(1).getAs[Double]("alloc") == 0.0)
  }

  test("Itemsets.itemItemCosine: orthogonal and identical item vectors") {
    // items x,y share no baskets (orthogonal ⇒ no pair row); y,z have
    // identical count vectors ⇒ cosine 1
    val df = Seq(
      (1L, "x"), (1L, "x"),
      (2L, "y"), (2L, "z"),
      (3L, "y"), (3L, "y"), (3L, "z"), (3L, "z"))
      .toDF("b", "i")
    val got = Itemsets.itemItemCosine(df, "b", "i").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_co"), r.getAs[Double]("cosine"))).toMap
    assert(!got.contains(("x", "y")) && !got.contains(("x", "z")))
    assert(got(("y", "z")) == ((2L, 1.0)))
    Dedup.clearCaches()
  }

  test("Sketches.hllIntersectionAudit: exact fields + certified sketch") {
    // groups: A users {1,2,3}, B users {2,3,4}, C users {9}
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L), ("B", 3L),
      ("B", 4L), ("C", 9L)).toDF("g", "u")
    val got = Sketches.hllIntersectionAudit(df, "u", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"),
          r.getAs[Boolean]("hll_ok"))).toMap
    assert(got(("A", "B")) == ((2L, 4L, true)))
    assert(got(("A", "C")) == ((0L, 4L, true)))
    assert(got(("B", "C")) == ((0L, 4L, true)))
  }

  test("Events.lastTouchAttribution: credits the latest prior touch") {
    val df = Seq(
      (1L, 100L, "view", 1L), (1L, 200L, "click", 2L),
      (1L, 300L, "purchase", 3L), // credits click
      (1L, 400L, "purchase", 4L), // still click (purchases don't touch)
      (2L, 100L, "purchase", 5L), // no prior touch → dropped
      (2L, 200L, "view", 6L), (2L, 300L, "purchase", 7L)) // credits view
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.lastTouchAttribution(df, "user_id", "ts",
      "event_type", "purchase", "event_id").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_conversions"), r.getAs[Double]("share"))).toMap
    assert(got("click") == ((2L, math.rint(2d / 3 * 1e6) / 1e6)))
    assert(got("view") == ((1L, math.rint(1d / 3 * 1e6) / 1e6)))
  }

  test("TextAnalysis.dirichletQl: hand-computed LM scores, length prior ranks") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dirichletQl(docs, "text", "doc_id",
      Seq("a"), mu = 2d, k = 3)
      .as[(Long, Double)].collect().toMap
    // p_a = 3/8 (only matching-term occurrences feed cf; |C| counts all)
    def score(tf: Double, dl: Double): Double =
      math.rint((math.log(1 + tf / (2d * 3d / 8d)) +
        math.log(2d / (dl + 2d))) * 1e4) / 1e4
    assert(got(1L) == score(2, 3))
    assert(got(2L) == score(1, 2))
    assert(got(3L) == score(0, 3))
    // doc 2's single hit over a shorter length outranks doc 3's none
    assert(got(2L) > got(3L) && got(1L) > got(2L))
  }

  // one event per unit in window w of width 10 ⇒ count n in window w
  private def volumeEvents(key: String, counts: Seq[Int]): Seq[(String, Long)] =
    counts.zipWithIndex.flatMap { case (n, w) =>
      (0 until n).map(i => (key, w * 10L + i % 10)) }

  test("Events.madOutliers: modified z + MAD=0 fallback") {
    val df = (volumeEvents("spread", Seq(1, 2, 3, 4, 100)) ++
      volumeEvents("flat", Seq(1, 1, 1, 1, 10)))
      .toDF("key", "ts")
    val got = Events.madOutliers(df, "key", "ts", 10L, threshold = 2.0)
      .orderBy("key", "t").collect()
    // flat: med 1, MAD 0 ⇒ fallback flags every deviating window, NULL z
    assert(got(0).getString(0) == "flat" && got(0).getLong(1) == 4 &&
      got(0).isNullAt(5))
    // spread: med 3, MAD 1 ⇒ only dev=97 crosses 2.0 (z = 0.6745·97)
    assert(got(1).getString(0) == "spread" && got(1).getLong(1) == 4 &&
      got(1).getDouble(5) == 65.4265)
    assert(got.length == 2)
  }

  test("Events.changepoint: step series splits at the step") {
    // the grid is anchored at the first event's window, so the quiet
    // regime needs one event to exist on the grid at all
    val df = volumeEvents("k", Seq(1, 0, 0, 6, 6, 6)).toDF("key", "ts")
    val got = Events.changepoint(df, "key", "ts", 10L).collect()(0)
    // s=3: gain = (1·6 − 3·19)²/(3·3·6) = 2601/54; means 1/3 and 6
    assert(got.getLong(1) == 3 && got.getLong(2) == 6)
    assert(got.getDouble(3) == 0.3333 && got.getDouble(4) == 6.0)
    assert(got.getDouble(5) == math.rint(2601d / 54 * 1e4) / 1e4)
  }

  test("Events.ewmaSpikes: one-step prediction flags the spike only") {
    val df = volumeEvents("k", Seq(4, 4, 4, 40)).toDF("key", "ts")
    val got = Events.ewmaSpikes(df, "key", "ts", 10L,
      lookback = 16, spikeFactor = 1.5).collect()
    // t=3: pred = (40·? no) (1·4 + .5·4 + .25·4)/1.75 = 4 exactly
    assert(got.length == 1)
    assert(got(0).getLong(1) == 3 && got(0).getLong(2) == 40)
    assert(got(0).getDouble(3) == 4.0 && got(0).getDouble(4) == 10.0)
  }

  test("Events.rfmSegments: quintile cutpoint scores on a known grid") {
    // user i makes i purchases of 2.00 each, all ending at ts 1000 ⇒
    // identical recency (r=5 for all), freq/monetary rank with i
    val df = (1 to 5).flatMap { i =>
      (1 to i).map(j => (s"u$i", 1000L - (i - j) * 10L, "purchase", 2.0))
    }.toDF("user_id", "ts", "event_type", "value")
    val got = Events.rfmSegments(df, "user_id", "ts", "value", "event_type")
      .orderBy("f_score").collect()
    assert(got.length == 5)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == 5) // max recency score for everyone
      assert(r.getInt(1) == i + 1 && r.getInt(2) == i + 1)
      assert(r.getLong(3) == 1L)
      assert(r.getDouble(4) == 2.0 * (i + 1))
    }
  }

  test("Events.sessionPaths: ordered, truncated, counted") {
    val gap = 100L
    val df = Seq(
      ("u1", 1L, "a", 1L), ("u1", 2L, "b", 2L), ("u1", 3L, "c", 3L),
      ("u1", 500L, "d", 4L),
      ("u2", 1L, "a", 5L), ("u2", 2L, "b", 6L), ("u2", 3L, "c", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.sessionPaths(df, "user_id", "ts", "event_type",
      "event_id", gap, maxLen = 2, topK = 10)
      .as[(String, Long)].collect().toMap
    // maxLen=2 truncates a>b>c to a>b; two users share it
    assert(got == Map("a>b" -> 2L, "d" -> 1L))
  }

  test("Events.acf: hand-computed lags on counts 1,2,3,4") {
    // W=4, S=10 ⇒ dev = 4n−10 = [−6,−2,2,6], den = 80;
    // lag1: −6·−2 + −2·2 + 2·6 = 20 ⇒ 0.25; lag2: −24 ⇒ −0.3;
    // lag3: −36 ⇒ −0.45
    val rows = for { d <- 0 until 4; i <- 0 to d } yield ("k", d * 1000L + i)
    val got = Events.acf(rows.toDF("key", "ts"), "key", "ts", 1000L, 3)
      .orderBy("lag")
      .select("lag", "n_pairs", "acf")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 0.25), (2, 2L, -0.3), (3, 1L, -0.45)))
    Dedup.clearCaches()
  }

  test("Events.positionAttribution: U-shaped credits, open journey dropped") {
    val df = Seq(
      (1L, 1L, "view", 1L), (1L, 2L, "click", 2L), (1L, 3L, "view", 3L),
      (1L, 4L, "purchase", 4L),
      (1L, 5L, "ad", 5L), (1L, 6L, "purchase", 6L),
      (1L, 7L, "email", 7L)) // after the last purchase → uncredited
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.positionAttribution(df, "user_id", "ts", "event_type",
      "purchase", "event_id")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // journey 1 (m=3): view 0.4, click 0.2, view 0.4; journey 2 (m=1): ad 1.0
    assert(got == Map(
      "view" -> ((2L, 0.8)), "click" -> ((1L, 0.2)), "ad" -> ((1L, 1.0))))
  }

  test("Graph.adamicAdar: shared-attribute pairs, minShared filter, deg-1 ignored") {
    val inc = Seq(
      ("a", 1L), ("b", 1L), ("c", 1L), // deg 3
      ("a", 2L), ("b", 2L), // deg 2
      ("a", 3L), ("c", 3L), // deg 2
      ("a", 4L)) // deg 1 — contributes nothing
      .toDF("u", "i")
    val got = Graph.adamicAdar(inc, "u", "i", minShared = 2)
      .as[(String, String, Long, Double)].collect().toSeq
    val aa = math.floor((1 / math.log(3) + 1 / math.log(2)) * 1e6 + 0.5) / 1e6
    // (b,c) share only attr 1 → common=1 < minShared → dropped
    assert(got == Seq(("a", "b", 2L, aa), ("a", "c", 2L, aa)))
  }

  test("TextAnalysis.readability: hand-computed Flesch on a toy doc") {
    val df = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 6)
    assert(r.getAs[Long]("n_sentences") == 2)
    assert(r.getAs[Long]("n_syllables") == 6)
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(r.getAs[Double]("flesch") == 119.19)
    assert(r.getAs[String]("band") == "very_easy")
  }

  test("Eval.cramersV: perfect association gives V = 1 (zero cells folded in)") {
    val df = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val r = Eval.cramersV(df, "a", "b").collect().head
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Long]("dof") == 1)
    assert(r.getAs[Double]("chi2") == 4.0) // = n for a perfect 2×2
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  test("Events.scd2Intervals: runs collapse, intervals chain, last is current") {
    val df = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "a", 2L), (1L, 30L, "b", 3L),
      (1L, 40L, "a", 4L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.scd2Intervals(df, "user_id", "ts", "event_type",
      "event_id").orderBy("version")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, "a", 10L, Some(30L), 2L, false),
      (1L, 2L, "b", 30L, Some(40L), 1L, false),
      (1L, 3L, "a", 40L, None, 1L, true)))
  }

  test("Events.interArrival: exact mean, MLE rate and interpolated median") {
    val df = Seq(("k", 0L, 1L), ("k", 1000000000L, 2L),
      ("k", 3000000000L, 3L), ("k", 6000000000L, 4L))
      .toDF("event_type", "ts", "event_id")
    val r = Events.interArrival(df, "event_type", "ts", "event_id")
      .collect().head
    assert(r.getAs[Long]("n_gaps") == 3)
    assert(r.getAs[Double]("mean_gap_sec") == 2.0)
    assert(r.getAs[Double]("lambda_per_sec") == 0.5)
    assert(r.getAs[Double]("p50_gap_sec") == 2.0)
    Dedup.clearCaches(); Percentiles.clearCaches()
  }

  test("Events.sessionEntryExit: bounce and modal exit per entry type") {
    val gap = 100L
    val df = Seq(
      (1L, 1L, "a", 1L), (1L, 2L, "b", 2L), // one session a→b
      (2L, 1L, "c", 3L)) // bounce
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Events.sessionEntryExit(df, "user_id", "ts", "event_type",
      "event_id", gap)
      .as[(String, Long, Long, Double, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 1L, 0L, 0.0, "b", 1.0)))
    assert(got("c") == (("c", 1L, 1L, 1.0, "c", 1.0)))
  }

  test("TextAnalysis.heapsFit: two points fit exactly") {
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_docs") == 2)
    assert(r.getAs[Long]("total_tokens") == 4)
    assert(r.getAs[Long]("vocab") == 3)
    // slope through (ln2,ln2),(ln4,ln3) = ln(3/2)/ln2; k = 2/2^β = 4/3
    assert(r.getAs[Double]("beta") ==
      math.rint(math.log(1.5) / math.log(2) * 1e6) / 1e6)
    assert(r.getAs[Double]("k") == 1.333333)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("VcfApi.burdenReport: rare filter, consequence dedup, allele sums") {
    import graft.vcf.VcfApi
    val info = Seq((1L, 0.1), (2L, 0.5), (3L, 0.2))
      .toDF("variant_id", "af")
    // variant 1 carries TWO consequence rows for the same gene — must
    // count once; variant 2 is common and excluded
    val impact = Seq((1L, "G1"), (1L, "G1"), (2L, "G1"), (3L, "G1"))
      .toDF("variant_id", "symbol")
    val geno = Seq((1L, "S1", 2d), (1L, "S2", 0d), (2L, "S1", 1d),
      (3L, "S1", 1d)).toDF("variant_id", "sample", "gt")
    val got = VcfApi.burdenReport(geno, impact, info, afMax = 0.3)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("S1", "G1", 2L, 3L))) // sites {1,3}, alleles 2+1
  }

  test("VcfApi.rohReport: missing call breaks the run, short runs dropped") {
    import graft.vcf.VcfApi
    val geno = Seq(
      (1L, "A", Some(0d)), (2L, "A", Some(2d)), (3L, "A", None),
      (4L, "A", Some(2d)))
      .toDF("variant_id", "sample", "gt")
    val info = Seq((1L, "1", 10L), (2L, "1", 20L), (3L, "1", 30L),
      (4L, "1", 40L)).toDF("variant_id", "chr", "start")
    val got = VcfApi.rohReport(geno, info, minSites = 2)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "1", 10L, 20L, 2L)))
  }

  test("Graph.bfsHops: path graph distances, depth cap respected") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfsHops(edges, "a", "b", seeds, "id", maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2)) // 4,5 beyond the cap
  }

  test("Eval.lDiversity: l, entropy and the minL flag per group") {
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"), // l=2, H = ln3 − (2/3)ln2
      ("B", "z"), ("B", "z")) // l=1, H = 0
      .toDF("g", "s")
    val got = Eval.lDiversity(df, Seq("g"), "s", minL = 2)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val h = math.rint((-(2d / 3) * math.log(2d / 3)
      - (1d / 3) * math.log(1d / 3)) * 1e6) / 1e6
    assert(got("A") == (("A", 3L, 2L, h, true)))
    assert(got("B") == (("B", 2L, 1L, 0.0, false)))
  }

  test("Eval.classificationReport: hand-computed P/R/F1, unseen class rows") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: tp=2, fn=1
      ("b", "a"), // b: fp for a
      ("c", "c")) // exact
      .toDF("label", "pred")
    val got = Eval.classificationReport(df, "label", "pred")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // a: n_true=3, n_pred=3, tp=2 → P=R=2/3, F1=2/3
    assert(got("a") == (("a", 3L, 3L, 2L, 0.666667, 0.666667, 0.666667)))
    // b: n_true=1, n_pred=1, tp=0 → all zero
    assert(got("b") == (("b", 1L, 1L, 0L, 0.0, 0.0, 0.0)))
    assert(got("c") == (("c", 1L, 1L, 1L, 1.0, 1.0, 1.0)))
  }

  test("Percentiles.weightedQuantiles: inverse-CDF picks the crossing value") {
    // values 1,2,3 with weights 1,1,8: W=10, p50 threshold 5 → cum
    // reaches 5 inside the value-3 block; p90 → 3 as well; p10 → 1
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 8.0))
      .toDF("k", "v", "w")
    val r = Percentiles.weightedQuantiles(df, Seq("k"), "v", "w",
      Seq(0.1 -> "p10", 0.5 -> "p50", 0.9 -> "p90")).collect().head
    assert(r.getAs[Double]("w_total") == 10.0)
    assert(r.getAs[Double]("p10") == 1.0)
    assert(r.getAs[Double]("p50") == 3.0)
    assert(r.getAs[Double]("p90") == 3.0)
  }

  test("Eval.keySkew: buckets at exact powers of two, skew = max/mean") {
    // keys: a×1, b×2, c×4, d×1 → buckets 0(two keys),1,2; mean=2, max=4
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(1)("d")).toDF("k")
    val got = Eval.keySkew(df, "k").orderBy("bucket")
      .as[(Long, Long, Long, Long, Double, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 2L, 2L, 0.25, 4L, 2.0),
      (1L, 2L, 1L, 2L, 0.25, 4L, 2.0),
      (2L, 4L, 1L, 4L, 0.5, 4L, 2.0)))
  }

  test("Eval.functionalDeps: held and violated dependencies") {
    val df = Seq(("en", "web"), ("en", "web"), ("en", "book"),
      ("de", "web")).toDF("lang", "source")
    val got = Eval.functionalDeps(df,
      Seq("lang" -> "source", "source" -> "lang"))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // lang→source: en covers 2/3 modal → 1 violation; de exact
    assert(got(("lang", "source")) == (("lang", "source", 2L, 4L, 1L, false)))
    // source→lang: web modal en 2/3 → 1 violation; book exact
    assert(got(("source", "lang")) == (("source", "lang", 2L, 4L, 1L, false)))
  }

  test("Similarity.silhouetteReport: two tight clusters score near 1") {
    val a = Array.fill(4)(0f); a(0) = 1f
    val b = Array.fill(4)(0f); b(1) = 1f
    val rows = (0 until 8).map { i =>
      val base = if (i % 2 == 0) a else b
      // tiny deterministic jitter keeps vectors distinct but clustered
      (i.toLong, base.zipWithIndex.map { case (x, j) =>
        x + (if (j == 3) 0.01f * (i % 3) else 0f) })
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.silhouetteReport(df, "embedding", "vec_id",
      nLists = 2, iters = 2, dims = 4)
      .as[(Int, Long, Double)].collect()
      .map { case (l, n, s) => l -> ((n, s)) }.toMap
    assert(got.values.map(_._1).sum == 8)
    assert(got.values.forall(_._2 > 0.9)) // orthogonal clusters separate
  }

  test("Eval.diffInDiff: hand-computed 2x2 cells, DiD = 3, t = 1.5") {
    // control pre (1,3) post (2,4); treated pre (1,3) post (5,7):
    // DiD = (6−2) − (3−2) = 3; each cell var=2, n=2 → SE = √4 = 2
    val df = Seq(
      (false, false, 1.0), (false, false, 3.0),
      (false, true, 2.0), (false, true, 4.0),
      (true, false, 1.0), (true, false, 3.0),
      (true, true, 5.0), (true, true, 7.0))
      .toDF("tr", "post", "v")
    val r = Eval.diffInDiff(df, col("tr"), col("post"), "v").collect().head
    assert(r.getAs[Double]("mean_pt") == 6.0)
    assert(r.getAs[Double]("did") == 3.0)
    assert(r.getAs[Double]("se") == 2.0)
    assert(r.getAs[Double]("t_stat") == 1.5)
  }

  test("Events.dispersionIndex: under- and over-dispersed series") {
    // steady 1,2,3 → D = (3·14−36)/(2·6) = 0.5; bursty 0,0,6 → D = 6
    val rows =
      (for { d <- 0 until 3; i <- 0 to d } yield ("steady", d * 10L + i)) ++
        (0 until 6).map(i => ("bursty", 20L + i))
    val got = Events.dispersionIndex(rows.toDF("k", "ts"), "k", "ts", 10L)
      .as[(String, Long, Double, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("steady") == (("steady", 3L, 2.0, Some(0.5), false)))
    assert(got("bursty") == (("bursty", 3L, 2.0, Some(6.0), true)))
    Dedup.clearCaches()
  }

  test("Events.firstSeenGrowth: gap-filled new/cumulative curve") {
    val df = Seq(("A", 0L), ("A", 15L), ("B", 12L), ("A", 35L))
      .toDF("user_id", "ts")
    val got = Events.firstSeenGrowth(df, "user_id", "ts", 10L)
      .orderBy("period").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 0L, 2L),
      (3L, 0L, 2L)))
  }

  test("Events.userStateAccounting: new/retained/resurrected/churned identities") {
    // A active periods 0,1,3; B active 1 only. p2: both churn;
    // p3: A resurrects. active = new + retained + resurrected holds.
    val df = Seq(("A", 0L), ("A", 15L), ("B", 12L), ("A", 35L))
      .toDF("user_id", "ts")
    val got = Events.userStateAccounting(df, "user_id", "ts", 10L)
      .orderBy("period")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 0L),
      (2L, 0L, 0L, 0L, 0L, 2L),
      (3L, 1L, 0L, 0L, 1L, 0L)))
  }

  test("Layout.mergeAggState: incremental merge equals full recompute") {
    val all = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("a", 4.0))
      .toDF("k", "v")
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val merged = Layout.mergeAggState(
      partial(all.where(col("v") <= 2)), partial(all.where(col("v") > 2)),
      Seq("k"), Seq("n", "s"))
      .as[(String, Long, Double)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(merged == Map("a" -> ((3L, 7.0)), "b" -> ((1L, 3.0))))
  }

  test("Eval.cuped: perfectly correlated covariate gives full reduction") {
    // y = 2x exactly → θ = 2, var_reduction = corr² = 1
    val df = Seq((1L, true, 1.0), (1L, false, 2.0), (2L, true, 2.0),
      (2L, false, 4.0), (3L, true, 3.0), (3L, false, 6.0))
      .toDF("u", "pre", "v")
    val r = Eval.cuped(df, "u", col("pre"), "v").collect().head
    assert(r.getAs[Long]("n_units") == 3)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    assert(r.getAs[Double]("mean_metric") == 4.0)
  }

  test("Similarity.matryoshkaRecallReport: identical-prefix corpus recalls 1") {
    // vectors whose information lives entirely in the first 4 dims:
    // truncation to 4 dims cannot change the ranking
    val rows = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(8)(j =>
        if (j < 4) math.sin(i * 13 + j).toFloat else 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.matryoshkaRecallReport(df,
      df.filter(col("vec_id") < 3), "embedding", "vec_id", k = 3,
      prefixDims = 4)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.forall(r => r._4 == 1.0))
  }

  test("Eval.targetEncode: shrink toward the prior by m") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("c", "v")
    val got = Eval.targetEncode(df, "c", col("v"), m = 1.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // prior = 9/3 = 3: a → (4+3)/3 = 2.333333, b → (5+3)/2 = 4
    assert(got("a") == (("a", 2L, 2.0, 2.333333)))
    assert(got("b") == (("b", 1L, 5.0, 4.0)))
  }

  test("TextAnalysis.unseenVocabEstimate: hand-computed Good-Turing/Chao1") {
    val df = Seq((1L, "a b a"), (2L, "c b")).toDF("doc_id", "text")
    val r = TextAnalysis.unseenVocabEstimate(df, "text", n = 1)
      .collect().head
    // freqs a=2 b=2 c=1 → N=5 V=3 V1=1 V2=2
    assert(r.getAs[Long]("n_tokens") == 5)
    assert(r.getAs[Long]("vocab") == 3)
    assert(r.getAs[Double]("unseen_mass") == 0.2)
    assert(r.getAs[Double]("chao1") == 3.25)
  }

  test("TextAnalysis.featureHashAudit: count-of-counts invariants") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "i j k l m n o p"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.featureHashAudit(df, "text", n = 1, buckets = 8)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val nTypes = got.head._3
    assert(nTypes == 16)
    assert(got.map(r => r._1 * r._2).sum == nTypes) // Σ load·buckets = types
    val used = got.head._4
    assert(got.head._5 == math.rint((1.0 - used.toDouble / 16) * 1e6) / 1e6)
    Dedup.clearCaches()
  }

  test("Eval.rankBiasedOverlap: identical lists saturate, disjoint score 0") {
    val a = (1 to 50).map(i => (i.toLong, i)).toDF("id", "rank")
    val same = Eval.rankBiasedOverlap(a, a, "id", "rank", 50, 0.9)
      .collect().head
    // identical rankings: X_d = d ⇒ rbo_min = 1 − 0.9^50
    assert(same.getAs[Long]("overlap_at_depth") == 50)
    assert(same.getAs[Double]("rbo_min") ==
      math.rint((1 - math.pow(0.9, 50)) * 1e6) / 1e6)
    val b = (1 to 50).map(i => (i.toLong + 1000, i)).toDF("id", "rank")
    val disj = Eval.rankBiasedOverlap(a, b, "id", "rank", 50, 0.9)
      .collect().head
    assert(disj.getAs[Long]("overlap_at_depth") == 0)
    assert(disj.getAs[Double]("rbo_min") == 0.0)
  }

  test("Similarity.pairDistanceHistogram: orthogonal sample lands in one bin") {
    val rows = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i) 1f else 0f)))
    val got = Similarity.pairDistanceHistogram(rows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", sampleN = 8)
      .as[(Long, Double, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 0.0, 28L, 1.0))) // all 28 pairs at cos 0
    Dedup.clearCaches()
  }

  test("Graph.modularity: two disjoint triangles score exactly 0.5") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val comms = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "comp")
    val r = Graph.modularity(edges, "a", "b", comms, "id", "comp")
      .collect().head
    assert(r.getAs[Long]("m_edges") == 6)
    assert(r.getAs[Long]("n_communities") == 2)
    assert(r.getAs[Double]("modularity") == 0.5)
    Dedup.clearCaches()
  }

  test("Graph.labelPropagation: triangle converges, 2-node pair oscillates deterministically") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    // the isolated pair swaps labels every round: after 3 (odd) rounds
    // each carries the other's id — deterministic, hence gate-stable
    assert(got(4L) == 5L && got(5L) == 4L)
  }

  test("Events.clampedBalance: Lindley identity matches the sequential fold") {
    // deltas +500, −800, +300 cents → clamped 500, 0, 300; lost 300
    val df = Seq(
      (1L, 1L, "refill", 5.0, 1L), (1L, 2L, "purchase", 8.0, 2L),
      (1L, 3L, "refill", 3.0, 3L))
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val r = Events.clampedBalance(df, "user_id", "ts", "event_id",
      when(col("event_type") === "purchase", -col("value"))
        .otherwise(col("value"))).collect().head
    assert(r.getAs[Long]("n_events") == 3)
    assert(r.getAs[Long]("final_balance_cents") == 300)
    assert(r.getAs[Long]("lost_to_floor_cents") == 300)
  }

  test("Eval.cramersV: independent columns give chi2 = 0") {
    val df = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r = Eval.cramersV(df, "a", "b").collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  test("Mixture.unimaxAllocation: tail groups cap, head splits the rest") {
    // caps at 2 epochs: a=20, b=20, c=160; budget = 1.0·Σn = 100.
    // Ascending caps: a capped (20·3 ≤ 100), b capped (20·2+20 ≤ 100),
    // c uncapped → (100 − 40)/1 = 60 → 0.75 epochs.
    val df = (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(80)("c"))
      .toDF("g")
    val got = Mixture.unimaxAllocation(df, "g", lit(1L),
        budgetFrac = 1.0, maxEpochs = 2.0)
      .orderBy("g").as[(String, Long, Boolean, Double, Double)]
      .collect().toSeq
    assert(got == Seq(
      ("a", 10L, true, 20.0, 2.0),
      ("b", 10L, true, 20.0, 2.0),
      ("c", 80L, false, 60.0, 0.75)))
    // Σ alloc = budget when any group is uncapped
    assert(got.map(_._4).sum == 100.0)
    // budget beyond total capacity: every group caps, surplus unallocated
    val all = Mixture.unimaxAllocation(df, "g", lit(1L),
        budgetFrac = 5.0, maxEpochs = 2.0)
      .as[(String, Long, Boolean, Double, Double)].collect()
    assert(all.forall(_._3) && all.map(_._4).sum == 200.0)
  }

  test("Eval.cohensKappa: perfect, chance-level, and partial agreement") {
    val perfect = Seq((0, 0), (1, 1), (2, 2)).toDF("ra", "rb")
    val p = Eval.cohensKappa(perfect, col("ra"), col("rb")).collect().head
    assert(p.getAs[Long]("n_agree") == 3 && p.getAs[Double]("kappa") == 1.0)
    // independent raters: po = pe = 0.5 ⇒ κ = 0
    val chance = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("ra", "rb")
    val c = Eval.cohensKappa(chance, col("ra"), col("rb")).collect().head
    assert(c.getAs[Double]("po") == 0.5 && c.getAs[Double]("pe") == 0.5)
    assert(c.getAs[Double]("kappa") == 0.0)
    // constant raters in full agreement: pe = 1, κ undefined ⇒ NULL
    val const = Seq((1, 1), (1, 1)).toDF("ra", "rb")
    val k = Eval.cohensKappa(const, col("ra"), col("rb")).collect().head
    assert(k.isNullAt(k.fieldIndex("kappa")))
    // NULL ratings (single-annotated items) are excluded
    val withNulls = Seq((Some(1), Some(1)), (Some(1), None), (None, Some(0)))
      .toDF("ra", "rb")
    val w = Eval.cohensKappa(withNulls, col("ra"), col("rb")).collect().head
    assert(w.getAs[Long]("n") == 1)
  }

  test("Sketches.cmsJoinSize: single-key inner product is exact, never under") {
    val a = Seq.fill(3)("k").toDF("ka")
    val b = Seq.fill(4)("k").toDF("kb")
    val r = Sketches.cmsJoinSize(a, "ka", b, "kb").collect().head
    // one key per side ⇒ every depth's inner product is exactly 3·4
    assert(r.getAs[Long]("exact_size") == 12L)
    assert(r.getAs[Long]("est_size") == 12L)
    assert(r.getAs[Double]("rel_err") == 0.0)
    assert(r.getAs[Boolean]("never_under"))
    // multi-key: estimate bounded below by exact (CMS contract)
    val ma = (1 to 50).map(i => s"u${i % 7}").toDF("ka")
    val mb = (1 to 80).map(i => s"u${i % 11}").toDF("kb")
    val m = Sketches.cmsJoinSize(ma, "ka", mb, "kb").collect().head
    assert(m.getAs[Boolean]("never_under"))
    assert(m.getAs[Long]("est_size") >= m.getAs[Long]("exact_size"))
    // disjoint key spaces: exact 0, rel_err undefined ⇒ NULL
    val d = Sketches.cmsJoinSize(
      Seq("x").toDF("ka"), "ka", Seq("y").toDF("kb"), "kb").collect().head
    assert(d.getAs[Long]("exact_size") == 0L)
    assert(d.isNullAt(d.fieldIndex("rel_err")))
  }

  test("Eval.conformalAudit: perfect fit covers everything, halves partition") {
    val df = (1 to 400).map(i => (i.toLong, i.toLong, 2L * i)).toDF("id", "x", "y")
    val r = Eval.conformalAudit(df, col("id"), col("x"), col("y"))
      .collect().head
    // exact linear relation ⇒ zero residuals everywhere
    assert(r.getAs[Double]("qhat") == 0.0)
    assert(r.getAs[Double]("coverage") == 1.0)
    assert(!r.getAs[Boolean]("ok")) // 100% ≠ 90% ± 2% — over-covers
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == 400L)
    // the md5 split is deterministic: same inputs, same halves
    val r2 = Eval.conformalAudit(df, col("id"), col("x"), col("y"))
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }

  test("Profile.populationStability: shifted group scores far above in-family") {
    // g1/g2 dominate the pool and share its shape; the small g3 sits
    // entirely in the top tail (PSI is vs the POOLED corpus, so a big
    // shifted group would drag the reference deciles with it)
    val rows = (1 to 100).map(i => ("g1", i)) ++
      (1 to 100).map(i => ("g2", i)) ++
      (1 to 10).map(i => ("g3", 1000 + i))
    val got = Profile.populationStability(rows.toDF("g", "v"), "g", "v")
      .orderBy("group").as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("g1", "g2", "g3"))
    assert(got.map(_._2) == Seq(100L, 100L, 10L))
    val Seq(psi1, psi2, psi3) = got.map(_._3)
    assert(psi1 == psi2)  // identical distributions, identical score
    assert(psi1 < 0.1)    // in-family: below the first alert band
    assert(psi3 > 1.0)    // wholesale shift blows past the 0.25 band
    assert(psi3 > 10 * psi1)
  }

  // a corpus with genuine near-dup structure for the telemetry tests:
  // 3 template families × 8 mutated copies + 6 unrelated docs
  private def telemetryDocs = {
    val fam = for (f <- 0 until 3; i <- 0 until 8) yield
      (f * 100L + i,
        s"family$f shared body alpha beta gamma delta epsilon zeta " +
          s"eta theta iota kappa copy$i")
    val solo = (0 until 6).map(i =>
      (1000L + i, s"unique$i totally distinct content piece number $i " +
        s"with words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    (fam ++ solo).toDF("doc_id", "text")
  }

  test("Telemetry.mark is the identity when disabled") {
    val df = telemetryDocs
    assert(Telemetry.mark(df, "x") eq df)
  }

  test("Telemetry: observed LSH candidate count matches lshRecallReport") {
    val docs = telemetryDocs
    Telemetry.enable(spark)
    Telemetry.reset()
    try {
      Dedup.minHashLsh(docs, "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .write.format("noop").mode("overwrite").save()
      val observed = Telemetry.await("lsh_candidates")
      assert(observed.nonEmpty, "listener never delivered the metric")
      // same params through the audit path: its n_candidates is the
      // same distinct banded-collision pair count, counted by a
      // separate aggregate — the in-plan observation must agree
      val expected = Dedup.lshRecallReport(docs, "text", "doc_id",
        numHashes = 16, bands = 4, shingleSize = 2, threshold = 0.5)
        .select("n_candidates").head().getLong(0)
      assert(observed.get == expected)
      assert(expected >= 3 * 8 * 7 / 2) // every within-family pair collides
    } finally { Telemetry.disable(); Telemetry.reset(); Dedup.clearCaches() }
  }

  test("Telemetry: observed set-similarity candidates bound the survivors") {
    val docs = telemetryDocs
    Telemetry.enable(spark)
    Telemetry.reset()
    try {
      val survivors = Dedup.setSimilarityJoin(docs, "text", "doc_id",
        shingleSize = 2, threshold = 0.5).count()
      val observed = Telemetry.await("ssj_candidates")
      assert(observed.nonEmpty, "listener never delivered the metric")
      // exactness: every surviving pair was a candidate; the family
      // structure guarantees survivors exist so the bound is non-vacuous
      assert(survivors > 0)
      assert(observed.get >= survivors)
    } finally { Telemetry.disable(); Telemetry.reset(); Dedup.clearCaches() }
  }

  test("Dedup.editDistanceCandidateVolume: exact block-pair count") {
    val docs = telemetryDocs
    val volume = Dedup.editDistanceCandidateVolume(docs, "text", "doc_id",
      blockTokens = 2)
    // brute-force the same blocking in Scala: first-2-token prefix
    val blocks = docs.collect().map { r =>
      r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .take(2).mkString(" ")
    }
    val expected = blocks.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(volume == expected)
    assert(volume == 3L * 8 * 7 / 2) // only family blocks collide
  }

  test("Dedup.semDedupCandidateVolume: single list = all pairs, more lists prune") {
    val emb = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val all = Dedup.semDedupCandidateVolume(emb, "embedding", "vec_id",
      nLists = 1, iters = 1, dims = 8)
    assert(all == 20L * 19 / 2) // one list ⇒ the full pair set
    val pruned = Dedup.semDedupCandidateVolume(emb, "embedding", "vec_id",
      nLists = 4, iters = 2, dims = 8)
    assert(pruned <= all && pruned >= 0)
  }

  test("TextAnalysis.saturationVolume equals the report's gram total") {
    val docs = telemetryDocs
    val volume = TextAnalysis.saturationVolume(docs, "text", n = 3)
    val fromReport = TextAnalysis.saturationReport(docs, "text", "doc_id", n = 3)
      .agg(sum("n_grams")).head().getLong(0)
    assert(volume == fromReport)
    assert(volume > 0)
  }

  test("Dedup.softDedupWeights: hand-computed commonness and weights") {
    // unigrams (n=1): A and B share {x, y} (df 2 each), C has {z, w}
    // (df 1 each), N = 3 docs.
    //   commonness A = B = exp(mean ln(2/3)) = 2/3; C = 1/3
    //   raw = 1/c: 1.5, 1.5, 3 → mean 2 → weights 0.75, 0.75, 1.5
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "z w"))
      .toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "text", "doc_id", n = 1, alpha = 1.0)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 0.666667, 0.75),
      (2L, 2L, 0.666667, 0.75),
      (3L, 2L, 0.333333, 1.5)))
    // alpha = 0 is the identity: every weight exactly 1
    val flat = Dedup.softDedupWeights(docs, "text", "doc_id", n = 1, alpha = 0.0)
      .select("weight").as[Double].collect()
    assert(flat.toSeq == Seq(1.0, 1.0, 1.0))
    // weights are a reallocation, not a budget change: mean stays 1
    val fam = Dedup.softDedupWeights(telemetryDocs, "text", "doc_id", n = 3)
    val meanW = fam.agg(avg("weight")).head().getDouble(0)
    assert(math.abs(meanW - 1.0) < 1e-4)
    // the 8-copy template families are more common than the solo docs
    val byKind = fam.withColumn("kind",
        when(col("doc_id") >= 1000L, "solo").otherwise("family"))
      .groupBy("kind").agg(avg("weight").as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byKind("solo") > byKind("family"))
  }

  test("Similarity IVF index: write/read round-trip preserves the index") {
    val emb = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 1.3 + d * 0.5).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    val idx = Similarity.buildIvfIndex(emb, "embedding", "vec_id",
      nLists = 4, iters = 2, dims = 8)
    Similarity.writeIvfIndex(idx, dir)
    val loaded = Similarity.readIvfIndex(spark, dir)
    // centroids survive bit-exactly (long-format parquet, no rounding)
    assert(loaded.centroids.length == 4)
    assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    // the inverted file: same (id → list) assignment
    val a0 = idx.assigned.select("id", "list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a1 = loaded.assigned.select("id", "list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a0)
    // exhaustive probe on the LOADED index = exact brute-force top-k
    val queries = emb.filter(col("vec_id") < 3)
    val viaIndex = Similarity.ivfKnnIndexed(loaded, queries,
        "embedding", "vec_id", k = 5, nProbe = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank").collect().toSeq
    val brute = Similarity.bruteForceKnn(emb, queries, "embedding", "vec_id",
        k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(viaIndex == brute)
  }

  test("partitioned layout: a filtered read scans ONLY its partition dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
      .toDF("id", "kind", "v")
      .coalesce(1) // one file per partition dir: 3 files total
      .write.mode("overwrite").partitionBy("kind").parquet(dir)
    val pruned = spark.read.parquet(dir).where(col("kind") === "b")
    // execute THIS dataset (a .select would spawn a fresh
    // QueryExecution and leave pruned's scan metrics untouched)
    val rows = pruned.collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(3L))
    // the executed scan's numFiles metric is the files it actually
    // opened — 1 of the 3 proves directory-level pruning (inputFiles
    // would lie here: it lists the relation BEFORE partition pruning)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(pruned.queryExecution.executedPlan).head
    assert(scan.metrics("numFiles").value == 1L)
  }

  test("Linkage.fellegiSunter: hand-scored verdicts, blocking respected") {
    val left = Seq(
      (1L, "alice smith", "555-0001", "blk1"),
      (2L, "bob jones", "555-0002", "blk1"),
      (3L, "carol white", "555-0003", "blk2"))
      .toDF("lid", "name", "phone", "blk")
    val right = Seq(
      (11L, "ALICE SMITH", "555-0001", "blk1"), // true match for 1
      (12L, "bobby jones", "555-0002", "blk1"), // phone-only match for 2
      (13L, "carol white", "999-9999", "blk9")) // blocked away entirely
      .toDF("rid", "name", "phone", "blk")
    val got = Linkage.fellegiSunter(left, right, "lid", "rid",
        blockCols = Seq("blk"),
        comparators = Seq(
          Linkage.Comparator("name",
            lower(col("l.name")) === lower(col("r.name")), 5.0, -2.0),
          Linkage.Comparator("phone",
            col("l.phone") === col("r.phone"), 7.0, -1.0)),
        linkThreshold = 8.0, nonLinkThreshold = 0.0)
      .orderBy("lid", "rid")
      .select("lid", "rid", "score", "verdict")
      .as[(Long, Long, Double, String)].collect().toSeq
    // blk1 pairs only (2×2); blk2/blk9 never meet — blocking is the plan
    assert(got == Seq(
      (1L, 11L, 12.0, "link"),      // both agree: 5 + 7
      (1L, 12L, -3.0, "non_link"),  // both disagree
      (2L, 11L, -3.0, "non_link"),
      (2L, 12L, 5.0, "possible")))  // phone agrees, name off: -2 + 7
    val (aw, dw) = Linkage.weightsFrom(0.9, 0.1)
    assert(math.abs(aw - math.log(9.0)) < 1e-12)
    assert(math.abs(dw - math.log(1.0 / 9.0)) < 1e-12)
  }

  test("Linkage.fellegiSunter: hot-block salting preserves the pair set exactly") {
    import graft.operators.{Linkage, Telemetry}
    // planted hot block: 40×40 = 1600 pairs, far past the 100-pair
    // ceiling; cold block 3×3 = 9 pairs stays on the plain join path
    val left = ((1L to 40L).map(i => (i, s"name$i", "hot")) ++
      (101L to 103L).map(i => (i, s"name$i", "cold"))).toDF("lid", "name", "blk")
    val right = ((1L to 40L).map(i => (i + 1000L, s"name$i", "hot")) ++
      (101L to 103L).map(i => (i + 1000L, s"name${i + 1}", "cold")))
      .toDF("rid", "name", "blk")
    val comparators = Seq(Linkage.Comparator("name",
      col("l.name") === col("r.name"), 4.0, -2.0))
    def run(maxPairs: Long) = Linkage.fellegiSunter(left, right, "lid", "rid",
        Seq("blk"), comparators, linkThreshold = 3.0, nonLinkThreshold = 0.0,
        maxBlockPairs = maxPairs, salt = 4)
      .orderBy("lid", "rid").select("lid", "rid", "score", "verdict")
      .as[(Long, Long, Double, String)].collect().toSeq
    val plain = run(Long.MaxValue) // guard never fires
    val salted = run(100L)         // hot block salted ×4
    assert(salted == plain, "salted pair set must equal the plain join's")
    assert(plain.size == 1609 && plain.count(_._4 == "link") == 42)
    // the telemetry mark counts every candidate pair across both paths
    Telemetry.enable(spark); Telemetry.reset()
    try {
      Linkage.fellegiSunter(left, right, "lid", "rid", Seq("blk"),
        comparators, 3.0, 0.0, maxBlockPairs = 100L, salt = 4)
        .write.format("noop").mode("overwrite").save()
      assert(Telemetry.await("linkage_candidates").contains(1609L))
    } finally { Telemetry.disable(); Telemetry.reset() }
  }

  test("Linkage.fellegiSunter: degenerate blocking (>1000 hot blocks) salts everything, same pairs") {
    import graft.operators.Linkage
    // 1100 blocks, 2×2 rows each — with maxBlockPairs = 1 every block
    // is hot and the bounded hot-key collect overflows, taking the
    // salt-everything branch; the pair set must still be exact
    val left = (0L until 2200L).map(i => (i, s"n${i % 7}", s"b${i % 1100}"))
      .toDF("lid", "name", "blk")
    val right = (0L until 2200L).map(i =>
      (i + 10000L, s"n${(i + 1) % 7}", s"b${i % 1100}")).toDF("rid", "name", "blk")
    val comparators = Seq(Linkage.Comparator("name",
      col("l.name") === col("r.name"), 4.0, -2.0))
    def run(maxPairs: Long) = Linkage.fellegiSunter(left, right, "lid", "rid",
        Seq("blk"), comparators, 3.0, 0.0, maxBlockPairs = maxPairs, salt = 3)
      .orderBy("lid", "rid").select("lid", "rid", "score")
      .as[(Long, Long, Double)].collect().toSeq
    val plain = run(Long.MaxValue)
    val salted = run(1L)
    assert(plain.size == 2200 * 2 && salted == plain)
  }

  test("Graph.incrementalComponents: equals from-scratch CC, touched-only work") {
    // old graph: {1-2-3}, {10-11}, {20-21}; new edges: 3-10 (merges two
    // comps) and 30-31 (brand-new vertices)
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val newE = Seq((3L, 10L), (30L, 31L)).toDF("a", "b")
    val assign = Graph.connectedComponents(oldE, "a", "b")
    val got = Graph.incrementalComponents(assign, "id", "comp", newE, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val full = Graph.connectedComponents(oldE.union(newE), "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == full)
    assert(got.toMap == Map(1L -> 1, 2L -> 1, 3L -> 1, 10L -> 1, 11L -> 1,
      20L -> 20, 21L -> 20, 30L -> 30, 31L -> 30))
    // pass-through proof: an untouched component's rows survive
    // VERBATIM — label 99 is not a min-id (a re-solve would rewrite it
    // to 10), so its presence proves the untouched path never ran CC
    val fake = Seq((10L, 99L), (11L, 99L), (1L, 1L), (2L, 1L))
      .toDF("id", "comp")
    val kept = Graph.incrementalComponents(fake, "id", "comp",
        Seq((2L, 5L)).toDF("a", "b"), "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(kept == Seq((1L, 1L), (2L, 1L), (5L, 1L), (10L, 99L), (11L, 99L)))
  }

  test("Linkage.oneToOne: mutual-best only, deterministic tie-break") {
    import graft.operators.Linkage
    val pairs = Seq(
      // L1's best is R1 (5.0) and R1's best is L1 → mutual, kept
      ("L1", "R1", 5.0), ("L1", "R2", 3.0),
      // L2's best is also R1 (4.0 > its R2 3.5) but R1 prefers L1 →
      // L2 unmatched; R2's best is L2 but L2's best is R1 → R2
      // unmatched too (strict single-pass mutual-best, no re-pairing)
      ("L2", "R1", 4.0), ("L2", "R2", 3.5),
      // L3/L4 tie on R3 at 2.0: ascending-left-id tie-break → L3
      ("L3", "R3", 2.0), ("L4", "R3", 2.0)
    ).toDF("lid", "rid", "score")
    val got = Linkage.oneToOne(pairs, "lid", "rid", "score")
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(got == Set(("L1", "R1"), ("L3", "R3")))
  }

  test("Eval.woeEncode: hand-computed smoothed WOE/IV, zero cell stays finite") {
    import graft.operators.Eval
    // cat A: 3 pos / 1 neg; cat B: 1 pos / 3 neg; cat C: 0 pos / 2 neg
    val df = (Seq.fill(3)(("A", 1)) ++ Seq(("A", 0)) ++
      Seq(("B", 1)) ++ Seq.fill(3)(("B", 0)) ++ Seq.fill(2)(("C", 0)))
      .toDF("cat", "y")
    val got = Eval.woeEncode(df, "cat", col("y"))
      .orderBy("category").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("woe"), r.getAs[Double]("iv_term")))
    // k=3, α=.5: dist1 = (n1+.5)/5.5, dist0 = (n0+.5)/7.5
    def woe(n0: Long, n1: Long) =
      math.log(((n1 + 0.5) / 5.5) / ((n0 + 0.5) / 7.5))
    def iv(n0: Long, n1: Long) =
      (((n1 + 0.5) / 5.5) - ((n0 + 0.5) / 7.5)) * woe(n0, n1)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq(
      ("A", 1L, 3L, r6(woe(1, 3)), r6(iv(1, 3))),
      ("B", 3L, 1L, r6(woe(3, 1)), r6(iv(3, 1))),
      ("C", 2L, 0L, r6(woe(2, 0)), r6(iv(2, 0)))))
    // the zero-positive cell is finite and negative
    assert(got(2)._4 < 0 && !got(2)._4.isInfinite)
  }

  test("Privacy.dpNoisySums: clipping caps sensitivity, noise is the seeded Laplace") {
    import graft.operators.Privacy
    val df = Seq(("g1", -50.0), ("g1", 30.0), ("g1", 500.0),
      ("g2", 10.0)).toDF("g", "v")
    val got = Privacy.dpNoisySums(df, "g", "v", lo = 0d, hi = 100d,
        epsilon = 1.0)
      .orderBy("g").collect()
    // g1 clips to 0 + 30 + 100 = 130
    val g1 = got(0)
    assert(g1.getAs[Double]("clipped_sum") == 130.0)
    assert(g1.getAs[Long]("n") == 3)
    // noisy_sum − clipped_sum == noise (4dp arithmetic)
    got.foreach { r =>
      val d = r.getAs[Double]("noisy_sum") - r.getAs[Double]("clipped_sum")
      assert(math.abs(d - r.getAs[Double]("noise")) < 1e-3)
    }
    // deterministic: same seed, same release
    val again = Privacy.dpNoisySums(df, "g", "v", 0d, 100d, 1.0)
      .orderBy("g").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("Linkage.estimateMU: separates a planted match component, weights consistent") {
    import graft.operators.Linkage
    // 60 planted matches agree on both fields; 940 non-matches agree
    // only by 5% / 20% chance — EM must recover m ≫ u on both
    def md5ish(i: Int, salt: Int) = ((i * 2654435761L + salt) >>> 8) % 100
    val pairs = ((1 to 60).map(i => (true, md5ish(i, 7) < 95)) ++
      (1 to 940).map(i => (md5ish(i, 1) < 5, md5ish(i, 2) < 20)))
      .toDF("agree_a", "agree_b")
    val got = Linkage.estimateMU(pairs, Seq("agree_a", "agree_b"), iters = 25)
      .orderBy("comparator").collect()
    assert(got.length == 2)
    got.foreach { r =>
      val (m, u) = (r.getAs[Double]("m"), r.getAs[Double]("u"))
      assert(m > u, s"${r.getString(0)}: m=$m u=$u")
      // reported weights are exactly the ln-ratios of the reported m/u
      def r6(x: Double) =
        if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
        else -math.floor(-x * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("agree_weight") == r6(math.log(m / u)))
      assert(r.getAs[Double]("disagree_weight") ==
        r6(math.log((1 - m) / (1 - u))))
      val lam = r.getAs[Double]("lam")
      assert(lam > 0.01 && lam < 0.5, s"lam=$lam")
    }
    // deterministic: a second run is bit-identical
    val again = Linkage.estimateMU(pairs, Seq("agree_a", "agree_b"), iters = 25)
      .orderBy("comparator").collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("Layout.cdcApply: latest-wins, delete, insert, resurrect") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z"))
      .toDF("k", "v")
    val changes = Seq(
      (1L, 1L, "U", "a2"),          // update k1
      (2L, 1L, "D", "-"),           // delete k2
      (3L, 1L, "D", "-"), (3L, 2L, "U", "c2"), // delete then resurrect
      (4L, 1L, "I", "d")            // insert new k4
    ).toDF("k", "seq", "op", "v")
    val got = graft.operators.Layout
      .cdcApply(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c2"), (4L, "d"), (9L, "z")))
  }

  test("Mixture.exactStratifiedSplit: exact largest-remainder counts, bucket-invariant") {
    // stratum A: 12 rows → 8/1/1 of 10 ⇒ bases 9/1/1, remainders
    // 6/2/2, one leftover → train gets it ⇒ 10/1/1;
    // stratum B: 20 rows divide exactly ⇒ 16/2/2
    val df = ((1 to 12).map(i => (i.toLong, "A")) ++
      (101 to 120).map(i => (i.toLong, "B"))).toDF("id", "g")
    val splits = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    val got = Mixture.exactStratifiedSplit(df, "id", "g", splits, 10L)
    val counts = got.groupBy("g", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (g, sp, n) => (g, sp) -> n }.toMap
    assert(counts == Map(
      ("A", "train") -> 10L, ("A", "val") -> 1L, ("A", "test") -> 1L,
      ("B", "train") -> 16L, ("B", "val") -> 2L, ("B", "test") -> 2L))
    // every row assigned exactly once
    assert(got.count() == 32 && got.select("id").distinct().count() == 32)
    // the bucketed rank is an implementation detail: a different
    // bucket count must produce the IDENTICAL assignment
    val alt = Mixture.exactStratifiedSplit(df, "id", "g", splits, 10L,
      buckets = 4)
    assert(got.as[(Long, String, String)].collect().toSet ==
      alt.as[(Long, String, String)].collect().toSet)
  }

  test("Events.embargoSplit: purge window users embargoed from test") {
    // span [0, 100] ns → cuts t0 = 60, t1 = 70
    val ev = Seq(
      (1L, 10L, 0L), (2L, 65L, 0L), (3L, 90L, 0L),   // u0: active in gap
      (4L, 20L, 1L), (5L, 80L, 1L),                  // u1: clean → test
      (6L, 0L, 2L), (7L, 100L, 2L),                  // u2: span ends; clean
      (8L, 61L, 3L)                                  // u3: gap only
    ).toDF("event_id", "ts", "user_id")
    val got = Events.embargoSplit(ev, "user_id", "ts")
      .select("event_id", "split").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "train", 2L -> "purged", 3L -> "embargoed",
      4L -> "train", 5L -> "test",
      6L -> "train", 7L -> "test",
      8L -> "purged"))
  }

  test("TextAnalysis.backoffLmScore: seen-bigram / backoff / OOV paths") {
    // train = doc 0 ("a b a b"): uni a:2 b:2, T=4; bi (a,b):2 (b,a):1
    val docs = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.backoffLmScore(docs, "text", "doc_id",
        trainFilter = col("doc_id") % 2 === 0)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // doc 0: u(a)=.5, S(b|a)=1, S(a|b)=.5, S(b|a)=1 → micros
    //   −693147·2 ⇒ avg −0.346573 (half-micro floors toward +inf)
    // doc 1: u(a)=.5; (a,c) unseen ⇒ backoff α·u(c), c OOV ⇒ α²/T=.04
    assert(got == Seq(
      (0L, 4L, 0L, 0L, -0.346573, 1.4142),
      (1L, 2L, 1L, 1L, -1.956011, 7.0711)), s"got $got")
  }

  test("Linkage.blockingQuality: RR from block stats, PC counts drops") {
    // left ids 1..4 blocked by k; right = same ids but id 4's block
    // key drifted ⇒ its true pair falls outside the blocking
    val left = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("lid", "k")
    val right = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("rid", "k")
    val r = Linkage.blockingQuality(left, right, Seq("k"), "lid", "rid")
      .collect().head
    // candidates: block a 2·2 + block b 2·1 = 6 of 16 ⇒ RR = 0.625
    assert(r.getAs[Long]("n_candidates") == 6L)
    assert(r.getAs[Double]("reduction_ratio") == 0.625)
    assert(r.getAs[Long]("n_true") == 4L &&
      r.getAs[Long]("n_retained") == 3L)
    assert(r.getAs[Double]("pair_completeness") == 0.75)
  }

  test("Eval.kruskalWallis: textbook no-tie case H = 2.4") {
    // A = {1, 2}, B = {3, 4} dollars → ranks 1..4, R_A=3 R_B=7:
    // H = 12/20·(9/2 + 49/2) − 15 = 2.4; no ties ⇒ C = 1
    val df = Seq(("A", 1d), ("A", 2d), ("B", 3d), ("B", 4d))
      .toDF("g", "v")
    val r = Eval.kruskalWallis(df, "g", "v").collect().head
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("h") == 2.4)
    assert(r.getAs[Double]("tie_correction") == 1.0)
    assert(r.getAs[Double]("h_adj") == 2.4)
  }

  test("Eval.fdrBH: step-up cut and monotone q-values") {
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.2), (4L, 0.9))
      .toDF("id", "p")
    val got = Eval.fdrBH(df, "id", "p", alpha = 0.25)
      .orderBy("rank")
      .as[(Long, Double, Int, Double, Boolean)].collect().toSeq
    // thresholds .0625/.125/.1875/.25 → ranks 1–2 pass; q-values are
    // bottom-up running mins of m·p/i
    assert(got == Seq(
      (1L, 0.01, 1, 0.04, true), (2L, 0.02, 2, 0.04, true),
      (3L, 0.2, 3, 0.266667, false), (4L, 0.9, 4, 0.9, false)),
      s"got $got")
  }

  test("Eval.huberMean: outlier down-weighted toward the bulk") {
    val df = Seq(("g", 0d), ("g", 0d), ("g", 0d), ("g", 100d))
      .toDF("grp", "v")
    val r = Eval.huberMean(df, "grp", "v", k = 10.0).collect().head
    // mean dragged to 25; three IRLS rounds pull the center to ~3.34
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mean") == 25.0)
    assert(r.getAs[Double]("huber_mean") == 3.3413, s"got $r")
  }

  test("Dedup.semDedup auto: gate-scale ≡ explicit k; two-level finds dups") {
    import graft.operators.Similarity
    // deterministic 8-dim corpus with a planted EXACT duplicate pair
    def vec(i: Int): Seq[Double] =
      (0 until 8).map(d => math.sin(i * 1.37 + d * 0.61) + (i % 5) * 0.2)
    val emb = ((0 until 60).map(i => (i.toLong, vec(i))) :+
      (60L, vec(7))) // 60 duplicates 7 exactly
      .toDF("vec_id", "embedding")
    // small corpus: auto k = max(8, ceil(61/256)) = 8 ⇒ flat path,
    // byte-identical to explicit nLists = 8
    val auto = Dedup.semDedup(emb, "embedding", "vec_id", nLists = 0,
      threshold = 0.95, dims = 8).orderBy("vec_id").collect().toSeq
    val flat = Dedup.semDedup(emb, "embedding", "vec_id", nLists = 8,
      threshold = 0.95, dims = 8).orderBy("vec_id").collect().toSeq
    assert(auto == flat, s"auto=$auto flat=$flat")
    // structural two-level checks: shape, co-listing of identical
    // vectors, list ids in range
    val (coarse, subs) = Similarity.twoLevelCentroids(
      emb, "embedding", "vec_id", nLists = 81, iters = 2, dims = 8)
    assert(coarse.length == 9 && subs.length == 9 &&
      subs.forall(_.length == 9))
    val assigned = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"),
        element_at(Similarity.nearestLists(
          col("embedding"), coarse, 1), 1).as("c"))
      .select(col("vec_id"), (col("c").cast("long") * 9L +
        Similarity.nearestSubList(col("v"), col("c"), subs).cast("long"))
        .as("list"))
      .as[(Long, Long)].collect().toMap
    // identical vectors land in the same list under ANY quantizer
    assert(assigned(7L) == assigned(60L), s"got $assigned")
    assert(assigned.values.forall(l => l >= 0 && l < 81))
    // end-to-end through semDedup's genuine two-level path: 200
    // vectors at targetListSize = 2 ⇒ auto k = 100 > 64 ⇒ two-level;
    // the planted exact duplicate must still be reported
    val emb2 = ((0 until 199).map(i => (i.toLong, vec(i))) :+
      (199L, vec(7))).toDF("vec_id", "embedding")
    val tl = Dedup.semDedup(emb2, "embedding", "vec_id", nLists = 0,
        threshold = 0.999, dims = 8, targetListSize = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(tl.exists(r => r._2 == 199L && r._3 == 7L && r._4 >= 0.999),
      s"got $tl")
  }

  test("TextAnalysis.minKProbScore: bottom-slice floor and OOV tail") {
    // same corpus as the backoff spec; 20% of 4 tokens floors to 0 →
    // n_bottom = max(1, 0) = 1 ⇒ the single worst position
    val docs = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.minKProbScore(docs, "text", "doc_id",
        trainFilter = col("doc_id") % 2 === 0)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 0 worst = ln .5 → −0.693147; doc 1 worst = ln .04 → −3.218876
    assert(got == Seq(
      (0L, 4L, 1L, -0.693147),
      (1L, 2L, 1L, -3.218876)), s"got $got")
  }

  test("Graph.maximalIndependentSet: independent, maximal, stabilizes") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))
      .toDF("a", "b")
    val mis = Graph.maximalIndependentSet(edges, "a", "b", maxRounds = 6)
      .as[Long].collect().toSet
    val adj = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L)
      .flatMap { case (x, y) => Seq(x -> y, y -> x) }
    // independence: no edge inside the set
    assert(!adj.exists { case (x, y) => mis(x) && mis(y) }, s"mis=$mis")
    // maximality: every outside vertex has a neighbor inside
    val all = Set(1L, 2L, 3L, 4L, 5L)
    (all -- mis).foreach { v =>
      assert(adj.exists { case (x, y) => x == v && mis(y) },
        s"$v has no MIS neighbor; mis=$mis")
    }
    // a triangle yields exactly one member
    assert(Set(1L, 2L, 3L).count(mis) == 1)
  }

  test("Privacy.tClosenessAudit: concentrated class 0.5, global-match 0") {
    // X all v0 (4 rows), Y all v1 (4), Z one of each ⇒ global 5/5
    val df = (Seq.fill(4)(("X", 0L)) ++ Seq.fill(4)(("Y", 1L)) ++
      Seq(("Z", 0L), ("Z", 1L))).toDF("cls", "bal")
    val got = Privacy.tClosenessAudit(df, Seq("cls"), col("bal"), t = 0.3)
      .orderBy("cls")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    // X: |4·10−5·4|=20 ⇒ 20/(4·10·1)=0.5; Z: 1·10−5·2=0 ⇒ 0
    assert(got == Seq(("X", 4L, 0.5, true), ("Y", 4L, 0.5, true),
      ("Z", 2L, 0.0, false)), s"got $got")
  }

  test("Similarity.clusterValidity: hand DB/CH on two separated pairs") {
    // label 0: (0,0),(0,2); label 1: (10,0),(10,2) — centroids (0,1)
    // and (10,1); every point sits distance 1 from its centroid so
    // S_i = 1, centroid gap 10 → DB = (1+1)/10 = 0.2; trW = 4,
    // trB = 100, CH = (100/1)/(4/2) = 50
    val df = Seq(
      (1L, Array(0d, 0d), 0), (2L, Array(0d, 2d), 0),
      (3L, Array(10d, 0d), 1), (4L, Array(10d, 2d), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.clusterValidity(
      df, "embedding", "label", "vec_id").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 2)
      assert(r.getAs[Double]("scatter") == 1.0)
      assert(r.getAs[Double]("db_component") == 0.2)
      assert(r.getAs[Double]("db_index") == 0.2)
      assert(r.getAs[Double]("ch_index") == 50.0)
    }
  }

  test("Eval.moodMedian: hand k×2 table against the grand median") {
    // a {1,2,3} b {4,5,6}: doubled grand median 700; above-counts
    // 0 and 3 → χ² = 4·(1.5²/1.5) = 6
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = graft.operators.Eval.moodMedian(df, "g", "v").collect().head
    assert(r.getAs[Long]("k_groups") == 2 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("n_above") == 3)
    assert(r.getAs[Double]("chi2") == 6.0)
  }

  test("Eval.moodMedian: all values equal leaves chi2 NULL") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0)).toDF("g", "v")
    val r = graft.operators.Eval.moodMedian(df, "g", "v").collect().head
    assert(r.getAs[Long]("n_above") == 0)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("Eval.jonckheereTerpstra: hand J and z on ordered groups") {
    // dose 0 {1,2}, dose 1 {3,4}: J = 4, E = 2, Var = 120/72
    val df = Seq((0L, 1.0), (0L, 2.0), (1L, 3.0), (1L, 4.0))
      .toDF("dose", "v")
    val r = graft.operators.Eval.jonckheereTerpstra(df, "dose", "v")
      .collect().head
    assert(r.getAs[Long]("k_groups") == 2 && r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("j_stat") == 4.0)
    val z = 2d / math.sqrt(120d / 72d)
    assert(r.getAs[Double]("z") == math.floor(z * 1e6 + 0.5) / 1e6)
  }

  test("Eval.jonckheereTerpstra: a cross-group tie counts one half") {
    val df = Seq((0L, 1.0), (1L, 1.0)).toDF("dose", "v")
    val r = graft.operators.Eval.jonckheereTerpstra(df, "dose", "v")
      .collect().head
    assert(r.getAs[Double]("j_stat") == 0.5)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("Events.viterbiDecode: hand DP over gap buckets") {
    val HourNs = 3600L * 1000 * 1000 * 1000
    // user 1: obs [1 (first), 0 (30 min), 1 (2 h)] — hand DP keeps
    // the ACTIVE state: dp = (-4142948, -4990246)
    // user 2: single event — init only: (-1714799, -2120264)
    // user 3: obs [1, 2 (2 d gap)] — the long gap flips the argmax to
    // LAPSING: dp = (-4374059, -3324237)
    val df = Seq(
      (1L, 0L, 10L), (1L, HourNs / 2, 11L), (1L, HourNs / 2 + 2 * HourNs, 12L),
      (2L, 0L, 20L),
      (3L, 0L, 30L), (3L, 48L * HourNs, 31L))
      .toDF("user_id", "ts", "event_id")
    val r = graft.operators.Events
      .viterbiDecode(df, "user_id", "ts", "event_id").collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L, 3L))
    assert(r(0).getAs[Long]("n_steps") == 3)
    assert(r(0).getAs[Long]("best_state") == 0)
    assert(r(0).getAs[Long]("best_logprob_micro") == -4142948L)
    assert(r(1).getAs[Long]("n_steps") == 1)
    assert(r(1).getAs[Long]("best_logprob_micro") == -1714799L)
    assert(r(2).getAs[Long]("best_state") == 1)
    assert(r(2).getAs[Long]("best_logprob_micro") == -3324237L)
  }

  test("Events.viterbiDecode: maxLen truncates the sequence") {
    val HourNs = 3600L * 1000 * 1000 * 1000
    val df = Seq((1L, 0L, 10L), (1L, HourNs / 2, 11L),
      (1L, HourNs / 2 + 2 * HourNs, 12L))
      .toDF("user_id", "ts", "event_id")
    val r = graft.operators.Events
      .viterbiDecode(df, "user_id", "ts", "event_id", maxLen = 2)
      .collect().head
    assert(r.getAs[Long]("n_steps") == 2)
    assert(r.getAs[Long]("best_logprob_micro") == -2582300L)
  }

  test("Eval.mannWhitney: hand U and tie-corrected z") {
    // a {10, 20} vs b {10, 30}: U_a = 1.5 (one win + half a tie),
    // T = 6, Var(U) = 4·(60−6)/144 = 1.5, z = −0.5/√1.5
    val df = Seq(("click", 10.0), ("click", 20.0),
      ("view", 10.0), ("view", 30.0)).toDF("g", "v")
    val r = graft.operators.Eval
      .mannWhitney(df, "g", "v", "click", "view").collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("u_a") == 1.5)
    val z = -0.5 / math.sqrt(1.5)
    assert(r.getAs[Double]("z") == -math.floor(-z * 1e6 + 0.5) / 1e6)
  }

  test("Eval.mannWhitney: all-tied samples leave z NULL") {
    val df = Seq(("click", 10.0), ("view", 10.0)).toDF("g", "v")
    val r = graft.operators.Eval
      .mannWhitney(df, "g", "v", "click", "view").collect().head
    assert(r.getAs[Double]("u_a") == 0.5)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("Forecast.pettittDaily: hand U on a level shift") {
    val DayNs = 86400L * 1000 * 1000 * 1000
    // day counts [1, 1, 5, 5]: midranks (1.5, 1.5, 3.5, 3.5) →
    // U = (-2, -4, -2); K = 4 at t = 2, exponent 6·16/80 = 1.2
    val rows = Seq(0L, DayNs) ++
      (0 until 5).map(i => 2 * DayNs + i.toLong) ++
      (0 until 5).map(i => 3 * DayNs + i.toLong)
    val df = rows.map(Tuple1(_)).toDF("ts")
    val r = graft.operators.Forecast.pettittDaily(df, "ts")
      .collect().head
    assert(r.getAs[Long]("n_days") == 4)
    assert(r.getAs[Double]("k_stat") == 4.0)
    assert(r.getAs[Long]("cp_t") == 2)
    assert(r.getAs[Double]("p_exponent") == 1.2)
  }

  test("Eval.ansariBradley: extremes vs centre by hand") {
    // a {.01, .04} owns both extremes of pooled {.01,.02,.03,.04}:
    // scores (1,2,2,1), W = 2, E = 3, Var = 1/3 → z = −√3
    val df = Seq(("click", 0.01), ("click", 0.04),
      ("view", 0.02), ("view", 0.03)).toDF("g", "v")
    val r = graft.operators.Eval
      .ansariBradley(df, "g", "v", "click", "view").collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("w_stat") == 2.0)
    val z = -1d / math.sqrt(1d / 3d)
    assert(r.getAs[Double]("z") == -math.floor(-z * 1e6 + 0.5) / 1e6)
  }

  test("Eval.ansariBradley: a tie run crossing the centre averages position scores") {
    // pooled {1, 2, 2, 3}: scores (1, 2, 2, 1); a = {1, 2} → W = 3 = E
    val df = Seq(("click", 0.01), ("click", 0.02),
      ("view", 0.02), ("view", 0.03)).toDF("g", "v")
    val r = graft.operators.Eval
      .ansariBradley(df, "g", "v", "click", "view").collect().head
    assert(r.getAs[Double]("w_stat") == 3.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("Graph.clusteringCoefficient: triangle plus pendant by hand") {
    // K3 {1,2,3} + pendant (3,4): lcc = 1, 1, 1/3, NULL;
    // wedges = 5, transitivity = 3/5 (edges fed in BOTH directions
    // and duplicated — the op must distinct/undirect them)
    val df = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L), (3L, 4L))
      .toDF("a", "b")
    val r = graft.operators.Graph.clusteringCoefficient(df, "a", "b")
      .collect()
    assert(r.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.map(_.getAs[Long]("degree")).toSeq == Seq(2L, 2L, 3L, 1L))
    assert(r.map(_.getAs[Long]("triangles")).toSeq ==
      Seq(1L, 1L, 1L, 0L))
    assert(r(0).getAs[Double]("lcc") == 1.0)
    assert(r(2).getAs[Double]("lcc") == 0.333333)
    assert(r(3).isNullAt(r(3).fieldIndex("lcc")))
    assert(r(0).getAs[Double]("transitivity") == 0.6)
  }

}
