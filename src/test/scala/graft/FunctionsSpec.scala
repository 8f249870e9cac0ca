package graft

import org.apache.spark.sql.functions._
import graft.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def gtOf(raw: String*): Seq[java.lang.Double] =
    raw.toDF("gt").select(gt2snp($"gt")).as[Option[Double]].collect()
      .map(_.map(Double.box).orNull).toSeq

  test("gt2snp dosage classes match the reference semantics") {
    // hom-ref forms
    assert(gtOf("0/0", "0|0", "0/.", "./0", "0") == Seq(0d, 0d, 0d, 0d, 0d))
    // het forms
    assert(gtOf("0/1", "1/0", "0|1", "1|0", "./1", "1/.", ".|1", "1|.", "1") ==
      Seq(1d, 1d, 1d, 1d, 1d, 1d, 1d, 1d, 1d))
    // hom-alt
    assert(gtOf("1/1", "1|1") == Seq(2d, 2d))
    // missing / multiallelic → NULL
    assert(gtOf("./.", "2/1", ".").forall(_ == null))
  }

  test("gt2snp precedence: ref-containing forms win (reference order)") {
    // "0/." matches the hom-ref alternation before the het one
    assert(gtOf("0/.") == Seq(0d))
  }

  /** Scala-side reimplementation of the dosage recode used as a
    * property-test oracle.
    */
  private def gt2snpRef(x: String): Option[Double] = {
    def hits(p: String) = p.r.findFirstIn(x).isDefined
    if (hits("0/\\.|\\./0|0/0|0\\|0|^0$")) Some(0d)
    else if (hits("0/1|1/0|0\\|1|1\\|0|\\./1|1/\\.|\\.\\|1|1\\|\\.|^1$")) Some(1d)
    else if (hits("1/1|1\\|1")) Some(2d)
    else None
  }

  test("gt2snp property: every diploid GT combination agrees with oracle") {
    val alleles = Seq("0", "1", "2", ".")
    val seps = Seq("/", "|")
    val all = for { a <- alleles; s <- seps; b <- alleles } yield s"$a$s$b"
    val haploid = alleles
    val raw = all ++ haploid
    val got = gtOf(raw: _*)
    val want = raw.map(g => gt2snpRef(g).map(Double.box).orNull)
    assert(got == want)
  }

  test("md5Long is stable and positive") {
    val r = Seq("hello", "a", "").toDF("s")
      .select(md5Long($"s")).as[Long].collect()
    assert(r(0) == 419982666956583591L) // cross-checked against DuckDB
    assert(r.forall(_ >= 0))
  }

  test("tokens / shingles") {
    val r = Seq("The cat, the DOG!").toDF("t")
      .select(tokens($"t")).as[Seq[String]].head
    assert(r == Seq("the", "cat", "the", "dog"))
    val sh = Seq("a b c d").toDF("t")
      .select(wordShingles(tokens($"t"), 2)).as[Seq[String]].head
    assert(sh == Seq("a b", "b c", "c d"))
    val few = Seq("a").toDF("t")
      .select(wordShingles(tokens($"t"), 3)).as[Seq[String]].head
    assert(few.isEmpty)
    val cs = Seq("abcd").toDF("t").select(charShingles($"t", 2)).as[Seq[String]].head
    assert(cs == Seq("ab", "bc", "cd"))
  }

  test("jaccard / cosine / dot") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(jaccard($"x", $"y")).as[Double].head == 0.5)
    val v = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("x", "y")
    assert(v.select(dotProduct($"x", $"y")).as[Double].head == 32.0)
    assert(math.abs(v.select(cosineSimilarity($"x", $"y")).as[Double].head
      - 0.9746318461970762) < 1e-12)
  }

  test("minhash signature: identical sets collide, length k") {
    val df = Seq(
      (1L, Seq("x", "y", "z")), (2L, Seq("z", "y", "x")), (3L, Seq("p", "q")))
      .toDF("id", "s")
    val sigs = df.select($"id", minHashSignature($"s", 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).size == 8)
    assert(sigs(1L) == sigs(2L)) // set semantics: order-insensitive
    assert(sigs(1L) != sigs(3L))
  }

  test("simhash: identical token sets equal; hamming 0/positive") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("b", "a")), (3L, Seq("q", "r", "s")))
      .toDF("id", "s")
    val fp = df.select($"id", simHash($"s", 16).as("f")).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    val d = spark.range(1).select(
      hammingDistance(lit(fp(1L)), lit(fp(3L)))).as[Long].head
    assert(d >= 0 && d <= 16)
  }

  test("normalizeText / fingerprint / emptyToNull") {
    val r = Seq("  Hello,   WORLD!! ").toDF("t")
      .select(normalizeText($"t")).as[String].head
    assert(r == "hello world")
    val n = Seq(("", "x")).toDF("a", "b")
      .select(emptyToNull($"a"), emptyToNull($"b")).as[(Option[String], String)].head
    assert(n == (None, "x"))
  }
}
