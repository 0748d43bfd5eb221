package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Text primitives: normalization, shingling, MinHash (both constructions),
  * LSH banding, SimHash/Hamming, Jaccard, language-ID, quality features.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("ignore").select(c.as("v")).collect().head.getAs[T]("v")

  test("normText lowercases, trims, collapses whitespace") {
    val out = Seq("  Hello   WORLD\t\nfoo ").toDF("t")
      .select(TextOps.normText(col("t"))).as[String].head()
    assert(out === "hello world foo")
  }

  test("shingles: n-grams in order; short docs yield empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("s"))
    val out = df.as[Seq[String]].collect().toSeq
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty)
  }

  test("charNgrams: sliding character windows over normalized text") {
    val df = Seq("AB  cd", "ab").toDF("t")
      .select(TextOps.charNgrams(col("t"), 3).as("g"))
    val out = df.as[Seq[String]].collect().toSeq
    assert(out(0) === Seq("ab ", "b c", " cd"))   // normalized: "ab cd"
    assert(out(1) === Seq.empty)                  // shorter than n
  }

  test("dupNgramRatio: 0 for short/unique docs, exact ratio for repeats") {
    val df = Seq(
      "a b",                    // too short for 2-grams? no — 1 shingle, unique
      "a b a b a b",            // 5 bigrams, 2 distinct -> 1 - 2/5
      "w x y z").toDF("t")
      .select(TextOps.dupNgramRatio(TextOps.tokens(col("t")), 2).as("r"))
    val out = df.as[Double].collect().toSeq
    assert(out(0) === 0.0)
    assert(math.abs(out(1) - (1.0 - 2.0 / 5)) < 1e-15)
    assert(out(2) === 0.0)
  }

  test("identical docs have identical minhash signatures (both constructions)") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps").toDF("t")
      .select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("sh"))
      .select(TextOps.minhash(col("sh"), 16).as("m1"),
        TextOps.minhashFromBase(TextOps.minhashBase(col("sh")), 16).as("m2"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0) === rows(1).getSeq[Long](0))
    assert(rows(0).getSeq[Long](1) === rows(1).getSeq[Long](1))
    assert(rows(0).getSeq[Long](0).length === 16)
    assert(rows(0).getSeq[Long](1).forall(h => h >= 0 && h < TextOps.minhashM))
  }

  test("minhash similarity tracks overlap: near-dup sigs agree more than unrelated") {
    val base = "one two three four five six seven eight nine ten " * 3
    val df = Seq(base, base + " tail marker", "completely different words entirely here now")
      .toDF("t")
      .select(TextOps.minhashFromBase(
        TextOps.minhashBase(TextOps.shingles(TextOps.tokens(col("t")), 3)), 32).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(0), sigs(1)) > agree(sigs(0), sigs(2)))
    assert(agree(sigs(0), sigs(1)) >= 16) // near-dups share most of the sig
  }

  test("lshBands: equal slices collide, band index prefixes prevent cross-band hits") {
    val df = Seq("a b c d e f g h i j", "a b c d e f g h i j").toDF("t")
      .select(TextOps.lshBands(TextOps.minhashFromBase(
        TextOps.minhashBase(TextOps.shingles(TextOps.tokens(col("t")), 2)), 16), 4, 4).as("b"))
    val bands = df.as[Seq[String]].collect()
    assert(bands(0) === bands(1))
    assert(bands(0).length === 4)
    assert(bands(0).map(_.takeWhile(_ != ':')).toSeq === Seq("0", "1", "2", "3"))
  }

  test("jaccard: identical sets 1.0, disjoint 0.0, dedupes inputs") {
    val df = Seq(
      (Seq("a", "b", "a"), Seq("b", "a")),   // same set with dup -> 1.0
      (Seq("a"), Seq("b")),                  // disjoint -> 0.0
      (Seq("a", "b"), Seq("b", "c"))         // 1/3
    ).toDF("x", "y").select(TextOps.jaccard(col("x"), col("y")).as("j"))
    assert(df.as[Double].collect().toSeq === Seq(1.0, 0.0, 1.0 / 3))
  }

  test("simhash: identical docs at Hamming 0; near-dups closer than unrelated") {
    val df = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog again and again"),
      ("d2", "the quick brown fox jumps over the lazy dog again and again"),
      ("d3", "the quick brown fox jumps over the lazy cat again and again"),
      ("d4", "entirely unrelated content about spark catalyst optimizer rules")
    ).toDF("id", "t").select(col("id"), TextOps.simhash(TextOps.tokens(col("t")), 32).as("s"))
    val m = df.as[(String, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("d1"), m("d2")) === 0)
    assert(ham(m("d1"), m("d3")) < ham(m("d1"), m("d4")))
  }

  test("hamming column matches popcount of xor") {
    val df = Seq((0b1011L, 0b0001L)).toDF("a", "b")
      .select(TextOps.hamming(col("a"), col("b"), 16).as("h"))
    assert(df.as[Long].head() === 2L)
  }

  test("langId picks the language with most marker hits; tie -> first code") {
    val df = Seq(
      "the cat is on the mat and a dog",
      "el perro es grande y la casa que",
      "zzz qqq www" // no markers anywhere -> tie at 0 -> 'de' (first code)
    ).toDF("t").select(TextOps.langId(TextOps.tokens(col("t"))).as("l"))
    assert(df.as[String].collect().toSeq === Seq("en", "es", "de"))
  }

  test("qualityFeatures: exact ratios on a known sentence") {
    val feats = TextOps.qualityFeatures(col("t"))
    val df = Seq("the cat sat").toDF("t")
      .select(feats.map { case (n, c) => c.as(n) }: _*)
    val r = df.collect().head
    assert(r.getAs[Int]("n_tokens") === 3)
    assert(r.getAs[Int]("n_chars_norm") === 11)
    assert(r.getAs[Double]("stopword_ratio") === math.round(1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Double]("alpha_ratio") === math.round(9.0 / 11 * 1e6) / 1e6)
    assert(r.getAs[Double]("avg_token_len") === 3.0)
  }
}
