package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.text.TextOps

/** ScalaCheck-generated properties evaluated THROUGH Spark: sample random
  * inputs from Gen, batch them into ONE DataFrame pass, and compare the
  * Column-expression results against a plain-Scala model (per-case forAll
  * would spin up a Spark job per example — batching keeps the suite fast).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word: Gen[String] =
    Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
  private val wordSet: Gen[Set[String]] = Gen.containerOf[Set, String](word)

  test("property: jaccard matches the set model, symmetric, bounded") {
    // collect generated cases first, evaluate them in ONE Spark pass
    val cases = Gen.listOfN(120, Gen.zip(wordSet, wordSet)).sample.get
    val df = cases.map { case (a, b) => (a.toSeq, b.toSeq) }.toDF("a", "b")
      .select(TextOps.jaccard(col("a"), col("b")).as("ab"),
        TextOps.jaccard(col("b"), col("a")).as("ba"))
    val got = df.as[(Double, Double)].collect()
    cases.zip(got).foreach { case ((a, b), (ab, ba)) =>
      val union = (a ++ b).size
      val model = if (union == 0) 0.0 else (a & b).size.toDouble / union
      assert(ab === model, s"jaccard($a, $b)")
      assert(ab === ba, "symmetry")
      assert(ab >= 0.0 && ab <= 1.0, "bounds")
      if (a == b && a.nonEmpty) assert(ab === 1.0, "identity")
    }
  }

  test("property: shingles are always |tokens|-n+1 contiguous n-grams") {
    val doc: Gen[List[String]] = Gen.listOf(word)
    val cases = Gen.listOfN(100, doc).sample.get
    val df = cases.map(ws => Tuple1(ws.mkString(" "))).toDF("text")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    cases.zip(got).foreach { case (ws, sh) =>
      // normText collapses whitespace, so empty docs tokenize to [""]
      val toks = ws.mkString(" ").trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.size < 3) assert(sh.isEmpty)
      else {
        assert(sh.size === toks.size - 2)
        assert(sh === toks.sliding(3).map(_.mkString(" ")).toSeq)
      }
    }
  }

  test("property: minhash signature agreement grows with shingle overlap") {
    // structural property over random docs: sig(A)=sig(A), and for A⊂B
    // with high overlap, agreement(A,B) >= agreement(A,C) for disjoint C
    // on average — checked as an aggregate over the generated corpus
    val base = Gen.listOfN(30, word).sample.get
    val overlapping = base.take(25) ++ Gen.listOfN(5, word).sample.get
    val disjoint = Gen.listOfN(30, word.map(_ + "zq")).sample.get
    val df = Seq(base, overlapping, disjoint)
      .map(ws => Tuple1(ws.mkString(" "))).toDF("text")
      .select(TextOps.minhashFromBase(TextOps.minhashBase(
        TextOps.shingles(TextOps.tokens(col("text")), 2)), 32).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(0), sigs(0)) === 32)
    assert(agree(sigs(0), sigs(1)) > agree(sigs(0), sigs(2)))
  }

  test("property: hamming(simhash) is a metric-ish distance (zero iff same tokens)") {
    val cases = Gen.listOfN(40, Gen.zip(wordSet, wordSet)).sample.get
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val df = cases.map { case (a, b) => (a.toSeq.sorted.mkString(" "), b.toSeq.sorted.mkString(" ")) }
      .toDF("ta", "tb")
      .select(TextOps.simhash(TextOps.tokens(col("ta")), 32).as("ha"),
        TextOps.simhash(TextOps.tokens(col("tb")), 32).as("hb"))
    val got = df.as[(Long, Long)].collect()
    cases.zip(got).foreach { case ((a, b), (ha, hb)) =>
      if (a == b) assert(ha === hb, s"same token set must hash equal: $a")
      assert(java.lang.Long.bitCount(ha ^ hb) <= 32)
    }
  }

  test("property: dupNgramRatio in [0,1); 0 iff all n-grams distinct") {
    val doc: Gen[List[String]] = Gen.listOf(Gen.oneOf("a", "b", "c", "dd"))
    val cases = Gen.listOfN(100, doc).sample.get
    val df = cases.map(ws => Tuple1(ws.mkString(" "))).toDF("text")
      .select(TextOps.dupNgramRatio(TextOps.tokens(col("text")), 2).as("r"))
    val got = df.as[Double].collect()
    cases.zip(got).foreach { case (ws, r) =>
      val toks = ws.mkString(" ").trim.split("\\s+").filter(_.nonEmpty).toSeq
      val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val model = if (grams.isEmpty) 0.0
        else 1.0 - grams.distinct.size.toDouble / grams.size
      assert(math.abs(r - model) < 1e-15, s"doc=$ws")
      assert(r >= 0.0 && r < 1.0 || (r == 0.0 && grams.isEmpty))
    }
  }

  test("property: bm25 is 0 iff no term occurs, monotone in tf at fixed dl") {
    // docs share length 4 so the dl normalization is constant; more
    // occurrences of the query term must strictly increase the score
    val docs = (0 to 4).map(k => (k.toLong, ("hit " * k + "miss " * (4 - k)).trim))
    val out = graft.text.Search.bm25(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), Seq("hit"))
      .as[(Long, Double)].collect().toMap
    assert(out(0L) === 0.0)
    (1 to 4).foreach(k => assert(out(k.toLong) > out(k.toLong - 1),
      s"score must grow with tf ($k)"))
  }

  test("property: PQ codes are valid and ADC with ks=|corpus| is exact L2 on random vectors") {
    import graft.vector.VectorOps
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(8,
      Gen.choose(-1.0f, 1.0f)).map(_.toSeq)
    val vecs = Gen.listOfN(24, vecGen).sample.get.zipWithIndex
      .map { case (v, i) => (i.toLong + 1, v) }
    val df = vecs.toDF("id", "vec")
    val enc = VectorOps.pqEncode(df, m = 4, subDim = 2, ks = 8)
      .as[(Long, Seq[Int])].collect().toMap
    assert(enc.size === vecs.size)
    assert(enc.values.forall(c => c.size === 4 && c.forall(x => x >= 0 && x < 8)))
    // codebook = whole corpus -> ADC distance IS squared L2; model check
    val got = VectorOps.pqAdcTopK(df.filter(col("id") <= 2), df,
        m = 4, subDim = 2, ks = 24, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    def l2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val expected = vecs.take(2).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid).map { case (nid, nv) => (nid, l2(qv, nv)) }
        .sortBy { case (nid, d) => (d, nid) }.take(3).zipWithIndex
        .map { case ((nid, _), r) => (qid, nid, r + 1) }
    }.toSet
    assert(got === expected)
  }

  test("property: JL projection is linear and preserves mean pair distortion") {
    import graft.vector.VectorOps
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(16,
      Gen.choose(-1.0f, 1.0f)).map(_.toSeq)
    val vecs = Gen.listOfN(60, vecGen).sample.get.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val p = vecs.toDF("id", "vec")
      .select(col("id"), VectorOps.jlProject(col("vec"), 8, 16).as("pv"))
      .as[(Long, Seq[Double])].collect().toMap
    // linearity within float/double tolerance: proj(2a) == 2·proj(a)
    val doubled = vecs.map { case (i, v) => (i, v.map(_ * 2.0f)) }
    val p2 = doubled.toDF("id", "vec")
      .select(col("id"), VectorOps.jlProject(col("vec"), 8, 16).as("pv"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (i, _) =>
      p(i).zip(p2(i)).foreach { case (a, b) =>
        assert(math.abs(b - 2.0 * a) < 1e-6, s"linearity at id $i") }
    }
    // mean distortion over consecutive pairs near 1 (JL with k=8: wide net)
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = vecs.sliding(2).collect { case Seq((i, vi), (j, vj)) =>
      val den = vi.zip(vj).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      if (den > 0) Some(l2(p(i), p(j)) / den) else None
    }.flatten.toSeq
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 1.6, s"mean distortion $mean drifted from 1")
  }

  test("property: token entropy bounded by ln(distinct terms)") {
    // uniform over m distinct tokens -> exactly ln(m); skewed -> less
    def h(ps: Seq[Double]): Double = ps.map(p => -p * math.log(p)).sum
    assert(math.abs(h(Seq(0.25, 0.25, 0.25, 0.25)) - math.log(4)) < 1e-12)
    assert(h(Seq(0.75, 0.25)) < math.log(2))
    assert(h(Seq(1.0)) === 0.0)
    // and the registered query respects the bound on real data
    val rows = SparkEntry.queries("q109_token_entropy")(
      spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      val e = r.getAs[Double]("entropy")
      // q109 rounds to 6 decimals, which can nudge past the bound by 5e-7
      assert(e >= 0.0 && e <= math.log(r.getAs[Long]("n_tokens").toDouble) + 5e-7)
    }
  }
}
