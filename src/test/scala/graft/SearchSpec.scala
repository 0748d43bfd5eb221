package graft

import org.apache.spark.sql.functions._
import graft.text.Search

/** BM25 and TF-IDF retrieval ([[graft.text.Search]]) against hand-computed
  * Scala models on a tiny corpus.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry cherry"))

  test("bm25 matches the closed-form model; zero iff no term occurs") {
    val out = Search.bm25(corpus.toDF("doc_id", "text"),
        col("doc_id"), col("text"), Seq("apple", "cherry"))
      .as[(Long, Double)].collect().toMap

    val dls = Map(1L -> 3.0, 2L -> 2.0, 3L -> 4.0)
    val tf = Map(("apple", 1L) -> 2.0, ("cherry", 2L) -> 1.0, ("cherry", 3L) -> 4.0)
    val df = Map("apple" -> 1.0, "cherry" -> 2.0)
    val (n, avgdl, k1, b) = (3.0, 3.0, 1.2, 0.75)
    def model(id: Long): Double = Seq("apple", "cherry").map { t =>
      val f = tf.getOrElse((t, id), 0.0)
      val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
      idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * (dls(id) / avgdl)))
    }.sum

    corpus.foreach { case (id, _) =>
      assert(math.abs(out(id) - model(id)) < 1e-12, s"doc $id")
    }
    assert(out(1L) > 0 && out(2L) > 0 && out(3L) > 0)
    // no-match doc scores exactly 0.0 — the filterable sentinel
    val zero = Search.bm25(Seq((9L, "durian fig")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), Seq("apple")).as[(Long, Double)].head()
    assert(zero._2 === 0.0)
  }

  test("rrfFuse: fixed-order reciprocal sum, full-outer semantics") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rnk")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rnk")
    val out = Search.rrfFuse(a, b).select("doc_id", "rrf")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0 / 61) < 1e-15)            // only list a
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15) // both
    assert(math.abs(out(3L) - 1.0 / 62) < 1e-15)            // only list b
    // both-list doc must outrank either single-list doc here
    assert(out(2L) > out(1L) && out(2L) > out(3L))
  }

  test("tfidfTopTerms ranks corpus-rare terms first, caps at k per doc") {
    val out = Search.tfidfTopTerms(corpus.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 2)
      .select("doc_id", "term", "rnk").as[(Long, String, Int)].collect().toSeq

    assert(out.count(_._1 == 1L) <= 2)
    // doc 1: apple (df=1, tf=2) must outrank banana (df=2, tf=1)
    assert(out.filter(_._1 == 1L).sortBy(_._3).map(_._2) === Seq("apple", "banana"))
    // doc 3 has a single distinct term
    assert(out.filter(_._1 == 3L).map(_._2) === Seq("cherry"))
    // ubiquitous terms (df == N) carry weight ln(1) = 0 but still rank when
    // they are all a doc has — doc 2: cherry (df=2) above banana (df=2)? both
    // df=2 with tf=1 → equal weight, tie broken lexicographically
    assert(out.filter(_._1 == 2L).sortBy(_._3).map(_._2) === Seq("banana", "cherry"))
  }
}
