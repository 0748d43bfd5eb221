package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25 scoring and TF-IDF term
  * weighting — the lexical-search half of a training-data pipeline (the
  * other half being the embedding ANN in [[graft.vector.VectorOps]]).
  *
  * Scale shape: for a FIXED query-term set, per-document term frequencies
  * are per-row array expressions (`size(filter(tokens, _ == t))`) — no
  * explode, no shuffle. The corpus statistics (N, total length, per-term
  * document frequencies) reduce to ONE row that broadcasts back onto the
  * scan. The scorer makes TWO narrow passes over the corpus — the stats
  * aggregate and the scoring projection are separate plan subtrees, each
  * re-reading (and re-tokenizing) the scan unless the caller caches the
  * input — and shuffles nothing but the 1-row stats. At 100 TB, accept
  * the second scan (both are pipelined and scan-bound) or checkpoint the
  * tokenized `(doc_id, dl, tf_*)` projection, which is tiny next to the
  * raw text.
  *
  * Float determinism: contributions are summed in FIXED query-term order
  * (an expression chain, not an aggregate), so any engine reproduces the
  * double bit-for-bit up to `ln` (1 ulp) — callers round for comparison.
  */
object Search {

  /** BM25 scores for every document against a fixed bag of query terms.
    *
    * Returns `(doc_id, score)` with one row per input document; `score` is
    * exactly 0.0 iff no query term occurs. Uses the "+1" idf variant
    * (`ln(1 + (N - df + 0.5)/(df + 0.5))`, Robertson–Walker) so idf stays
    * positive even for terms present in most documents.
    *
    * @param docs    corpus; one row per document
    * @param id      document-id column
    * @param text    raw text column (normalized + whitespace-tokenized here)
    * @param terms   distinct query terms (already lower-case)
    */
  def bm25(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "query terms must be non-empty and distinct")
    val tk = TextOps.tokens(text)
    // one narrow pass: doc length + tf per query term, straight off the scan
    val base = docs.select(
      id.as("doc_id") +: size(tk).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(tk, x => x === t)).as(s"tf_$i")
        }: _*)
    // corpus stats: ONE row (N, sum dl, df per term) — broadcast, not shuffle
    val aggs = count(lit(1)).as("n_docs") +: sum("dl").as("sum_dl") +:
      terms.indices.map(i => sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(aggs.head, aggs.tail: _*)

    val scored = base.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val contribs = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl)))
    }
    scored.select(col("doc_id"), contribs.reduce(_ + _).as("score"))
  }

  /** Reciprocal-rank fusion of two rankings (the lexical+vector hybrid
    * merge): `rrf = 1/(c + rank_a) + 1/(c + rank_b)`, a list missing the
    * doc contributing 0. Both inputs are `(doc_id, rnk)` top-k lists —
    * tiny next to the corpus, so the outer join broadcasts; the sum is a
    * FIXED-ORDER two-term expression, deterministic on any engine. */
  def rrfFuse(a: DataFrame, b: DataFrame, c: Int = 60): DataFrame = {
    val la = a.select(col("doc_id"), col("rnk").as("rnk_a"))
    val lb = b.select(col("doc_id"), col("rnk").as("rnk_b"))
    la.join(lb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rnk_a"), col("rnk_b"),
        (coalesce(lit(1.0) / (lit(c) + col("rnk_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rnk_b")), lit(0.0))).as("rrf"))
  }

  /** Top-`k` TF-IDF terms per document over the WHOLE vocabulary.
    *
    * `tfidf = tf · ln(N / df)`. Unlike [[bm25]] (fixed query terms), this
    * explodes the token stream: one shuffle on `(doc_id, term)` for tf, a
    * vocabulary-sized aggregate for df, and a per-document window for the
    * top-k. No global sort anywhere. The df join is left to the planner:
    * natural-language vocabularies broadcast (AQE sees the post-agg size),
    * but a web-scale vocabulary (URLs, typos, numbers) can reach billions
    * of terms, where forcing a broadcast would OOM — the shuffle join on
    * `term` is the correct fallback and Spark picks it from stats.
    */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"),
        col("rnk").cast("int").as("rnk"))
  }
}
