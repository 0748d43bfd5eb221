package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Cap-engagement evidence at 100× rows (VERDICT r6 next-round #3).
  *
  * The pair-growth families (banded LSH q119/labels-build, SRP buckets
  * q121/q54, prefix-filter tokens q153) grow with CANDIDATE-PAIR count —
  * the exact term their band/bucket/token caps exist to bound — and sf1
  * (10×) is too small to show most caps biting. This tool measures, at
  * each supplied scale, the thing itself:
  *
  *   - per cap site: total keys (bands/buckets/tokens), keys over the
  *     cap, and Σ n·(n−1)/2 candidate pairs BEFORE vs AFTER the cap —
  *     computed from the key-size histogram (slim aggregates; no pair is
  *     ever materialized), so the telemetry is cheap even where the
  *     uncapped join would be quadratic;
  *   - timed runs (min of SPARK_GRAFT_RUNS) of the cap-carrying queries
  *     that stay tractable at 100×: q119 (band cap 2), q121 (bucket cap
  *     12), q153 (scale-aware token cap), q166 (PQ — linear by
  *     construction, the no-cap control). The q134 labels build
  *     (band cap 5000, sized for production boilerplate, NOT for the
  *     replica corpus's deliberate 100-member clusters) is timed only
  *     when SPARK_GRAFT_TIME_LABELS=1 — its telemetry row is always
  *     present and is the evidence that matters: pre-cap pair count vs
  *     what the cap admits.
  *
  * Sub-quadratic proof shape: rows grow K×, pairs_pre grows ~K²×, and
  * pairs_post (what the engine actually joins) grows ≪ pairs_pre — the
  * cap converts quadratic candidate growth back to near-linear work.
  *
  * Usage: runMain graft.tools.CapBench
  *   env: SPARK_GRAFT_BASE_DIR    (default /root/testdata/sf0.1)
  *        SPARK_GRAFT_SCALED_DIR  (default /root/repo/scratch/sf10)
  *        SPARK_GRAFT_RUNS        (default 2, per-query MIN)
  *        SPARK_GRAFT_OUT         (default /root/repo/BENCH_sf10_caps.json)
  *        SPARK_GRAFT_TIME_LABELS (default 0)
  */
object CapBench {

  /** One cap site: the key-size frame (key, n) and the cap to apply.
    * `capOf` receives n_docs so scale-aware caps (q153) stay faithful. */
  private case class Site(name: String, query: String,
                          sizes: (SparkSession, String) => DataFrame,
                          capOf: Long => Long)

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    val scaledDir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/root/repo/scratch/sf10")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_OUT", "/root/repo/BENCH_sf10_caps.json")
    val nRuns = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").trim.toInt)
      .getOrElse(2).max(1)
    val timeLabels = sys.env.getOrElse("SPARK_GRAFT_TIME_LABELS", "0") == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- cap sites (key-size frames mirror the operators exactly) ---
    def bandSizes(s: SparkSession, dir: String): DataFrame =
      graft.queries.QLlm.docsWithDups(s, dir)
        .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"),
          explode(TextOps.minhashBandKeys(col("sh"), 16, 8, 2)).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
    def bucketSizes(s: SparkSession, dir: String): DataFrame =
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .select(graft.vector.VectorOps.srpBucket(col("vec"), 6).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
    def tokenSizes(s: SparkSession, dir: String): DataFrame =
      graft.queries.QLlm.docsWithDups(s, dir)
        .select(col("doc_id"), array_distinct(TextOps.tokens(col("text"))).as("tk"))
        .filter(size(col("tk")) > 0)
        .select(col("doc_id"), explode(col("tk")).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))

    val sites = Seq(
      Site("lsh_bands_cap2", "q119_lsh_banded_cap", bandSizes, _ => 2L),
      Site("lsh_bands_cap5000_labels", "q134_labels_build", bandSizes, _ => 5000L),
      Site("srp_buckets_cap12", "q121_embed_dedup_clusters", bucketSizes, _ => 12L),
      Site("prefix_tokens_scale_cap", "q153_prefix_filter_join", tokenSizes,
        nDocs => math.min(math.max(64L, math.ceil(nDocs * 0.01).toLong), 8192L)))

    def nDocsAt(dir: String): Long =
      graft.queries.QLlm.docsWithDups(spark, dir)
        .filter(size(array_distinct(TextOps.tokens(col("text")))) > 0).count()

    case class Tele(cap: Long, keys: Long, keysOver: Long,
                    pairsPre: Long, pairsPost: Long)
    def telemetry(site: Site, dir: String, nDocs: Long): Tele = {
      val cap = site.capOf(nDocs)
      // pairs from the size histogram only: n·(n−1)/2 per key, never a
      // join (n·(n−1) is even, so the sums stay exact long arithmetic)
      val row = site.sizes(spark, dir)
        .agg(count(lit(1)).as("keys"),
          sum(when(col("n") > cap, 1L).otherwise(0L)).as("over"),
          sum(col("n") * (col("n") - 1)).as("pre2"),
          sum(when(col("n") <= cap, col("n") * (col("n") - 1))
            .otherwise(0L)).as("post2"))
        .head()
      spark.catalog.clearCache()
      Tele(cap, row.getLong(0), row.getLong(1), row.getLong(2) / 2, row.getLong(3) / 2)
    }

    val timedQueries = Seq("q119_lsh_banded_cap", "q121_embed_dedup_clusters",
      "q153_prefix_filter_join", "q166_pq_adc_topk")

    // Pairwise-similarity queries EMIT pairs, so their output (not just
    // their join) grows quadratically in near-dup cluster width; on a
    // corpus whose post-cap candidate count exceeds this bound the timed
    // run is skipped WITH the telemetry as the recorded reason — the
    // telemetry row is the point (it shows exactly the growth that makes
    // label propagation, not pairwise output, the corpus-scale tool).
    val PairBudget = 50000000L
    val pairwiseOf = Map("q153_prefix_filter_join" -> "prefix_tokens_scale_cap",
      "q119_lsh_banded_cap" -> "lsh_bands_cap2",
      "q121_embed_dedup_clusters" -> "srp_buckets_cap12")

    // codegen warmup (same rationale as Bench/ScaleBench)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    timedQueries.foreach { name =>
      try graft.SparkEntry.queries(name)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[capbench] warm $name: $e") }
      finally spark.catalog.clearCache()
    }

    def timeAt(dir: String, skip: Set[String]): Map[String, Double] = {
      val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
      for (run <- 1 to nRuns) {
        timedQueries.filterNot(skip).foreach { name =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[capbench] $dir%-28s $name%-28s $dt%8.2f s (run $run)")
          acc.update(name, math.min(acc.getOrElse(name, Double.MaxValue), dt))
          spark.catalog.clearCache()
        }
        if (timeLabels) {
          graft.queries.ClusterLabels.reset()
          val t0 = System.nanoTime()
          graft.queries.ClusterLabels(spark, dir).write.format("noop")
            .mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[capbench] $dir%-28s labels_build $dt%8.2f s (run $run)")
          acc.update("labels_build", math.min(
            acc.getOrElse("labels_build", Double.MaxValue), dt))
          graft.queries.ClusterLabels.reset()
        }
      }
      acc.toMap
    }

    def f(d: Double): String = f"$d%.3f"
    def sideJson(dir: String): String = {
      val nDocs = nDocsAt(dir)
      val tele = sites.map(s => s -> telemetry(s, dir, nDocs))
      val byName = tele.map { case (s, t) => s.name -> t }.toMap
      val skip = pairwiseOf.collect {
        case (q, siteName) if byName(siteName).pairsPost > PairBudget => q
      }.toSet
      val times = timeAt(dir, skip)
      val tJson = tele.map { case (s, t) =>
        s""""${s.name}":{"query":"${s.query}","cap":${t.cap},""" +
          s""""keys":${t.keys},"keys_over_cap":${t.keysOver},""" +
          s""""pairs_pre_cap":${t.pairsPre},"pairs_post_cap":${t.pairsPost},""" +
          s""""cap_engaged":${t.keysOver > 0}}"""
      }.mkString("{", ",", "}")
      val qJson = times.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
      val skipJson = skip.toSeq.sorted.map(q =>
        s""""$q":"pairwise output exceeds $PairBudget post-cap pairs"""")
        .mkString("{", ",", "}")
      s"""{"dir":"$dir","n_docs":$nDocs,"caps":$tJson,"timed_s":$qJson,""" +
        s""""skipped":$skipJson}"""
    }

    val line = s"""{"metric":"cap_bench","unit":"sec","runs":$nRuns,""" +
      s""""agg":"min","base":${sideJson(baseDir)},""" +
      s""""scaled":${sideJson(scaledDir)}}"""
    println(line)
    val w = new java.io.PrintWriter(outPath); try w.println(line) finally w.close()
    spark.stop()
  }
}
