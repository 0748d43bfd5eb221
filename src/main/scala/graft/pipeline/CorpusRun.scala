package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Per-run corpus curation summary (the run-log row). */
final case class CorpusReport(runId: String, status: String,
                              nIngested: Long, nGated: Long, nExactKept: Long,
                              nKept: Long, nBins: Long, durationMs: Long)

/** The corpus-curation pipeline — the training-data twin of [[EtlRun]]:
  *
  *   ingest raw documents → quality/language/boilerplate gate → exact
  *   dedup (content hash, keep-smallest-id) → near dedup (MinHash-LSH
  *   banding + Jaccard verify, drop the larger id of each pair) → pack
  *   survivors into fixed token-budget bins per language → write a
  *   versioned corpus snapshot + per-language manifest + run log.
  *
  * Every stage is one of the already-oracle-proven operators (q27/q31/
  * q102 gates, q26 exact dedup, q29 near dedup via
  * [[graft.ops.Dedup.lshBandCandidates]], q59 packing) composed with the
  * same tokenize-ONCE discipline as the q57 flagship. Writes share
  * [[EtlRun]]'s patterns: snapshots swap atomically via
  * [[graft.io.Fs.overwriteViaStaging]]; the run log row is appended LAST
  * and carries success/failed status, and a failure unpersists every
  * cached stage. Scale shape: gates are narrow, dedups shuffle slim keys
  * (hash / band key / id pairs), packing is a per-language window, and
  * the manifest checksum is a commutative XOR fold (O(1) aggregation
  * state per language — never a collect_list of the corpus).
  */
final class CorpusRun(spark: SparkSession, warehouse: String,
                      minTokens: Int = 20,
                      langs: Seq[String] = Seq("en"),
                      maxDupRatio: Double = 0.3,
                      jaccard: Double = 0.5,
                      binTokens: Long = 4096L,
                      maxBandSize: Int = 5000,
                      neighborWidth: Int = 3) {

  private def path(t: String) = s"$warehouse/$t"

  private def logRun(report: CorpusReport): Unit = {
    import spark.implicits._
    Seq(report).toDF().write.mode("append").parquet(path("corpus_run_log"))
    spark.catalog.refreshByPath(path("corpus_run_log"))
  }

  /** Run the curation over `docs` (`doc_id` long, `text` string). Returns
    * the report; writes `corpus_docs`, `corpus_manifest`, and appends a
    * `corpus_run_log` row under the warehouse. A failed run logs a
    * `failed` row (best-effort), releases its caches, and leaves the
    * previous `corpus_docs`/`corpus_manifest` PAIR intact: both outputs
    * stage first and swap back-to-back, and both carry `run_id` so a
    * reader can verify docs and manifest come from the same run. */
  def run(docs: DataFrame, runId: String): CorpusReport = {
    val t0 = System.currentTimeMillis()
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cache(df: DataFrame): DataFrame = { cached += df; df.cache() }
    try {
      val nIngested = docs.count()

      // ---- gate: tokenize ONCE; every signal derives from `tk`, and the
      // interpreted langId evaluates once (as a column, not in the filter)
      val gated = cache(docs
        .withColumn("tk", TextOps.tokens(col("text")))
        .withColumn("n_tokens", size(col("tk")))
        .withColumn("lang", TextOps.langId(col("tk")))
        .filter(col("n_tokens") >= minTokens && col("lang").isin(langs: _*) &&
          TextOps.dupNgramRatio(col("tk"), 5) < maxDupRatio)
        .select(col("doc_id"), col("text"), col("tk"), col("n_tokens"), col("lang")))
      val nGated = gated.count()

      // ---- exact dedup: content hash, keep the smallest id --------------
      val keepIds = gated
        .groupBy(md5(concat_ws(" ", col("tk"))).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val exact = cache(gated.join(keepIds, Seq("doc_id"), "left_semi"))
      val nExactKept = exact.count()

      // ---- near dedup: banded MinHash candidates, Jaccard-verified ------
      val sh = cache(exact.select(col("doc_id"), TextOps.shingles(col("tk"), 3).as("sh"))
        .filter(size(col("sh")) > 0))
      // candidates are chain-bounded (sorted-neighborhood, linear per
      // band) with the band cap kept as a second, independent guard;
      // verify is the hashed-set gate (Dedup.chainVerifiedEdges — equal
      // to string-set Jaccard, and a filter only)
      val drop = graft.ops.Dedup.chainVerifiedEdges(sh,
          neighborWidth = neighborWidth, threshold = jaccard,
          maxBandSize = maxBandSize)
        .select(col("dst").as("doc_id")).distinct()
      val kept = exact.join(drop, Seq("doc_id"), "left_anti")
        .select("doc_id", "text", "n_tokens", "lang")

      // ---- pack: shard-local token bins (per-language running sum) ------
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = cache(kept.withColumn("bin",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / binTokens.toDouble)
          .cast("long")))

      // ---- write snapshot + manifest, log row LAST -----------------------
      // stage BOTH outputs while the jobs run, then swap back-to-back: a
      // failure during either write (including the manifest's) leaves the
      // previous docs/manifest PAIR intact — no torn new-docs/old-manifest
      // state. Both tables carry run_id so readers can verify the pair.
      // n_bins (a distinct count) aggregates SEPARATELY from the
      // count/sum/xor pass: combined, Catalyst plans an Expand that
      // doubles every corpus row through the shuffle — at corpus scale
      // that is the manifest write costing as much as the corpus write
      val manifest = packed
        .withColumn("h", TextOps.hash64(
          concat(col("doc_id").cast("string"), lit("|"), col("text"))))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          // content checksum: commutative XOR of per-doc hashes — order-
          // insensitive and O(1) aggregation state at any corpus size
          expr("bit_xor(h)").cast("string").as("checksum"))
        .join(packed.select("lang", "bin").distinct()
          .groupBy("lang").agg(count(lit(1)).as("n_bins")), Seq("lang"))
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_bins"),
          col("checksum"))
        .withColumn("run_id", lit(runId))
      graft.io.Fs.stageSnapshot(packed.withColumn("run_id", lit(runId)),
        path("corpus_docs"))
      graft.io.Fs.stageSnapshot(manifest, path("corpus_manifest"))
      graft.io.Fs.commitSnapshot(spark, path("corpus_docs"))
      graft.io.Fs.commitSnapshot(spark, path("corpus_manifest"))

      val nKept = packed.count()
      val nBins = packed.select("lang", "bin").distinct().count()
      val report = CorpusReport(runId, "success", nIngested, nGated,
        nExactKept, nKept, nBins, System.currentTimeMillis() - t0)
      logRun(report)
      report
    } catch {
      case e: Throwable =>
        // best-effort: the failure may BE a dead session or unwritable
        // warehouse, in which case the log append throws too — suppress
        // it so the root cause always propagates, never the logging error
        scala.util.Try(logRun(CorpusReport(runId, "failed", -1, -1, -1, -1, -1,
          System.currentTimeMillis() - t0)))
          .failed.foreach(e.addSuppressed)
        throw e
    } finally {
      cached.foreach(_.unpersist())
    }
  }
}
