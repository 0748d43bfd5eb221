package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Per-run corpus curation summary (the run-log row). */
final case class CorpusReport(runId: String, nIngested: Long, nGated: Long,
                              nExactKept: Long, nKept: Long, nBins: Long,
                              durationMs: Long)

/** The corpus-curation pipeline — the training-data twin of [[EtlRun]]:
  *
  *   ingest raw documents → quality/language/boilerplate gate → exact
  *   dedup (content hash, keep-smallest-id) → near dedup (MinHash-LSH
  *   banding + Jaccard verify, drop the larger id of each pair) → pack
  *   survivors into fixed token-budget bins per language → write a
  *   versioned corpus snapshot + per-language manifest + run log.
  *
  * Every stage is one of the already-oracle-proven operators (q27/q31/
  * q102 gates, q26 exact dedup, q29 near dedup, q59 packing) composed
  * with the same tokenize-ONCE discipline as the q57 flagship; writes use
  * [[EtlRun]]'s staging-swap pattern so a failed run never corrupts the
  * previous snapshot. Scale shape: gates are narrow, dedups shuffle slim
  * keys (hash / band key / id pairs), packing is a per-language window —
  * nothing global, nothing quadratic (band self-join is collision-local).
  */
final class CorpusRun(spark: SparkSession, warehouse: String,
                      minTokens: Int = 20,
                      langs: Seq[String] = Seq("en"),
                      maxDupRatio: Double = 0.3,
                      jaccard: Double = 0.5,
                      binTokens: Long = 4096L) {

  private def path(t: String) = s"$warehouse/$t"

  /** Overwrite-via-staging (same contract as EtlRun's dim writes). */
  private def snapshot(df: DataFrame, name: String): Unit = {
    val staging = path(s"${name}__staging")
    df.write.mode("overwrite").parquet(staging)
    val target = Paths.get(path(name))
    graft.io.Fs.deleteRecursively(target)
    Files.move(Paths.get(staging), target, StandardCopyOption.ATOMIC_MOVE)
    spark.catalog.refreshByPath(path(name))
  }

  /** Run the curation over `docs` (`doc_id` long, `text` string). Returns
    * the report; writes `corpus_docs`, `corpus_manifest`, and appends a
    * `corpus_run_log` row under the warehouse. */
  def run(docs: DataFrame, runId: String): CorpusReport = {
    val t0 = System.currentTimeMillis()
    val nIngested = docs.count()

    // ---- gate: tokenize ONCE; every signal derives from `tk`, and the
    // interpreted langId evaluates once (as a column, not in the filter)
    val gated = docs
      .withColumn("tk", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("tk")))
      .withColumn("lang", TextOps.langId(col("tk")))
      .filter(col("n_tokens") >= minTokens && col("lang").isin(langs: _*) &&
        TextOps.dupNgramRatio(col("tk"), 5) < maxDupRatio)
      .select(col("doc_id"), col("text"), col("tk"), col("n_tokens"), col("lang"))
      .cache()
    val nGated = gated.count()

    // ---- exact dedup: content hash, keep the smallest id --------------
    val keepIds = gated
      .groupBy(md5(concat_ws(" ", col("tk"))).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val exact = gated.join(keepIds, Seq("doc_id"), "left_semi").cache()
    val nExactKept = exact.count()

    // ---- near dedup: banded MinHash candidates, Jaccard-verified ------
    val sh = exact.select(col("doc_id"), TextOps.shingles(col("tk"), 3).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    val keys = sh.select(col("doc_id"), explode(
      TextOps.lshBands(TextOps.minhashFromBase(
        TextOps.minhashBase(col("sh")), 16), 8, 2)).as("band_key"))
    val cand = keys.select(col("band_key"), col("doc_id").as("id_a"))
      .join(keys.select(col("band_key"), col("doc_id").as("id_b")), Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val drop = cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
      .filter(TextOps.jaccard(col("sha"), col("shb")) >= jaccard)
      .select(col("id_b").as("doc_id")).distinct()
    val kept = exact.join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id", "text", "n_tokens", "lang")

    // ---- pack: shard-local token bins (per-language running sum) ------
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = kept.withColumn("bin",
      floor((sum("n_tokens").over(w) - col("n_tokens")) / binTokens.toDouble)
        .cast("long")).cache()

    // ---- write snapshot + manifest + run log --------------------------
    snapshot(packed, "corpus_docs")
    val manifest = packed.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        countDistinct("bin").as("n_bins"),
        // content checksum: order-insensitive fold over per-doc hashes
        md5(concat_ws(",", sort_array(collect_list(
          md5(concat(col("doc_id").cast("string"), lit("|"), col("text")))))))
          .as("checksum"))
      .withColumn("run_id", lit(runId))
    snapshot(manifest, "corpus_manifest")

    val nKept = packed.count()
    val nBins = packed.select("lang", "bin").distinct().count()
    val report = CorpusReport(runId, nIngested, nGated, nExactKept, nKept,
      nBins, System.currentTimeMillis() - t0)
    import spark.implicits._
    val logRow = Seq(report).toDF()
    val logPath = path("corpus_run_log")
    logRow.write.mode("append").parquet(logPath)
    Seq(gated, exact, sh, packed).foreach(_.unpersist())
    report
  }
}
