package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.CorpusRun

/** End-to-end corpus curation ([[graft.pipeline.CorpusRun]]): the composed
  * gate → exact dedup → near dedup → pack → snapshot pipeline over real
  * documents with injected duplicates — the LLM-data twin of EtlRunSpec.
  */
class CorpusRunSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // documents plus: verbatim copies (+20000) and near-dup suffixed copies
  // (+10000) — the q29/q57 injection pattern
  private def corpus = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" trailing marker")).as("text")))
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
  }

  test("curation run: gates, dedups, packs, and snapshots consistently") {
    val wh = Files.createTempDirectory("graft_corpus_wh").toString
    val run = new CorpusRun(spark, wh)
    val report = run.run(corpus, "r1")

    // stage counts only ever shrink
    assert(report.nIngested > report.nGated)
    assert(report.nGated >= report.nExactKept)
    assert(report.nExactKept >= report.nKept)
    assert(report.nKept > 0 && report.nBins > 0)

    val docs = spark.read.parquet(s"$wh/corpus_docs")
    assert(docs.count() === report.nKept)

    // every gated-in doc is english and long enough
    assert(docs.filter(col("lang") =!= "en").count() === 0)
    assert(docs.filter(col("n_tokens") < 20).count() === 0)

    // verbatim duplicates (+20000) that passed the gate must NOT survive:
    // their originals (smaller ids) won the exact-dedup keep rule
    val keptIds = docs.select("doc_id").as[Long].collect().toSet
    val verbatim = keptIds.filter(_ >= 20000)
    assert(verbatim.isEmpty, s"verbatim dups survived: ${verbatim.take(5)}")

    // near-dup suffixed copies (+10000): the pair (orig, copy) must not
    // BOTH survive
    keptIds.filter(id => id >= 10000 && id < 20000).foreach { id =>
      assert(!keptIds.contains(id - 10000), s"near-dup pair intact: $id")
    }

    // manifest reconciles exactly with the snapshot
    val m = spark.read.parquet(s"$wh/corpus_manifest")
    val mRow = m.filter(col("lang") === "en").collect().head
    assert(mRow.getAs[Long]("n_docs") === report.nKept)
    assert(mRow.getAs[Long]("n_bins") === report.nBins)
    assert(mRow.getAs[Long]("n_tokens") ===
      docs.agg(sum("n_tokens")).collect().head.getLong(0))

    // bins: start-offset binning bounds every bin by budget + its largest
    // member (all docs but the last start within one 4096-token span, so
    // sum − max < 4096 is the exact invariant — a fixed 2× bound would
    // flake on any gated doc larger than the budget)
    val binSums = docs.groupBy("lang", "bin")
      .agg(sum("n_tokens").as("s"), max("n_tokens").as("m")).collect()
    binSums.foreach { r =>
      assert(r.getAs[Long]("s") - r.getAs[Int]("m") < 4096,
        s"bin overfilled: $r")
    }

    // docs and manifest must come from the SAME run (the staged-pair
    // commit's visible contract)
    assert(docs.select("run_id").distinct().as[String].collect().toSeq === Seq("r1"))
    assert(m.select("run_id").distinct().as[String].collect().toSeq === Seq("r1"))

    // run log row written
    val log = spark.read.parquet(s"$wh/corpus_run_log")
    assert(log.filter(col("runId") === "r1").count() === 1)
  }

  test("curation is deterministic and snapshot re-runs are idempotent") {
    val wh = Files.createTempDirectory("graft_corpus_wh2").toString
    val r1 = new CorpusRun(spark, wh).run(corpus, "a")
    val ids1 = spark.read.parquet(s"$wh/corpus_docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val sum1 = spark.read.parquet(s"$wh/corpus_manifest")
      .select("checksum").as[String].collect().toSeq.sorted

    val r2 = new CorpusRun(spark, wh).run(corpus, "b")
    val ids2 = spark.read.parquet(s"$wh/corpus_docs")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val sum2 = spark.read.parquet(s"$wh/corpus_manifest")
      .select("checksum").as[String].collect().toSeq.sorted

    assert(r1.nKept === r2.nKept)
    assert(ids1 === ids2)
    assert(sum1 === sum2, "content checksums must be reproducible")
    // two runs logged
    assert(spark.read.parquet(s"$wh/corpus_run_log").count() === 2)
  }
}
