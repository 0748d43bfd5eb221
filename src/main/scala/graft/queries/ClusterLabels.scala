package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.text.TextOps

/** Near-dup CLUSTER LABELS `(doc_id, cluster_id, n_members)` — the single
  * most expensive subtree in the registry (LSH band self-join + transitive
  * closure). Three registered queries consume it (q72 emits it, q134 splits
  * on it, q154 picks representatives from it); computing it once per
  * consumer tripled that cost across a bench run (VERDICT r4 #5), and at
  * 100 TB the closure over a corpus is exactly the kind of derived table a
  * production pipeline PERSISTS — dedup labels are a pipeline artifact, not
  * a per-query recomputation.
  *
  * So: built ONCE per (JVM, input dir) and materialized to scratch parquet;
  * every later call reads the artifact (plan: a bare parquet scan — no band
  * self-join, no closure). The memo is JVM-local and the scratch dir is
  * freshly created per JVM, so a code change can never serve stale labels
  * across builds. [[graft.Bench]] calls [[reset]] between timed runs so a
  * multi-run bench pays the build exactly once per run (whichever consumer
  * runs first), keeping per-run totals honest.
  */
object ClusterLabels {

  private val memo = scala.collection.concurrent.TrieMap[String, String]()

  /** Drop all memoized materializations (next call rebuilds) AND delete
    * their scratch directories — a multi-run bench resets per run, and at
    * a real scale factor the labels artifact is corpus-sized; leaking one
    * copy per run would fill the temp volume. */
  def reset(): Unit = {
    memo.values.foreach { p =>
      try deleteRec(new java.io.File(p).getParentFile)
      catch { case _: Exception => () } // scratch cleanup is best-effort
    }
    memo.clear()
  }

  private def deleteRec(f: java.io.File): Unit = if (f != null && f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  def apply(s: SparkSession, dir: String): DataFrame = {
    val path = memo.getOrElseUpdate(dir, {
      val out = java.nio.file.Files
        .createTempDirectory("graft_cluster_labels").toString + "/labels"
      build(s, dir, out)
      out
    })
    s.read.parquet(path)
  }

  /** The q72 pipeline: 3-shingles → capped LSH band candidates → Jaccard
    * verify → min-label propagation closure → per-cluster member counts.
    * (Same production band cap as q57 — a no-op on testdata, so the
    * recursive-CTE oracle computes the identical fixpoint.) */
  private def build(s: SparkSession, dir: String, out: String): Unit = {
    val docs = QLlm.docsWithDups(s, dir)
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val edges = Dedup.lshBandCandidates(docs, maxBandSize = 5000)
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
      .filter(TextOps.jaccard(col("sha"), col("shb")) >= 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    graft.ops.Components.connectedComponents(
        docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .write.mode("overwrite").parquet(out)
    docs.unpersist()
  }
}
