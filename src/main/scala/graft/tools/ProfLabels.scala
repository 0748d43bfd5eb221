package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.ops.Dedup
/** Stage-by-stage timing of the ClusterLabels build at a given sf — the
  * diagnostic behind PERF.md's labels_build_s attribution. MIRRORS
  * ClusterLabels.build stage for stage (keep in sync when that changes);
  * stages re-execute shared subtrees, so the per-stage sum exceeds the
  * fused build time — read it for RELATIVE weight, not absolutes.
  * Usage: runMain graft.tools.ProfLabels [sfDir] */
object ProfLabels {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof-labels] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { run =>
      println(s"--- run $run ---")
      spark.catalog.clearCache()
      val docs = graft.queries.QLlm.docsWithDups(spark, dir)
        .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .cache()
      t("shingle cache")(docs.write.format("noop").mode("overwrite").save())
      val cand = Dedup.lshBandCandidates(docs, neighborWidth = 3)
      t("band candidates")(cand.write.format("noop").mode("overwrite").save())
      val edges = cand
        .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
        .filter(TextOps.jaccard(col("sha"), col("shb")) >= 0.5)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      t("jaccard edges")(edges.write.format("noop").mode("overwrite").save())
      val cc = t("components")(graft.ops.Components.connectedComponents(
        docs.select(col("doc_id").as("id")), edges))
      t("labels window+noop")(cc
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .withColumn("n_members",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .write.format("noop").mode("overwrite").save())
      docs.unpersist()
    }
    spark.stop()
  }
}
