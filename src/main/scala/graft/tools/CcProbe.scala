package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.ops.{Components, Dedup}
/** Convergence audit of the labels-build component propagation at a
  * given scale — the diagnostic that caught r8's chain-diameter bug:
  * path-shaped chain clusters made plain neighbor-min propagation
  * exceed any fixed iteration cap at 100× rows (iter=60
  * converged=false), which pointer jumping fixed (iter=7 converged).
  * Usage: runMain graft.tools.CcProbe [sfDir] */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scratch/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.QLlm.docsWithDups(spark, dir)
      .select(col("doc_id"), TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    val edges = Dedup.lshBandCandidates(docs, neighborWidth = 3)
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
      .filter(TextOps.jaccard(col("sha"), col("shb")) >= 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val t0 = System.nanoTime()
    val (_, rep) = Components.connectedComponentsAudited(
      docs.select(col("doc_id").as("id")), edges, maxIter = 60)
    println(s"REPORT iter=${rep.iterations} converged=${rep.converged} " +
      s"nComponents=${rep.nComponents} maxSize=${rep.maxComponentSize} " +
      f"wall=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
