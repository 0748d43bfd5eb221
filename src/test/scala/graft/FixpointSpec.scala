package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Fixpoint

/** Fixpoint.iterate: the checkpoint-every-k wrapper that keeps iterative
  * plans (q131's PageRank shape) bounded when the round count grows. */
class FixpointSpec extends SparkSpec {
  import spark.implicits._

  /** One PageRank-style round: prior ranks referenced exactly once. */
  private def mkStep(ew: DataFrame, nodesNN: DataFrame): DataFrame => DataFrame = {
    prev =>
      val contrib = ew
        .join(prev.select(col("node").as("src"), col("r")), Seq("src"))
        .select(col("dst"), expr("(r * w) div ow").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      nodesNN.join(contrib, nodesNN("node") === contrib("dst"), "left_outer")
        .select(col("node"), col("nn"),
          (expr("(15 * 1000000000000) div (100 * nn)") +
            expr("(85 * coalesce(in_sum, 0L)) div 100")).as("r"))
  }

  private def fixture(): (DataFrame, DataFrame, DataFrame) = {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 1L),
      ("a", "c", 1L), ("d", "a", 3L)).toDF("src", "dst", "w")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    val ow = edges.groupBy("src").agg(sum("w").as("ow"))
    val ew = edges.join(ow, Seq("src"))
    val nn = nodes.agg(count(lit(1)).as("nn"))
    val nodesNN = nodes.crossJoin(broadcast(nn))
    val ranks0 = nodesNN.select(col("node"), col("nn"),
      expr("1000000000000 div nn").as("r"))
    (ew, nodesNN, ranks0)
  }

  test("iterate(n <= checkpointEvery) is plan-identical to the bare loop") {
    val (ew, nodesNN, ranks0) = fixture()
    val step = mkStep(ew, nodesNN)
    var bare = ranks0
    for (_ <- 1 to 8) bare = step(bare)
    val wrapped = Fixpoint.iterate(ranks0, 8, checkpointEvery = 8)(step)
    // no cut fires at n == checkpointEvery, so the optimized plans match
    // (canonicalized: two separately-built plans differ in expression ids)
    assert(wrapped.queryExecution.optimizedPlan.canonicalized ===
      bare.queryExecution.optimizedPlan.canonicalized)
    assert(sortedRows(wrapped) === sortedRows(bare))
  }

  test("25 iterations: same result as the bare loop, bounded plan depth") {
    val (ew, nodesNN, ranks0) = fixture()
    val step = mkStep(ew, nodesNN)
    var bare = ranks0
    for (_ <- 1 to 25) bare = step(bare)
    val wrapped = Fixpoint.iterate(ranks0, 25, checkpointEvery = 8)(step)
    assert(sortedRows(wrapped) === sortedRows(bare))
    // the cut truncates lineage to at most checkpointEvery rounds of plan:
    // the 25-round wrapped plan must be no deeper than ~9 rounds' worth,
    // while the bare plan carries all 25 joins
    def nNodes(df: DataFrame): Int = {
      var n = 0
      df.queryExecution.optimizedPlan.foreach(_ => n += 1)
      n
    }
    val (nb, nw) = (nNodes(bare), nNodes(wrapped))
    assert(nw < nb / 2, s"wrapped plan ($nw nodes) should be far smaller than bare ($nb)")
  }

  test("checkpointEvery must be positive") {
    val (_, _, ranks0) = fixture()
    intercept[IllegalArgumentException] {
      Fixpoint.iterate(ranks0, 3, checkpointEvery = 0)(identity)
    }
  }
}
