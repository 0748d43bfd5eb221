package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact ONCE at write time so every
  * later equi-join/aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every query and paying the shuffle once at ingest: two tables bucketed
  * by the same key into the same bucket count join with ZERO exchanges
  * (and with `sortBy`, zero sorts) — the SortMergeJoin reads co-located
  * buckets directly. Bucket metadata lives in the session catalog, so
  * writers use `saveAsTable` (not bare parquet paths).
  */
object Bucketing {

  /** Write `df` as a bucketed (+ sorted) table, replacing any previous one. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    nBuckets: Int): Unit = {
    require(!table.contains("."),
      s"writeBucketed takes an unqualified table name, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // with the in-memory catalog a crashed session forgets the table but
    // leaves its directory; clear it or saveAsTable refuses the location.
    // Resolve the location through the catalog (not hand-parsed warehouse
    // conf) and delete via the Hadoop FS of whatever scheme it carries.
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.graft.bridge.defaultTablePath(spark, table))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
    df.write
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Number of shuffle exchanges in the executed plan — 0 for a co-located
    * bucketed join. Exposed for tests/plan audits. */
  def shuffleCount(df: DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(finalPlanString(df)).length

  /** Number of broadcast exchanges in the executed plan. */
  def broadcastCount(df: DataFrame): Int =
    "BroadcastExchange".r.findAllIn(finalPlanString(df)).length

  /** Plan metrics of a query frame INCLUDING lineage-cut subtrees
    * (VERDICT r11 #2): builds the frame under [[Fixpoint.recordingCuts]],
    * counts the consumer plan (post-cut — what a plain audit sees) and
    * adds every recorded pre-cut subtree's counts for the pre-cut totals.
    * Each cut segment is counted exactly once: a later cut's pre-frame
    * plans only back to the previous cut boundary, and a shared cut frame
    * consumed twice executes once. Fixpoint loops that run at build time
    * record one frame per cut round — the pre-cut number is the full
    * work the lineage would carry uncut, deterministic at fixed data.
    *
    * @return (postShuffles, postBroadcasts, preShuffles, preBroadcasts,
    *         nCuts) — pre == post for cut-free queries.
    */
  def cutAwareCounts(build: => DataFrame): (Int, Int, Int, Int, Int) = {
    val (df, cuts) = graft.ops.Fixpoint.recordingCuts(build)
    val (s, b, pS, pB) = cutAwareCountsOf(df, cuts)
    (s, b, pS, pB, cuts.size)
  }

  /** Same metrics for an already-recorded (frame, cut subtrees) pair. */
  def cutAwareCountsOf(df: DataFrame, cuts: Seq[DataFrame]): (Int, Int, Int, Int) = {
    val postS = shuffleCount(df)
    val postB = broadcastCount(df)
    // cut frames that MATERIALIZED during the build (fixpoint convergence
    // probes) carry AQE-finalized plans whose exchange counts reflect
    // runtime broadcast flips — context-dependent. Count each subtree on
    // a FRESH never-executed plan instead: deterministic initial shape.
    val cutPlans = cuts.map(c =>
      org.apache.spark.sql.graft.bridge.freshInitialPlan(c))
    val preS = postS + cutPlans
      .map("Exchange (hash|range)partitioning".r.findAllIn(_).length).sum
    val preB = postB + cutPlans
      .map("BroadcastExchange".r.findAllIn(_).length).sum
    (postS, postB, preS, preB)
  }

  /** The executed-plan tree string with every `== Initial Plan ==` section
    * removed. A subtree that was materialized during frame CONSTRUCTION
    * (a mid-loop lineage cut, a probed cache) renders as a finalized
    * `AdaptiveSparkPlan` printing BOTH its final and its initial plan —
    * counting the raw string then double-counts every exchange in that
    * subtree. The final sections are exactly what executes, so plan
    * metrics count only those. Never-executed plans carry no Initial
    * sections and pass through unchanged. */
  def finalPlanString(df: DataFrame): String = {
    val out = new StringBuilder
    var skip = -1 // tree-indent of the Initial marker while skipping
    df.queryExecution.executedPlan.toString.split('\n').foreach { l =>
      // tree indent = first char that isn't branch decoration; section
      // bodies render strictly deeper than their `+- == ... ==` marker
      val i = l.indexWhere(c => c != ' ' && c != ':')
      val ind = if (i < 0) l.length else i
      if (skip >= 0 && ind > skip) ()
      else {
        skip = if (l.contains("== Initial Plan ==")) ind else -1
        if (skip < 0) out.append(l).append('\n')
      }
    }
    out.toString
  }
}
