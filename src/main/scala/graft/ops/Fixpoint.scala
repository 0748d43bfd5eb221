package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-safe iteration for fixpoint-style operators (PageRank, label
  * propagation, iterative refinement). Two hazards exist when a loop
  * rebinds a DataFrame var:
  *
  *   1. referencing the prior frame MORE than once per round doubles the
  *      subtree each iteration (2^n plan copies) — the caller must keep
  *      the recurrence LINEAR (see q131's nodesNN anchor);
  *   2. even a linear recurrence grows the plan by one join/aggregate
  *      layer per round — fine at 8 rounds, but at 25+ the analyzer/
  *      optimizer cost and codegen depth dominate, and on a cluster the
  *      lineage must be truncated for fault re-computation to stay
  *      bounded.
  *
  * [[iterate]] addresses (2): it runs `step` n times and truncates the
  * lineage every `checkpointEvery` rounds via [[cut]]. The LAST round is
  * never cut (the caller's downstream plan continues from the live
  * frame), so a loop with n <= checkpointEvery produces the exact same
  * plan — and therefore the same result hash — as the bare loop.
  */
object Fixpoint {

  // Plan-audit hook (VERDICT r11 #2): a lineage cut hides its subtree from
  // the consumer's executed plan, so exchange counts on the consumer alone
  // understate the work — a shuffle added INSIDE a cut subtree would pass
  // every plan ceiling silently. While a recorder is installed, cut()
  // also hands the PRE-cut frame to it; audits sum the subtree's plan
  // metrics into "pre-cut" totals. Thread-local so concurrent sessions
  // (test suites) can't cross-record. No recorder installed → zero cost.
  private val recorder =
    new ThreadLocal[scala.collection.mutable.Buffer[DataFrame]]

  /** Run `body` (typically: build one registered query's frame) recording
    * every pre-cut frame that [[cut]] sees on this thread. Returns the
    * body's result plus the recorded frames in call order. Audit-only —
    * never used on the query path. */
  def recordingCuts[T](body: => T): (T, Seq[DataFrame]) = {
    val buf = scala.collection.mutable.Buffer[DataFrame]()
    recorder.set(buf)
    try { val r = body; (r, buf.toList) }
    finally recorder.remove()
  }

  /** Truncate lineage: reliable `checkpoint` when a checkpoint dir is
    * configured (survives executor loss on a cluster); executor-local
    * otherwise (local mode). LAZY in both modes: an eager cut would
    * execute mid-loop jobs at PLAN-BUILD time (a query registry builds
    * frames without running them), and the finalized AQE sections it
    * leaves behind double-render every exchange in later plan audits.
    * The checkpoint materializes with the caller's first action
    * (Components' convergence probe, a query's write) — same
    * fault-tolerance story on a cluster, no build-time side effects.
    * Shared by Components.propagate and every iterative query. */
  def cut(df: DataFrame): DataFrame = {
    Option(recorder.get()).foreach(_ += df)
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
  }

  /** Apply `step` to `init` n times, cutting lineage every
    * `checkpointEvery` rounds (never after the final round). */
  def iterate(init: DataFrame, n: Int, checkpointEvery: Int = 8)
             (step: DataFrame => DataFrame): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    var cur = init
    for (i <- 1 to n) {
      cur = step(cur)
      if (i % checkpointEvery == 0 && i < n) cur = cut(cur)
    }
    cur
  }
}
