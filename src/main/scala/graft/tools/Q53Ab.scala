package graft.tools

import org.apache.spark.sql.SparkSession

/** In-JVM alternating A/B of q53's duplicate-occurrence formulations
  * (VERDICT r10 next-round #7): the registered PK-window shape vs the
  * constant-occ union branches (see [[graft.queries.QEtl.q53Frame]]).
  * Alternation inside ONE session means box state hits both sides
  * equally — the same adjudication discipline as tools/ab_bench.py.
  * Also asserts the two formulations are row-identical before timing.
  *
  * Usage: runMain graft.tools.Q53Ab <sfDir> [alternations=3]
  */
object Q53Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val alts = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.QEtl.q53Frame

    // equivalence first: identical multisets both directions at sf0.01
    val eqDir = "/root/testdata/sf0.01"
    val w = q53Frame(spark, eqDir, windowedOcc = true)
    val c = q53Frame(spark, eqDir, windowedOcc = false)
    require(w.exceptAll(c).count() == 0 && c.exceptAll(w).count() == 0,
      "formulations diverge — A/B void")
    println("[q53ab] formulations row-identical at sf0.01")

    // codegen warmup per plan (untimed)
    Seq(true, false).foreach { win =>
      q53Frame(spark, "/root/testdata/sf0.001", win)
        .write.format("noop").mode("overwrite").save()
    }
    val times = Map(true -> collection.mutable.Buffer[Double](),
      false -> collection.mutable.Buffer[Double]())
    for (alt <- 1 to alts; win <- Seq(true, false)) {
      val t0 = System.nanoTime()
      q53Frame(spark, sfDir, win).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(win) += dt
      println(f"[q53ab] alt$alt ${if (win) "windowed" else "constocc"}: $dt%.2f s")
    }
    val minW = times(true).min; val minC = times(false).min
    println(f"[q53ab] RESULT sf=$sfDir windowed=$minW%.2f s constocc=$minC%.2f s " +
      f"ratio=${minC / minW}%.3f (alternations=$alts, min)")
    spark.stop()
  }
}
