package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QLlm.{t, events}

/** Scale-layout and distributed-analytics operators past the curation
  * surface: equi-depth binning off broadcast quantile cuts (the
  * scale-safe global NTILE), exponentially weighted smoothing over
  * aggregate-grain series, degree-oriented triangle counting (the
  * bounded-fan-out distributed graph pattern), and a Morton/Z-order
  * layout key with a per-bucket locality audit (the multi-dimensional
  * data-skipping lever for 100 TB table layout).
  *
  * Same parity discipline as [[QLlm]]/[[QCurate]]: exact integer cents,
  * float reductions as SORTED folds over exactly-representable terms,
  * `round(x, 6)` on every emitted double.
  */
object QScale {

  /** Morton interleave of two `bits`-bit ints as a sum of disjoint bit
    * terms — rendered as SQL text so Spark and DuckDB evaluate the SAME
    * integer arithmetic (`&`, `>>`, `*` on BIGINT). */
  private def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      val px = BigInt(1) << (2 * i); val py = BigInt(1) << (2 * i + 1)
      s"((($x >> $i) & 1) * $px + (($y >> $i) & 1) * $py)"
    }.mkString("(", " + ", ")")

  val all: Seq[Qry] = Seq(

    // GLOBAL equi-depth (quartile) binning — the scale-safe replacement
    // for `ntile(4) OVER (ORDER BY cents)`, which moves every row to ONE
    // task. The cuts come from the bounded histogram-partition operator
    // (graft.ops.Quantiles — state ≤ nBuckets counters, never the
    // values) and ride back over a 1-row broadcast; bin assignment is a
    // narrow compare pipeline, so the only row-count-shaped cost is the
    // scan itself. Bin populations differ from exact NTILE only at cut
    // ties — deterministically, which is what the oracle hash-checks.
    Qry("q149_equidepth_bins",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        val cuts = graft.ops.Quantiles.exactQuantiles(o, Seq.empty, "cents",
            Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
          .select("p25", "p50", "p75")
        o.crossJoin(broadcast(cuts))
          .select(col("o_orderkey"), col("cents"),
            (lit(1)
              + when(col("cents") > col("p25"), 1).otherwise(0)
              + when(col("cents") > col("p50"), 1).otherwise(0)
              + when(col("cents") > col("p75"), 1).otherwise(0)).as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min("cents").as("min_cents"), max("cents").as("max_cents"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |q AS (SELECT quantile_cont(cents, 0.25) AS p25,
        |    quantile_cont(cents, 0.5) AS p50,
        |    quantile_cont(cents, 0.75) AS p75 FROM o)
        |SELECT 1 + CASE WHEN cents > p25 THEN 1 ELSE 0 END
        |         + CASE WHEN cents > p50 THEN 1 ELSE 0 END
        |         + CASE WHEN cents > p75 THEN 1 ELSE 0 END AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM o, q GROUP BY 1""".stripMargin)),

    // exponentially weighted moving average over the DAILY revenue
    // series — trend smoothing with a 14-day horizon and decay 0.5.
    // EWMA's recursive definition doesn't distribute; the bounded-window
    // reformulation does: the day-grain aggregate (the only
    // row-count-shaped pass) self-joins within the horizon, so fan-out
    // is ≤14× of AGGREGATE-grain rows, never raw events. Decay 0.5^lag
    // is an exact power of two and cents fit the mantissa, so every term
    // is exactly representable — the sorted folds then hash-match any
    // engine bit-for-bit.
    Qry("q150_ewma_daily",
      (s, dir) => {
        val d = events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("day_cents"))
        val j = d.as("a").join(d.as("b"),
            col("a.event_type") === col("b.event_type") &&
              datediff(col("a.day"), col("b.day")).between(0, 13))
          .select(col("a.event_type").as("event_type"), col("a.day").as("day"),
            pow(lit(0.5), datediff(col("a.day"), col("b.day"))).as("w"),
            col("b.day_cents").as("c"))
        j.groupBy("event_type", "day")
          .agg(round(
            aggregate(array_sort(collect_list(col("w") * col("c"))),
              lit(0.0d), (acc, x) => acc + x) /
            aggregate(array_sort(collect_list(col("w"))),
              lit(0.0d), (acc, x) => acc + x), 6).as("ewma_cents"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("ewma_cents"))
      },
      Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS day_cents
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.day,
        |    power(0.5, date_diff('day', b.day, a.day)) AS w, b.day_cents AS c
        |  FROM d a JOIN d b ON a.event_type = b.event_type
        |    AND date_diff('day', b.day, a.day) BETWEEN 0 AND 13)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  round(list_reduce(list_prepend(0.0, list_sort(list(w * c))),
        |      (x, y) -> x + y)
        |    / list_reduce(list_prepend(0.0, list_sort(list(w))),
        |      (x, y) -> x + y), 6) AS ewma_cents
        |FROM j GROUP BY 1, 2""".stripMargin)),

    // TRIANGLE COUNTING on the co-purchase graph (parts sharing an
    // order) — the community-density signal behind graph curation. The
    // distributed-safe shape is degree ORIENTATION: each undirected edge
    // points from its (degree, id)-smaller endpoint, so out-degree is
    // O(sqrt(m)) even on power-law graphs and the wedge self-join's
    // fan-out is bounded — the naive adjacency join explodes on hub
    // nodes. Wedges then semi-join the oriented edge set: each triangle
    // counted exactly once. All joins are slim (int, int) frames.
    Qry("q151_triangle_count",
      (s, dir) => {
        val po = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val e = po.as("a").join(po.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("u"), col("b.p").as("v"))
          .distinct().cache()
        val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
          .groupBy("n").agg(count(lit(1)).as("d"))
        val withDeg = e
          .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
          .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
        // orient low-(deg,id) → high-(deg,id)
        val oriented = withDeg.select(
            when(col("du") < col("dv") ||
                 (col("du") === col("dv") && col("u") < col("v")),
              struct(col("u").as("src"), col("v").as("dst")))
              .otherwise(struct(col("v").as("src"), col("u").as("dst")))
              .as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .join(deg.withColumnRenamed("n", "dst").withColumnRenamed("d", "dd"), Seq("dst"))
          .cache()
        val wedges = oriented.as("e1").join(oriented.as("e2"),
            col("e1.src") === col("e2.src") &&
              (col("e1.dd") < col("e2.dd") ||
               (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst"))))
          .select(col("e1.dst").as("src"), col("e2.dst").as("dst"))
        val tri = wedges.join(oriented.select("src", "dst"), Seq("src", "dst"), "left_semi")
        val nodes = deg.agg(count(lit(1)).as("n_nodes"), max("d").as("max_degree"))
        e.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(nodes))
          .crossJoin(broadcast(tri.agg(count(lit(1)).as("n_triangles"))))
          .select(col("n_nodes"), col("n_edges"), col("max_degree"), col("n_triangles"))
      },
      Some("""WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM po a JOIN po b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |orient AS (SELECT
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
        |      THEN e.u ELSE e.v END AS src,
        |    CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
        |      THEN e.v ELSE e.u END AS dst
        |  FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
        |od AS (SELECT o.src, o.dst, d.d AS dd
        |  FROM orient o JOIN deg d ON d.n = o.dst),
        |wedge AS (SELECT e1.dst AS src, e2.dst AS dst
        |  FROM od e1 JOIN od e2 ON e1.src = e2.src
        |    AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
        |tri AS (SELECT count(*) AS n_triangles FROM wedge w
        |  WHERE EXISTS (SELECT 1 FROM orient o
        |    WHERE o.src = w.src AND o.dst = w.dst))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT max(d) FROM deg) AS max_degree,
        |  (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles""".stripMargin)),

    // MORTON/Z-ORDER layout key + locality audit — the layout lever
    // behind multi-dimensional data skipping (OPTIMIZE ZORDER): range-
    // partitioning 100 TB by the interleaved key gives every file a
    // bounded span in EACH dimension, so min/max zone maps prune scans
    // for predicates on either column (a single-column sort only prunes
    // one). The key is pure disjoint-bit integer arithmetic (rendered
    // once, evaluated identically by both engines); the audit buckets
    // rows by the key's top bits and reports per-bucket spans — the
    // quantity a table optimizer would monitor. Narrow pipeline into one
    // 64-group aggregate.
    Qry("q152_zorder_layout",
      (s, dir) => {
        val z = mortonSql("(l_partkey & 1023)", "(l_suppkey & 1023)", 10)
        t(s, dir, "lineitem")
          .selectExpr("l_partkey & 1023 AS x", "l_suppkey & 1023 AS y",
            s"CAST($z AS BIGINT) AS z")
          .groupBy(expr("z >> 14").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
      }, {
        val z = mortonSql("(l_partkey & 1023)", "(l_suppkey & 1023)", 10)
        Some(s"""WITH m AS (SELECT l_partkey & 1023 AS x, l_suppkey & 1023 AS y,
          |    CAST($z AS BIGINT) AS z FROM lineitem)
          |SELECT z >> 14 AS bucket, CAST(count(*) AS BIGINT) AS n,
          |  min(x) AS x_min, max(x) AS x_max,
          |  min(y) AS y_min, max(y) AS y_max
          |FROM m GROUP BY 1""".stripMargin)
      })
  )
}
