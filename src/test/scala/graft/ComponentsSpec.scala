package graft

import graft.ops.Components

/** Connected components (min-label propagation) — the transitive-closure
  * step of near-dup dedup clustering (q72).
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain, star, isolated vertex all get min-id labels") {
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // star 10-{11,12}, isolated 20
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 10L))
      .toDF("src", "dst")
    val out = Components.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(out === Set(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("edge orientation does not matter") {
    val verts = Seq(5L, 6L, 7L).toDF("id")
    val fwd = Seq((5L, 6L), (6L, 7L)).toDF("src", "dst")
    val rev = Seq((6L, 5L), (7L, 6L)).toDF("src", "dst")
    assert(sortedRows(Components.connectedComponents(verts, fwd)) ===
      sortedRows(Components.connectedComponents(verts, rev)))
  }

  test("random graphs match a union-find model") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edgeList = Seq.fill(20)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))
        .filter { case (a, b) => a != b }
      // reference model: plain union-find
      val parent = scala.collection.mutable.Map((1L to n).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val expected = (1L to n).map { i =>
        val root = find(i)
        i -> (1L to n).filter(find(_) == root).min
      }.toMap
      val got = Components.connectedComponents(
          (1L to n).toDF("id"), edgeList.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("maxIter bounds the rounds on a long chain") {
    // a 12-vertex chain needs ~11 rounds to fully converge; with
    // maxIter=2 labels must still be a valid PARTIAL propagation
    // (monotone non-increasing, within the component)
    val n = 12L
    val verts = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val full = Components.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(full === (1L to n).map(_ -> 1L).toSet)
    val partial = Components.connectedComponents(verts, edges, maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial.forall { case (id, lbl) => lbl <= id && lbl >= 1L })
  }

  test("audit reports a mega-component and convergence on a dense graph") {
    // deliberately dense: K40 plus 10 isolated vertices — the
    // everything-near-dups-everything pathology. Min-label floods a
    // clique in one round, so this converges fast but the audit must
    // surface the 40-member component the labels alone hide.
    val n = 40L
    val verts = (1L to (n + 10)).toDF("id")
    val edges = (for { a <- 1L to n; b <- (a + 1) to n } yield (a, b))
      .toDF("src", "dst")
    val (labels, report) = Components.connectedComponentsAudited(verts, edges)
    assert(report.converged)
    assert(report.maxComponentSize === n)
    assert(report.nComponents === 11) // the clique + 10 singletons
    assert(labels.filter(s"lbl = 1").count() === n)
  }

  test("pointer jumping converges a 200-vertex path in O(log n) rounds (r8)") {
    // the r8 chain candidates produce PATH-shaped clusters; plain
    // neighbor-min needs diameter-many rounds (measured at 100x rows:
    // 488-member families unconverged after 60). With the per-round
    // label jump the compressed distance roughly doubles each round, so
    // 200 vertices must close well inside 12 rounds.
    val verts = (1L to 200L).toDF("id")
    val edges = (1L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, report) = Components.connectedComponentsAudited(verts, edges, maxIter = 12)
    assert(report.converged, s"200-path needed more than 12 rounds: $report")
    assert(report.nComponents === 1)
    assert(labels.filter("lbl = 1").count() === 200)
  }

  test("audit flags non-convergence when the diameter exceeds maxIter") {
    // a 12-chain needs ~11 propagation rounds; maxIter=3 must report
    // converged=false instead of silently returning partial labels
    val verts = (1L to 12L).toDF("id")
    val edges = (1L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val (_, report) = Components.connectedComponentsAudited(verts, edges, maxIter = 3)
    assert(!report.converged)
    assert(report.iterations === 3)
  }
}
