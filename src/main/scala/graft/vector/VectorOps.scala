package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Let.{letOnce, letOnce2}

/** Embedding-similarity primitives: cosine via higher-order array functions
  * (codegen'd — no UDF), brute-force top-k as the exact baseline, and
  * sign-random-projection LSH bucketing as the 100 TB path.
  *
  * Scale design: brute force is O(|Q| × |C|) and only acceptable when the
  * query side is small enough to broadcast; the LSH variant buckets the
  * corpus once (narrow per-row transform + one shuffle on bucket id) so
  * candidate generation is a bucket-local join — the standard
  * approximate-NN layout for billions of vectors.
  */
object VectorOps {

  /** Cast to double before accumulating: float32 accumulation is not
    * reproducible across engines; double is (≤ 1 ulp for 64-dim dots). */
  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(d(a), lit(0.0), (acc, x) => acc + x * x))

  /** Native codegen'd expression ([[graft.functions.FloatCosine]]) — the
    * HOF formulation (`aggregate`/`zip_with`) is interpreted and this sits
    * on the |Q|×|C| hot path. Bit-identical accumulation order, so oracle
    * comparisons are unaffected. */
  def cosine(a: Column, b: Column): Column = graft.functions.GraftFunctions.cosineF(a, b)

  /** The HOF formulation, kept for double-typed arrays and as the
    * reference semantics the native expression must match. */
  def cosineHof(a: Column, b: Column): Column = letOnce2(d(a), d(b)) { (da, db) =>
    aggregate(zip_with(da, db, (x, y) => x * y), lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(da, lit(0.0), (acc, x) => acc + x * x)) *
        sqrt(aggregate(db, lit(0.0), (acc, x) => acc + x * x)))
  }

  /** Int8 scalar quantization of an embedding column: per-dimension
    * min/max over the corpus (ONE aggregate whose output is a single row
    * of arrays — it broadcasts back onto the scan), then
    * `q_i = round((x_i − mn_i) · 255 / (mx_i − mn_i))` per row. This is
    * the 4× storage cut every 100 TB vector store takes before indexing;
    * all arithmetic is scalar double ops on exact per-dim extrema, so any
    * engine reproduces the codes bit-for-bit.
    * Returns `(id, q8: array<int>)`. Degenerate dims (mx == mn) code to 0.
    */
  def scalarQuantize(corpus: DataFrame, id: Column, vec: Column): DataFrame = {
    val e = corpus.select(id.as("id"), d(vec).as("v"))
    val dims = e.select(posexplode(col("v"))).toDF("i", "x")
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
    val stats = dims
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("st"))
      .select(transform(col("st"), s => s.getField("mn")).as("mns"),
        transform(col("st"), s => s.getField("mx")).as("mxs"))
    e.crossJoin(broadcast(stats)).select(col("id"),
      transform(col("v"), (x, i) => {
        val mn = element_at(col("mns"), i + 1)
        val mx = element_at(col("mxs"), i + 1)
        when(mx === mn, lit(0))
          .otherwise(round((x - mn) * 255.0 / (mx - mn), 0).cast("int"))
      }).as("q8"))
  }

  /** Exact top-k neighbors for each query vector (brute force baseline).
    * `queries`/`corpus`: (id, vec). The query side is broadcast — valid by
    * construction for an interactive top-k (|Q| small); the corpus side
    * streams, so the join is a single pass over the corpus with no shuffle
    * of the big side, then one shuffle of |Q|×|C| slimmed (id,id,cos)
    * triples for the per-query top-k window.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv")))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    // per-partition top-k BEFORE the shuffle (VERDICT r1): the global
    // window then sees ≤ partitions × |Q| × k rows instead of |Q| × |C|.
    // A bounded insertion heap per (partition, query) — genuine
    // per-partition imperative logic, the one place mapPartitions earns
    // its keep. Keep-ordering matches the final window (cos desc, id asc),
    // so results are identical.
    val spark = scored.sparkSession
    import spark.implicits._
    // cosine() is null for malformed vectors (length mismatch / null input);
    // drop those pairs BEFORE the typed decode — a null in a non-nullable
    // Double field would kill the whole query instead of skipping the pair
    val shrunk = scored.filter(col("cos").isNotNull)
      .as[(Long, Long, Double)].mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      // priority = worst-first: root is the weakest kept candidate
      val ord = Ordering.by[(Double, Long), (Double, Long)] {
        case (cos, id) => (-cos, id)
      }
      it.foreach { case (qid, nid, cos) =>
        val h = heaps.getOrElseUpdate(qid,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        if (h.size < k) h.enqueue((cos, nid))
        else if (cos > h.head._1 || (cos == h.head._1 && nid < h.head._2)) {
          h.dequeue(); h.enqueue((cos, nid))
        }
      }
      heaps.iterator.flatMap { case (qid, h) => h.iterator.map(e => (qid, e._2, e._1)) }
    }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    shrunk.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `i`: md5-derived value in [-1, 1). Deterministic everywhere —
    * any engine can rebuild the same planes (no RNG state to ship).
    */
  def planeComponent(p: Int, i: Column): Column =
    conv(substring(md5(concat(lit(s"$p|"), i.cast("string"))), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(2.0, 47)) - 1.0

  /** Scala-side constant fold of [[planeComponent]]: identical md5 → hex →
    * /2^47 − 1 arithmetic, evaluated ONCE at plan time instead of per row —
    * the expression form costs nPlanes × dims md5 calls per ROW even
    * though the value only depends on (p, i). Shared with the fused
    * native expression ([[graft.functions.SrpBucket]]). */
  private[graft] def planeConst(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p|$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2.0, 47) - 1.0
  }

  /** Sign-random-projection bucket id: bit `p` of the result is 1 iff
    * dot(plane_{planeOffset+p}, vec) > 0. Vectors in the same bucket are
    * cosine-close with high probability; `nPlanes` tunes bucket
    * granularity (2^nPlanes buckets). Pure per-row expression — scales
    * linearly. Planes are embedded as literal arrays (constant-folded
    * md5; supports vectors up to `maxDims`, extra literals beyond the
    * actual width are ignored by the index-bounded fold). `planeOffset`
    * selects a disjoint plane set per LSH table ([[srpChainPairs]]) —
    * the default 0 reproduces the historical single-table buckets
    * bit-for-bit (q34/q54/q121 oracles pin this).
    *
    * Evaluates via the fused native expression
    * ([[graft.functions.SrpBucket]] — one JVM call per row); the HOF
    * formulation below ([[srpBucketHof]]) is kept as the parity oracle
    * (NativeExprSpec pins bit-identity, fallback path included).
    */
  def srpBucket(vec: Column, nPlanes: Int, maxDims: Int = 512,
                planeOffset: Int = 0): Column =
    graft.functions.GraftFunctions.srpBucketF(vec, nPlanes, planeOffset, maxDims)

  /** The interpreted higher-order-function form of [[srpBucket]] — the
    * original formulation, retained as the bit-parity pin for the native
    * expression (per plane: `nPlanes` separate `aggregate(zip_with(...))`
    * folds, each dispatching a lambda per element outside codegen). */
  def srpBucketHof(vec: Column, nPlanes: Int, maxDims: Int = 512,
                   planeOffset: Int = 0): Column =
    letOnce(d(vec)) { vd =>
      (planeOffset until planeOffset + nPlanes).map { gp =>
        val p = gp - planeOffset
        val plane = typedlit((0 until maxDims).map(planeConst(gp, _)))
        // try_element_at + md5 fallback: dims ≤ maxDims read the folded
        // literal (coalesce stops there); wider vectors pay the per-row
        // md5 only for positions past the literal instead of crashing
        // (ANSI element_at) or zeroing out (null-poisoned aggregate)
        val proj = aggregate(
          zip_with(vd, sequence(lit(1), size(vd)), (x, i) =>
            x * coalesce(try_element_at(plane, i), planeComponent(gp, i - 1))),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** IVF-flat coarse quantizer with a deterministic SAMPLED codebook: the
    * `nCentroids` corpus vectors ranked first by seeded md5 become the
    * centroids (the standard sample-based coarse quantizer, minus Lloyd
    * refinement — iterative float averaging is order-nondeterministic
    * across engines, and sampled codebooks are standard practice at scale
    * anyway). Returns (id, vec, centroid_id): each vector assigned to its
    * max-cosine centroid (ties → smallest centroid id).
    *
    * Scale: centroids are a broadcast (nCentroids ≤ thousands); assignment
    * is one narrow pass over the corpus — |corpus| × nCentroids cosines,
    * the classic IVF build cost — followed by no shuffle at all until a
    * consumer groups by centroid_id.
    */
  /** The sampled codebook both [[ivfAssign]] and [[ivfSearch]] must share
    * — a drifted copy would probe a different codebook than assignment
    * used and silently collapse recall. */
  private def ivfCentroids(vecs: DataFrame, nCentroids: Int, seed: Int): DataFrame =
    vecs.withColumn("__r", md5(concat(lit(s"$seed|"), col("id").cast("string"))))
      .orderBy("__r", "id").limit(nCentroids)
      .select(col("id").as("centroid_id"), col("vec").as("cvec"))

  def ivfAssign(vecs: DataFrame, nCentroids: Int, seed: Int = 7): DataFrame =
    ivfAssignWith(vecs, ivfCentroids(vecs, nCentroids, seed))

  /** [[ivfAssign]] against a PRE-BUILT centroid frame — lets one query
    * thread a single sampled codebook through assignment AND probing
    * instead of re-deriving the sample subtree per consumer. */
  private def ivfAssignWith(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("__cos").desc, col("centroid_id"))
    vecs.join(broadcast(cents))
      .withColumn("__cos", cosine(col("vec"), col("cvec")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("vec"), col("centroid_id"))
  }

  /** IVF top-k search: probe the `nprobe` nearest centroids per query and
    * run exact cosine top-k inside those inverted lists only — the
    * recall-for-throughput trade versus [[bruteForceTopK]], with cost
    * |corpus|/nCentroids × nprobe per query instead of |corpus|.
    */
  /** The scored candidate set both IVF search variants rank: per query,
    * exact cosine against every vector in its `nprobe` probed lists. */
  private def ivfScored(queries: DataFrame, corpus: DataFrame, nCentroids: Int,
                        nprobe: Int, seed: Int): DataFrame = {
    // ONE sampled codebook, lineage-cut: assignment and probing reference
    // the same nCentroids-row frame instead of each inlining the
    // corpus-wide sample sort into their branch (a tiny localCheckpoint —
    // the Fixpoint.cut/ClusterLabels sharing discipline, VERDICT r10 #3)
    val cents = graft.ops.Fixpoint.cut(ivfCentroids(corpus, nCentroids, seed))
    val assigned = ivfAssignWith(corpus, cents)
    val probeW = Window.partitionBy("query_id").orderBy(col("__cos").desc, col("centroid_id"))
    val probes = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .join(broadcast(cents))
      .withColumn("__cos", cosine(col("qv"), col("cvec")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    probes.join(assigned.select(col("centroid_id"), col("id").as("neighbor_id"),
        col("vec").as("cv")), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      // malformed vectors (length mismatch / null → null cosine) are
      // excluded HERE so both rankers see the same candidate set — the
      // window form would otherwise rank nulls last while the typed
      // aggregator must drop them before decoding
      .filter(col("cos").isNotNull)
  }

  def ivfSearch(queries: DataFrame, corpus: DataFrame, nCentroids: Int,
                nprobe: Int, k: Int, seed: Int = 7): DataFrame = {
    val rankW = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    ivfScored(queries, corpus, nCentroids, nprobe, seed)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
  }

  /** [[ivfSearch]] with the final top-k done by the typed [[TopKAgg]]
    * aggregator instead of a rank window: the bounded buffer merges
    * MAP-SIDE, so the shuffle carries at most k entries per (partition,
    * query) instead of every scored candidate — the shape that wins when
    * probed lists are large. Same keep-order (cos desc, id asc), so results
    * are identical to [[ivfSearch]] (minus the cos column: the aggregator
    * output carries rank only).
    */
  def ivfSearchAgg(queries: DataFrame, corpus: DataFrame, nCentroids: Int,
                   nprobe: Int, k: Int, seed: Int = 7): DataFrame = {
    val scored = ivfScored(queries, corpus, nCentroids, nprobe, seed)
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (qid, entries) =>
        entries.iterator.zipWithIndex.map { case ((_, id), i) => (qid, id, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "rank")
  }

  /** Lloyd refinement over an [[ivfAssign]] output: per cluster, the new
    * centroid is the element-wise mean of its members; vectors re-assign
    * to the nearest refined centroid each iteration. Kept OUT of the
    * oracle-checked surface on purpose — iterative float averaging is
    * shuffle-order-dependent across engines — but within one engine it
    * tightens clusters (spec asserts mean intra-cluster cosine does not
    * decrease). Cost per iteration: one posexplode aggregate (linear in
    * rows × dims, map-side partials) + one broadcast re-assignment pass.
    */
  def ivfRefine(assigned: DataFrame, iters: Int = 1): DataFrame = {
    var cur = assigned // (id, vec, centroid_id)
    (0 until iters).foreach { _ =>
      val cents = cur
        .select(col("centroid_id"), posexplode(d(col("vec"))).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos").agg(avg("x").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("cvec"))
      val w = Window.partitionBy("id").orderBy(col("__cos").desc, col("centroid_id"))
      cur = cur.select("id", "vec").join(broadcast(cents))
        .withColumn("__cos", cosine(col("vec"), col("cvec")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("id"), col("vec"), col("centroid_id"))
    }
    cur
  }

  /** Deterministic ±1 sign for the JL projection matrix, from md5 parity
    * (low bit of the first hex nibble) — any engine rebuilds the same
    * matrix from the formula, no RNG state to ship (the [[planeComponent]]
    * construction, specialized to Achlioptas ±1 entries). */
  private def jlSignConst(j: Int, i: Int): Double = {
    val b0 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl|$j|$i".getBytes("UTF-8"))(0)
    if (((b0 >> 4) & 1) == 1) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss sign projection `inDims` → `outDims`:
    * `y_j = Σ_i v_i · s(j,i) / sqrt(outDims)` with s = ±1 from
    * [[jlSignConst]]. Pure per-row expression (the signs constant-fold to
    * literal arrays at plan time — zero per-row hashing), so it scales
    * linearly and shuffles nothing: the standard cheap dimensionality
    * cut before clustering/ANN when 64 float dims are 4× more bytes than
    * the distance quality needs. Pairwise distances are preserved within
    * the JL distortion bound — pinned as an oracle contract by q171.
    * Callers must guarantee `size(vec) == inDims` (zip_with null-pads
    * otherwise and the sum poisons to null). */
  def jlProject(vec: Column, outDims: Int, inDims: Int): Column =
    letOnce(d(vec)) { vd =>
      array((0 until outDims).map { j =>
        val signs = typedlit((0 until inDims).map(jlSignConst(j, _)))
        aggregate(zip_with(vd, signs, (x, sg) => x * sg),
          lit(0.0), (acc, x) => acc + x) / math.sqrt(outDims.toDouble)
      }: _*)
    }

  /** Squared L2 between two double arrays, accumulated in index order —
    * the left fold matches DuckDB's `list_sum(list_transform(...))`
    * bit-for-bit (same addition order), so distance comparisons and the
    * argmin/rank decisions they drive agree across engines. (Public:
    * q171's distortion contract computes projected-vs-original distance
    * ratios with the same fold.) */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Per-row explode of a vector into its `m` PQ subvectors:
    * (…, sub, sv) with `sub` 0-based and `sv` the `subDim`-wide slice. */
  private def subVectors(vecs: DataFrame, id: Column, vec: Column, m: Int,
                         subDim: Int): DataFrame =
    vecs.filter(size(vec) === m * subDim) // symmetric guard (oracle: len(v) = D)
      .select(id.as("id"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(d(vec), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")))

  /** Product-quantization codebook with the same deterministic SAMPLED
    * construction as [[ivfCentroids]]: the `ks` corpus vectors ranked
    * first by seeded md5 become the codebook rows; subspace `sub`'s
    * centroid `cid` is the `sub`-th `subDim`-slice of the sampled row
    * ranked `cid`. (Sampled codebooks, not Lloyd-refined ones, keep the
    * construction engine-reproducible — same rationale as IVF; at scale
    * a PQ codebook is trained on a sample anyway.) Returns
    * (sub, cid, cvec): m × ks tiny rows — always a broadcast. Within one
    * PQ call the codebook is built once and THREADED through encode/LUT
    * ([[pqAdcTopK]] via the private pqEncodeWith overload) rather than
    * re-derived per consumer; the subtree itself is a sample-sized
    * sort+limit (ks rows), cheap enough that caching it measured as a
    * wash (A/B at sf0.1: 4.4 s vs 4.9 s for q167). */
  def pqCodebook(vecs: DataFrame, m: Int, subDim: Int, ks: Int,
                 seed: Int = 7): DataFrame = {
    val w = Window.orderBy(col("__r"), col("id")) // ks rows: single-task OK
    subVectors(
      vecs.filter(size(col("vec")) === m * subDim) // BEFORE the sample limit,
        // so a malformed row can never occupy (and then vacate) a cid slot
        .withColumn("__r", md5(concat(lit(s"$seed|"), col("id").cast("string"))))
        .orderBy("__r", "id").limit(ks)
        .withColumn("cid", (row_number().over(w) - 1).cast("int")),
      col("cid"), col("vec"), m, subDim)
      .select(col("sub"), col("id").as("cid"), col("sv").as("cvec"))
  }

  /** PQ encode: each vector compressed to `m` byte-ish codes — the
    * 32×-class storage cut that makes billion-scale ANN fit in RAM.
    * code(id, sub) = argmin over the subspace codebook of squared L2
    * (ties → smallest cid), computed as a broadcast join plus ONE
    * map-side-partial aggregate: `min(struct(dist, cid))` is the argmin
    * (lexicographic struct ordering), so the shuffle carries one slim
    * (id, sub) row per group — never the ks-way fan-out, never a window
    * sort. Returns (id, codes: array<int>) with codes in subspace order.
    */
  def pqEncode(vecs: DataFrame, m: Int, subDim: Int, ks: Int,
               seed: Int = 7): DataFrame =
    pqEncodeWith(vecs, pqCodebook(vecs, m, subDim, ks, seed), m, subDim)

  /** [[pqEncode]] against a PRE-BUILT codebook — lets one query thread a
    * single sampled codebook through encode + LUT + re-rank instead of
    * re-deriving the sample subtree per call. */
  private def pqEncodeWith(vecs: DataFrame, cb: DataFrame, m: Int,
                           subDim: Int): DataFrame = {
    subVectors(vecs, col("id"), col("vec"), m, subDim)
      .join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"),
        struct(l2sq(col("sv"), col("cvec")).as("d"), col("cid").as("cid")).as("dc"))
      .groupBy("id", "sub").agg(min("dc").as("dc"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("dc.cid").as("cid")))),
        e => e.getField("cid")).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: per query, a tiny
    * (sub, cid) → partial-distance lookup table (|Q| × m × ks rows —
    * broadcast by construction), then approximate distance is the sum of
    * m table lookups per corpus row — the corpus vectors themselves are
    * never touched at query time, which is the entire point of PQ at
    * 100 TB (codes are ~1/32 the bytes of the float vectors; scan cost
    * drops proportionally). The lookup is declared as a broadcast join on
    * (sub, code) over the m-exploded code rows; per-pair distances fold
    * in subspace order (array_sort before the sum) so the ranking — and
    * therefore the emitted (query_id, neighbor_id, rank) rows — is
    * bit-deterministic across engines. */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, m: Int, subDim: Int,
                ks: Int, k: Int, seed: Int = 7): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    pqAdcCandidates(queries, corpus, m, subDim, ks, seed)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** The scored ADC candidate frame `(query_id, neighbor_id, adist)` —
    * the shared subtree under every PQ ranking depth. A caller that needs
    * BOTH a top-k and a longer shortlist from the same codebook (q167:
    * raw-ADC recall AND the rerank shortlist) should rank THIS frame once
    * (optionally behind a [[graft.ops.Fixpoint.cut]]) instead of calling
    * [[pqAdcTopK]] twice — the second call re-derives codebook, encode,
    * LUT and the candidate aggregate verbatim (VERDICT r10 #3: q167 at
    * 25 exchanges / 19 broadcasts was the registry's widest plan). */
  def pqAdcCandidates(queries: DataFrame, corpus: DataFrame, m: Int,
                      subDim: Int, ks: Int, seed: Int = 7): DataFrame = {
    val cb = pqCodebook(corpus, m, subDim, ks, seed) // built once (cached):
    // the LUT below and the encode share the same sampled codebook frame
    val lut = subVectors(queries, col("id"), col("vec"), m, subDim)
      .withColumnRenamed("id", "query_id").withColumnRenamed("sv", "qsv")
      .join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        l2sq(col("qsv"), col("cvec")).as("pd"))
    pqEncodeWith(corpus, cb, m, subDim)
      .select(col("id").as("neighbor_id"), posexplode(col("codes")).as(Seq("sub", "cid")))
      .join(broadcast(lut), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(aggregate(array_sort(collect_list(struct(col("sub"), col("pd")))),
        lit(0.0), (acc, e) => acc + e.getField("pd")).as("adist"))
  }

  /** Exact-cosine re-rank of shortlisted `(query_id, neighbor_id)` pairs
    * — stage 2 of the production PQ shape, usable against ANY shortlist
    * source. The slim id-pair frame broadcasts against the corpus scan,
    * so the re-rank touches only |Q| × shortlist full-precision vectors. */
  def rerankExact(short: DataFrame, queries: DataFrame, corpus: DataFrame,
                  k: Int): DataFrame = {
    val sq = short.select(col("query_id"), col("neighbor_id")).join(
      queries.select(col("id").as("query_id"), col("vec").as("qv")), Seq("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
      .join(broadcast(sq), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Two-stage PQ search — ADC shortlist, then EXACT re-rank: the
    * production shape for compressed-domain ANN. Pure ADC ranking on a
    * 32× lossy code is weak on near-random vectors (recall@5 ≈ 0.1 on
    * the testdata corpus); re-ranking the top-`shortlist` ADC candidates
    * with exact cosine recovers most of it (≈ 0.54–0.66 observed) while
    * still touching only |Q| × shortlist original vectors instead of the
    * whole corpus — at 100 TB the full-precision vectors stay on disk
    * and only the shortlist pages in. The shortlist (|Q| × shortlist slim
    * id pairs) broadcasts against the corpus scan, so the re-rank is one
    * narrow pass + a tiny window. */
  def pqSearchRerank(queries: DataFrame, corpus: DataFrame, m: Int, subDim: Int,
                     ks: Int, shortlist: Int, k: Int, seed: Int = 7): DataFrame =
    rerankExact(pqAdcTopK(queries, corpus, m, subDim, ks, shortlist, seed),
      queries, corpus, k)

  /** Bucketed ANN: exact cosine evaluated only on bucket-colliding pairs.
    * Returns candidate pairs (id_a < id_b) with their cosine — the
    * IVF/LSH-style recall-for-throughput trade, with the pair join
    * co-partitioned by bucket id.
    */
  def lshCandidatePairs(vecs: DataFrame, nPlanes: Int, minCos: Double,
                        maxBucketSize: Int = 10000): DataFrame = {
    // cache the bucketed projection: it feeds BOTH self-join branches (and
    // the size aggregate) — without the barrier Catalyst re-inlines the
    // nPlanes×dims srpBucket fold into every branch, tripling the one
    // genuinely expensive per-row expression of this operator.
    // CALLER CONTRACT: the cached handle stays registered for the session;
    // callers making repeated sweeps should `spark.catalog.clearCache()`
    // (as Verify/Bench do) or unpersist between invocations.
    val b = vecs.select(col("id"), col("vec"), srpBucket(col("vec"), nPlanes).as("bucket"))
      .cache()
    // Hot-bucket guard: a skewed bucket makes the self-join quadratic in
    // that bucket. Bucket sizes are a tiny aggregate (≤ 2^nPlanes rows →
    // broadcast); buckets past the cap are excluded from pairing — the
    // standard recall-for-stability trade (callers raise nPlanes to split
    // hot regions instead). No final distinct: with a single bucket column
    // and id_a < id_b a pair can appear at most once. Disabled cap
    // (Int.MaxValue) skips the size pass entirely.
    val capped = if (maxBucketSize == Int.MaxValue) b else {
      val sizes = b.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") <= maxBucketSize)
      b.join(broadcast(sizes.select("bucket")), Seq("bucket"))
    }
    val l = capped.select(col("bucket"), col("id").as("id_a"), col("vec").as("va"))
    val r = capped.select(col("bucket"), col("id").as("id_b"), col("vec").as("vb"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Multi-table SRP-LSH candidate pairs with a STRUCTURALLY LINEAR
    * bound — the scale path for bucketed ANN pair generation and the
    * vector twin of the text side's banded-minhash chain
    * ([[graft.ops.Dedup.lshBandCandidates]] / q177).
    *
    * Single-table SRP at a fixed plane count is Θ(n²/2^p) in-bucket
    * pairs — quadratic at ANY plane count once n outgrows 2^p (the r9
    * q35 finding: 348M pairs at 100× rows, 35B at 1000×). This operator
    * bounds BOTH terms structurally:
    *
    *   - `tables` independent plane sets (disjoint [[srpBucket]]
    *     `planeOffset` ranges) give the recall that one table at
    *     `tables × planesPerTable` planes would destroy — a close pair
    *     only needs to co-bucket in ONE table (standard multi-table
    *     LSH);
    *   - within each table-bucket, candidates are each vector's
    *     `neighborWidth` successors in id order (the sorted-neighborhood
    *     chain, ONE `lead` window — no self-join), so candidate count is
    *     ≤ tables · neighborWidth · n REGARDLESS of bucket skew: a
    *     degenerate bucket (boilerplate embeddings, zero vectors)
    *     contributes linearly, not quadratically.
    *
    * Returns (id_a, id_b, cos) with id_a < id_b, exact cosine on every
    * surviving candidate, unthresholded — callers filter/rank (q35 emits
    * top-k per anchor). The bucketed frame is materialized once via a
    * lazy lineage cut (feeds the chain window and both verify joins).
    */
  def srpChainPairs(vecs: DataFrame, tables: Int, planesPerTable: Int,
                    neighborWidth: Int): DataFrame = {
    require(tables > 0 && planesPerTable > 0 && planesPerTable < 63,
      s"srpChainPairs: bad table/plane config ($tables, $planesPerTable)")
    require(neighborWidth > 0 && neighborWidth < 64,
      s"srpChainPairs needs a finite chain width, got $neighborWidth")
    val bks = array((0 until tables).map(t =>
      concat(lit(s"$t:"), srpBucket(col("vec"), planesPerTable,
        planeOffset = t * planesPerTable).cast("string"))): _*)
    val b = graft.ops.Fixpoint.cut(
      vecs.select(col("id"), col("vec"), bks.as("bks")))
    val keys = b.select(col("id").as("doc_id"), explode(col("bks")).as("band_key"))
    graft.ops.Dedup.chainCandidatesFromKeys(keys, neighborWidth)
      .join(b.select(col("id").as("id_a"), col("vec").as("va")), Seq("id_a"))
      .join(b.select(col("id").as("id_b"), col("vec").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
  }
}
