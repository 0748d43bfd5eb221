package graft

import org.apache.spark.sql.functions._

/** Semantics of the curation additions (q123–q127) beyond the DuckDB hash
  * gate: the repetition gate must actually fire on the dirtied docs, block
  * dedup must erase verbatim copies and preserve originals verbatim, span
  * fractions must flag the verbatim near-dups, and the LM score must be a
  * proper mean log-probability.
  */
class QCurateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(q: String) = SparkEntry.queries(q)(spark, sfDir)

  test("q123: dirtied docs gain duplicate 5-grams and are dropped; gate splits the corpus") {
    val out = run("q123_repetition_filters").cache()
    val dirty = out.filter(col("doc_id") % 6 === 0)
    // re-appending the first 10 tokens manufactures ≥ 6 duplicate 5-grams
    assert(dirty.filter(col("dup5_frac") <= 0).count() === 0)
    assert(dirty.filter(col("keep")).count() === 0)
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < out.count(), "gate must keep some and drop some")
    out.unpersist()
  }

  test("bpeRound: chained occurrences merge in ONE round (greedy BPE semantics)") {
    import spark.implicits._
    // 'a b a b' ×3 and 'c d' ×5: pair counts (a,b)=6, (b,a)=3, (c,d)=5 →
    // top pair is (a,b), and BOTH its occurrences must merge in the same
    // round — the doubled-space encoding's whole point (a single-space
    // encoding would leave ' ab a b ' behind)
    val repr = Seq((" a  b  a  b ", 3L), (" c  d ", 5L)).toDF("repr", "cnt")
    val (merged, m) = graft.queries.QScale.bpeRound(repr, 1)
    assert(m.as[(Int, String, String, Long)].collect().toSeq ===
      Seq((1, "a", "b", 6L)))
    val out = merged.as[(String, Long)].collect().toMap
    assert(out(" ab  ab ") === 3L)
    assert(out(" c  d ") === 5L)
  }

  test("bpeRound: merged symbols participate as single units next round") {
    import spark.implicits._
    val repr = Seq((" a  b  c ", 4L)).toDF("repr", "cnt")
    val (r1, _) = graft.queries.QScale.bpeRound(repr, 1) // merges (a,b) → ab
    val (_, m2) = graft.queries.QScale.bpeRound(r1, 2)
    // round 2 must see the pair (ab, c) — not (b, c)
    assert(m2.as[(Int, String, String, Long)].collect().toSeq ===
      Seq((2, "ab", "c", 4L)))
  }

  test("q172: three merges learned, each a real pair with positive corpus support") {
    val out = run("q172_bpe_merges").collect()
    assert(out.map(_.getAs[Int]("iter")).sorted.toSeq === Seq(1, 2, 3))
    assert(out.forall(_.getAs[Long]("pair_count") > 0))
    assert(out.forall(r => r.getAs[String]("lhs").nonEmpty &&
      r.getAs[String]("rhs").nonEmpty))
  }

  test("q173: the closed-form probe actually fits (R² floor) with sane weights") {
    // hash parity alone can't catch a dead feature pipeline (both engines
    // would agree on garbage) — the fit quality is the semantic check:
    // n_chars ≈ w1·n_tokens + w2·n_long_tokens must recover the corpus's
    // chars-per-token structure
    val r = run("q173_linear_probe").collect().head
    assert(r.getAs[Long]("n") > 0)
    assert(r.getAs[Double]("r2") >= 0.9,
      s"probe failed to fit: r2 = ${r.getAs[Double]("r2")}")
    assert(r.getAs[Double]("w1") > 0, "chars-per-token weight must be positive")
    assert(r.getAs[Double]("w2") > 0, "long tokens must add chars")
  }

  test("q174: incremental sessions ≡ full recompute; the continuation branch fires") {
    // sf0.001: every incremental session must match the full recompute
    val small = run("q174_incremental_sessionize").collect()
    assert(small.nonEmpty)
    assert(small.forall(_.getAs[Boolean]("matches_full")))
    // sf0.01 (the driver's gate scale): sessions provably CONTINUE across
    // the batch boundary — the branch the state-carry exists for — and
    // still match the full recompute row-for-row
    val big = SparkEntry.queries("q174_incremental_sessionize")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(big.count(_.getAs[Boolean]("continued")) > 0,
      "no session crossed the batch boundary — the state-carry is untested")
    assert(big.forall(_.getAs[Boolean]("matches_full")))
  }

  test("q175: vocabulary overlap is a valid Jaccard with consistent set algebra") {
    val rows = run("q175_lang_vocab_overlap").collect()
    assert(rows.length === 10) // C(5,2) language pairs
    rows.foreach { r =>
      val (na, nb, common) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_common"))
      assert(common <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
      assert(math.abs(j - common.toDouble / (na + nb - common)) < 1e-9)
      assert(r.getAs[String]("lang_a") < r.getAs[String]("lang_b"))
    }
  }

  test("q124: verbatim copies lose every block; sole-occurrence docs survive intact") {
    val out = run("q124_block_dedup").cache()
    // +20000 rows are byte-identical copies scanned after their originals —
    // first-wins must erase them completely
    val copies = out.filter(col("doc_id") >= 20000)
    assert(copies.count() > 0)
    assert(copies.filter(col("n_kept") =!= 0).count() === 0)
    // a doc whose blocks all survived must reassemble to its own
    // normalized text (order preserved through the pos sort)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextOps.normText(col("text")).as("norm"))
    val intact = out.filter(col("doc_id") < 10000 &&
        col("n_kept") === col("n_blocks"))
      .join(docs, "doc_id")
    assert(intact.count() > 0)
    assert(intact.filter(col("kept_text") =!= col("norm")).count() === 0)
    out.unpersist()
  }

  test("q125: verbatim copies are fully duplicated at span level") {
    val out = run("q125_dup_span_frac").cache()
    val copies = out.filter(col("doc_id") >= 20000)
    assert(copies.count() > 0)
    assert(copies.filter(!col("is_dupish")).count() === 0)
    assert(copies.filter(col("dup_frac") =!= 1.0).count() === 0)
    out.unpersist()
  }

  test("q126: ORC roundtrip is lossless against the parquet source") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val back = run("q126_orc_ingest")
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("q127: mean log-prob is a mean of per-token corpus log-probs") {
    val out = run("q127_unigram_lm").cache()
    // every token probability is in (0, 1) → mean log-prob strictly < 0,
    // and no doc can score below the rarest token's log-prob
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("w"))
    val counts = toks.groupBy("w").count().cache()
    val total = counts.agg(sum("count")).head().getLong(0).toDouble
    val minLp = math.log(
      counts.agg(min("count")).head().getLong(0).toDouble / total)
    assert(out.filter(col("mean_logprob") >= 0).count() === 0)
    assert(out.filter(col("mean_logprob") < minLp - 1e-9).count() === 0)
    // token accounting matches the corpus
    val nOut = out.agg(sum("n_tokens")).head().getLong(0)
    assert(nOut === toks.count())
    counts.unpersist(); out.unpersist()
  }

  test("q128: importance weights rank the target language above the rest") {
    val out = run("q128_dsir_importance")
      .join(spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("lang")), "doc_id")
      .cache()
    // the target model was fit on English docs: their mean log-ratio must
    // exceed the non-English mean (that IS the selection signal)
    val mean = out.groupBy(col("lang") === "en")
      .agg(avg("dsir_logweight")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(mean(true) > mean(false),
      s"en mean ${mean(true)} must exceed non-en ${mean(false)}")
    assert(out.filter(col("dsir_logweight").isNull).count() === 0)
    out.unpersist()
  }

  test("q129: CMS estimates never undercount ANY key, not just the top 20") {
    import graft.functions.Cms
    val ev = spark.read.parquet(s"$sfDir/events.parquet").select(col("user_id"))
    val sk = ev.agg(
      count_min_sketch(col("user_id"), lit(0.001d), lit(0.99d), lit(42)).as("cms"))
    val all = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("exact"), Cms.estimate(col("cms"), col("user_id")).as("est"))
    assert(all.filter(col("est") < col("exact")).count() === 0)
    // a key that never occurred can only collide upward: est >= 0
    val absent = sk.select(Cms.estimate(col("cms"), lit(-987654321L)).as("e"))
      .head().getLong(0)
    assert(absent >= 0)
  }

  test("q131: mass stays bounded and sinks outrank sources") {
    val out = run("q131_domain_pagerank").cache()
    val SCALE = 1000000000000L
    // fixed-point truncation only ever LOSES mass: total in (0.5, 1] SCALE
    val total = out.agg(sum("rank_fp")).head().getLong(0)
    assert(total <= SCALE && total > SCALE / 2, s"total mass $total")
    // site* nodes have no in-edges (they only hold the base teleport
    // mass); cdn* nodes absorb the site mass — every cdn must outrank
    // every site
    val maxSite = out.filter(col("node").startsWith("site"))
      .agg(max("rank_fp")).head().getLong(0)
    val minCdn = out.filter(col("node").startsWith("cdn"))
      .agg(min("rank_fp")).head().getLong(0)
    assert(minCdn > maxSite, s"cdn min $minCdn vs site max $maxSite")
    out.unpersist()
  }

  test("q132: quotas fill exactly and sqrt-weighting lifts rare languages") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = run("q132_temperature_mix").cache()
    val corpus = docs.groupBy("lang").agg(count(lit(1)).as("c")).cache()
    val picked = out.groupBy("lang").agg(count(lit(1)).as("k"))
    val j = corpus.join(picked, Seq("lang")).cache()
    // every stratum fills its quota exactly (quota <= stratum size since
    // the target rate is 0.3 < 1)
    val counts = j.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    val total = counts.map(_._2).sum.toDouble
    val z = counts.map(c => math.sqrt(c._2.toDouble)).sorted.sum
    counts.foreach { case (_, c, k) =>
      val quota = math.floor((0.3 * total) * (math.sqrt(c.toDouble) / z)).toLong
      assert(k === quota, s"stratum filled $k of quota $quota")
    }
    // alpha = 0.5 flattens: the rarest language's sampled share must
    // exceed its corpus share, the most common one's must shrink
    val (_, cRare, kRare) = counts.head
    val (_, cTop, kTop) = counts.last
    val kSum = counts.map(_._3).sum.toDouble
    assert(kRare / kSum > cRare / total)
    assert(kTop / kSum < cTop / total)
    j.unpersist(); corpus.unpersist(); out.unpersist()
  }

  test("q133: the frozen classifier actually separates the corpus") {
    val out = run("q133_quality_classifier").cache()
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < out.count(), "gate must keep some, drop some")
    // keep is defined on the rounded logit — never disagrees with it
    assert(out.filter(col("keep") =!= (col("logit") > 0.0d)).count() === 0)
    out.unpersist()
  }

  test("q134: no near-dup cluster ever straddles a split") {
    val out = run("q134_leakage_free_split").cache()
    val straddlers = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(straddlers.count() === 0)
    // all three splits materialize (8/1/1 hash buckets over enough
    // clusters) and every doc is assigned exactly once
    assert(out.select("split").distinct().count() === 3)
    assert(out.select("doc_id").distinct().count() === out.count())
    out.unpersist()
  }

  test("q135: type-token ratios are sane and trigram diversity exceeds unigram") {
    val out = run("q135_ngram_diversity").cache()
    assert(out.count() === 5) // one row per language
    assert(out.filter(col("ttr_uni") <= 0 || col("ttr_uni") > 1).count() === 0)
    assert(out.filter(col("d_uni") > col("n_uni")).count() === 0)
    // trigrams are sparser than unigrams: their TTR must be higher
    assert(out.filter(col("ttr_tri") <= col("ttr_uni")).count() === 0)
    out.unpersist()
  }

  test("q136: the k=16 estimator tracks exact Jaccard within sampling error") {
    val out = run("q136_minhash_estimate").cache()
    assert(out.count() > 0)
    // est is a mean of 16 Bernoulli(jacc) trials: a universal |err| bound
    // of 4 sigma at j=0.5 is 0.5 — anything beyond signals broken hashing
    assert(out.filter(abs(col("jacc_est") - col("jacc")) > 0.5).count() === 0)
    // estimates live on the k=16 grid
    assert(out.filter((col("jacc_est") * 16) =!=
      round(col("jacc_est") * 16, 0)).count() === 0)
    out.unpersist()
  }

  test("q137: selection keeps exactly the per-language 30% with the highest weights") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = run("q137_dsir_selection").cache()
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("c"))
    val picked = out.groupBy("lang").agg(count(lit(1)).as("k"),
      min("dsir_logweight").as("floor_w"))
    val j = sizes.join(picked, Seq("lang")).collect()
    j.foreach { r =>
      assert(r.getLong(2) === math.floor(0.3 * r.getLong(1)).toLong,
        s"lang ${r.getString(0)} quota")
    }
    // nothing outside the selection outranks anything inside it (per lang)
    val full = run("q128_dsir_importance")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val dropped = full.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(max("dsir_logweight").as("best_out"))
    val viol = picked.join(dropped, Seq("lang"))
      .filter(col("best_out") > col("floor_w"))
    assert(viol.count() === 0)
    out.unpersist()
  }

  test("q138: bounded incremental probe is sound and structurally capped") {
    // the all-pairs recompute (q29's pre-r9 body — q29 itself is now the
    // linear drop-list, so the exact-truth pair frame is built inline)
    val docs = graft.queries.QLlm.docsWithDups(spark, sfDir)
      .select(col("doc_id"),
        graft.text.TextOps.shingles(graft.text.TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val allPairs = graft.ops.Dedup.lshBandCandidates(docs)
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sha")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("shb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.text.TextOps.jaccard(col("sha"), col("shb")), 6).as("jacc"))
      .filter(col("jacc") >= 0.5)
      .cache()
    val inc = run("q138_incremental_dedup").cache()
    val full = allPairs.filter(col("id_a") % 10 === 9 || col("id_b") % 10 === 9)
      .cache()
    // SOUND: every emitted pair is a true verified pair with a new side
    // (values too — the hashed verify equals the string-set jaccard here)
    assert(inc.exceptAll(full).count() === 0)
    // the arriving doc is always the right-hand side (lag looks BACK)
    assert(inc.filter(col("id_b") % 10 =!= 9).count() === 0)
    // STRUCTURAL bound: ≤ 3 prior arrivals × 8 bands per new doc,
    // whatever the band sizes
    assert(inc.groupBy("id_b").agg(count(lit(1)).as("n"))
      .filter(col("n") > 24).count() === 0)
    // DROP-DECISION recall: every new doc the full recompute links to a
    // PRIOR doc is still linked by the chain (the deliverable of
    // incremental dedup is "which arrivals duplicate the corpus" — on
    // this corpus the 3-most-recent-per-band discipline loses none).
    // CORPUS-DEPENDENT pin (ADVICE r10): the chain probes only the 3 most
    // recent prior arrivals per band, so a dup whose only band cohabitants
    // sit >3 arrivals back would be missed BY DESIGN — the driver corpus's
    // dup layout (derived ids at +10000/+20000, near-identical shingle
    // sets → co-banded in all 8 bands with fresh arrivals nearby) keeps
    // recall total here. If this assert fails after a testdata regen,
    // check the dup spacing before suspecting the operator.
    val flaggedFull = full.filter(col("id_b") % 10 === 9)
      .select(col("id_b").as("doc_id")).distinct()
    val flaggedInc = inc.select(col("id_b").as("doc_id")).distinct()
    assert(flaggedFull.exceptAll(flaggedInc).count() === 0)
    // and old×old pairs exist in the full set — the probe prunes them
    assert(allPairs.filter(col("id_a") % 10 =!= 9 && col("id_b") % 10 =!= 9)
      .count() > 0)
    allPairs.unpersist(); docs.unpersist(); inc.unpersist(); full.unpersist()
  }

  test("q138 chain: recall and the 3-per-band eviction boundary, by construction") {
    // The recall property pinned WITHOUT the driver corpus (VERDICT r11
    // #8 — the q138 test above depends on the testdata's dup spacing; a
    // regen could silently change what it proves). Build the dup layout
    // explicitly: two verbatim-copy families with fully disjoint
    // vocabularies, each with one "new" arrival (id % 10 == 9), with the
    // family sizes chosen to straddle the 3-most-recent-per-band window:
    //
    //   family A: ids 1..4 old, 9 new   → window holds {2,3,4}; id 1 out
    //   family B: ids 11..15 old, 19 new → window holds {13,14,15}
    //
    // Verbatim copies share ALL band keys, so the per-band chain is the
    // family's id order and the expected pair multiset is exact — both
    // total recall (every new dup is linked) AND the eviction boundary
    // (ids 1, 11, 12 absent) hold by construction, not corpus accident.
    import graft.text.TextOps
    val textA = "zephyr mosaic quill ramble tonic verge wicker yonder " +
      "ember flask grove harbor inlet jumble knoll ledger"
    val textB = "nimbus orchid parley quartz rustic saddle tempest umber " +
      "vortex walnut xylem yarrow zenith anchor basalt cipher"
    val rows = ((1 to 4).map(i => (i.toLong, textA)) :+ (9L, textA)) ++
      ((11 to 15).map(i => (i.toLong, textB)) :+ (19L, textB))
    import spark.implicits._
    val d = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), TextOps.minhashBandKeys(col("sh")).as("bks"),
        TextOps.shingleHashSet(col("sh")).as("hs"))
    val got = sortedRows(graft.queries.QCurate
      .incrementalChainPairs(d, col("doc_id") % 10 === 9))
    val expected = Seq(2L, 3L, 4L).map(a => Seq[Any](a, 9L, 1.0)) ++
      Seq(13L, 14L, 15L).map(a => Seq[Any](a, 19L, 1.0))
    assert(got.size === expected.size && got.toSet === expected.toSet,
      s"constructed chain pairs diverged — got $got")
  }

  test("q140: batches are exact 8-item runs per media type with faithful byte accounting") {
    val out = run("q140_gpu_batching").cache()
    // every non-final batch holds exactly 8 items
    val maxBatch = out.groupBy("media_type").agg(max("batch_id").as("mb"))
    val nonFinal = out.join(maxBatch, Seq("media_type"))
      .filter(col("batch_id") < col("mb"))
    assert(nonFinal.filter(col("n_items") =!= 8).count() === 0)
    // byte accounting reconciles with the corpus
    val totalBytes = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(sum(length(col("text").cast("binary")))).head().getLong(0)
    assert(out.agg(sum("total_bytes")).head().getLong(0) === totalBytes)
    // the split flag fires somewhere (8 docs of ~300 chars exceed 4 KiB)
    assert(out.filter(col("needs_split")).count() > 0)
    out.unpersist()
  }

  test("q130: bigram accounting and log-prob bounds hold") {
    val out = run("q130_bigram_lm").cache()
    // probabilities are strict mixtures in (0,1): mean log-prob < 0
    assert(out.filter(col("mean_logprob") >= 0).count() === 0)
    // every doc with >= 2 tokens contributes exactly len-1 bigrams
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(graft.text.TextOps.tokens(col("text"))).as("n"))
      .filter(col("n") >= 2)
      .agg(sum(col("n") - 1)).head().getLong(0)
    assert(out.agg(sum("n_bigrams")).head().getLong(0) === expected)
    out.unpersist()
  }
}
