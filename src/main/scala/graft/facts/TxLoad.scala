package graft.facts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dims.DimDate
import graft.ops.{AsOfJoin, Dedup}

/** The composed fact-transaction load (reference ETL/etl.py:307-381):
  * anti-join against already-loaded ids → per-row date parse + dim_date
  * backfill → point-in-time user/product SK lookups (orphans warned and
  * skipped) → in-batch composite-PK first-wins dedup → fact projection.
  *
  * Shuffle budget at scale: the anti-join shuffles on `transaction_id`
  * (the loaded-keys side is key-only and usually broadcast by AQE; past
  * `spark.graft.j5.bloomMinRows` loaded rows it is first bloom-pruned to
  * ~today's batch size so the exchange stays bounded as history grows —
  * see [[Dedup.antiJoinExistingBloomed]]), both
  * PIT lookups are broadcast equi-joins with zero fact-side exchanges
  * ([[AsOfJoin.pitLookup]]), and the first-wins window reuses the
  * anti-join's hash partitioning on `transaction_id` where possible — so
  * the load is one fact shuffle end-to-end.
  */
object TxLoad {

  /** @param validTx  validated + normalized transactions (date is
    *                  'yyyy-MM-dd', payment/status lowercased)
    * @param dimUser   full SCD2 user snapshot
    * @param dimProduct full SCD2 product snapshot
    * @param existingFact current fact_transactions (any columns incl.
    *                  transaction_id)
    * @param today     run date 'yyyy-MM-dd' (load_date stamp)
    * @return (newFacts, warnings, dimDateRows) — warnings carry
    *         (entity, table_name, record_id, error_type, severity, message);
    *         dimDateRows are calendar rows for every loaded tx date
    *         (the reference back-fills dim_date per row, etl.py:320-324)
    */
  /** @param incomingBounded caller's knowledge that `validTx` is a bounded
    *                  incremental batch (the reference's extract is BY
    *                  CONTRACT one day, etl.py:146-168) — the premise the
    *                  bloom prefilter's cost model rests on: its build is
    *                  one pass over INCOMING, worth paying only when
    *                  incoming ≪ the historical id set. A caller replaying
    *                  a whole corpus as one "batch" (q19's fixture) passes
    *                  false and keeps the plain anti-join at every scale;
    *                  no cheap in-operator signal exists for this (plan
    *                  size stats degenerate through the validation joins —
    *                  the same stats gap that forces q75 to hand-build
    *                  Spark's runtime filter). Semantics identical either
    *                  way. */
  /** @param sidecarPrune when the caller maintains per-`load_date` id
    *                  sidecars ([[TxSidecar]] — EtlRun does), the
    *                  already-probed scan set + batch bloom. The anti-join
    *                  then reads ONLY those fact partitions (zero history
    *                  bytes on a disjoint-id day) instead of scanning all
    *                  historical ids; no count gate runs at all. Requires
    *                  the sidecar superset contract
    *                  ([[graft.ops.Dedup.antiJoinExistingPartitionPruned]]).
    *                  Ignored when `incomingBounded` is false — the probe
    *                  premise is the same bounded-batch one. */
  /** @param share    caller-owned persistence hook for the shared load
    *                  intermediate (r16). The facts, the orphan/duplicate
    *                  warnings and the dim_date rows all derive from ONE
    *                  joined+deduped frame; a caller that consumes more
    *                  than one of them as SEPARATE actions (EtlRun's
    *                  fact_tx / error_log / dim_date stages) re-evaluates
    *                  the whole anti-join + PIT + window subtree per
    *                  action — 3 evaluations of the day's batch, measured
    *                  as the dominant fact_tx/error_log/dim_date cost in
    *                  the sf10/sf100 replays. Passing a hook (typically
    *                  `df => { df.cache(); track(df); df }`) makes the
    *                  shared frame materialize once; the caller owns
    *                  unpersist. None (default) keeps the exact r15 plan
    *                  shape — single-consumer callers (q19) pay no cache
    *                  write and lose no column pruning. Results are
    *                  identical either way (FactLoadSpec pins it). */
  def load(validTx: DataFrame, dimUser: DataFrame, dimProduct: DataFrame,
           existingFact: DataFrame, today: String,
           incomingBounded: Boolean = true,
           sidecarPrune: Option[TxSidecar.Prune] = None,
           share: Option[DataFrame => DataFrame] = None): (DataFrame, DataFrame, DataFrame) = {

    // J5 — fidelity: keyed on transaction_id ALONE (etl.py:308-311), so a
    // partially loaded multi-product tx is never completed on re-run.
    //
    // Scale gate (VERDICT r13 #1): once the fact table outgrows
    // `spark.graft.j5.bloomMinRows`, the historical id set can no longer
    // broadcast and every daily run would pay a full exchange of ALL ids
    // ever loaded (linear in history, +0.17 s/day measured at sf10).
    // Above the gate, [[Dedup.antiJoinExistingBloomed]] prunes the
    // history scan to roughly today's batch size before the exchange —
    // identical results by bloom no-false-negative structure (asserted
    // in FactLoadSpec). The gate itself is a zero-column count scan of
    // the fact table (no column IO — cheap but not free, one job per
    // load; the default threshold keeps small corpora on the plain
    // plan). Default 20M ≈ sf10-replay day ~11, so a month-long replay
    // exercises both sides.
    // `bloomMinRows` compares fact ROWS (inflated by multi-product txs)
    // against a threshold whose real subject is the distinct-id exchange;
    // the approximation drifts with the corpus's lines-per-tx, which is
    // fine for a perf-only heuristic but worth knowing when tuning the
    // threshold on another corpus shape (ADVICE r14). EtlRun itself no
    // longer reaches this gate: it probes TxSidecar indexes instead, so
    // the count() below only runs for direct sidecar-less callers.
    val conf = validTx.sparkSession.conf
    val bloomMin = conf.get("spark.graft.j5.bloomMinRows", "20000000").toLong
    val estItems = conf.get("spark.graft.j5.bloomEstItems", "4000000").toLong
    val fresh = (sidecarPrune match {
      case Some(p) if incomingBounded =>
        Dedup.antiJoinExistingPartitionPruned(validTx, existingFact,
          "transaction_id", "load_date",
          p.scanDates.map(java.sql.Date.valueOf), p.pruneBloom)
      case _ =>
        if (incomingBounded && existingFact.count() >= bloomMin)
          Dedup.antiJoinExistingBloomed(validTx, existingFact, "transaction_id", estItems)
        else Dedup.antiJoinExisting(validTx, existingFact, Seq("transaction_id"))
    }).withColumn("tx_date", to_date(col("date")))

    // PIT lookups (J3). The reference probes user first and skips the row
    // before probing product (etl.py:326-360) — so a row missing BOTH only
    // warns about the user.
    val withUser = AsOfJoin.pitLookup(fresh, dimUser,
      col("user_id"), "user_id", col("tx_date"), Seq("user_sk"))
    val withBoth = AsOfJoin.pitLookup(withUser, dimProduct,
      col("product_id"), "product_id", col("tx_date"), Seq("product_sk"))

    // J6 — in-batch composite-PK dedup. The reference's "first" is
    // insertion order, which parquet does not preserve — so the tiebreak
    // among PK-duplicate rows that DIFFER (the injected 'duplicate' kind
    // mutates other columns) must name every remaining column, or the
    // kept row varies across partitionings (ordering by the PK alone is
    // a total tie inside its own window partition).
    val tiebreak = withBoth.columns
      .filterNot(Seq("transaction_id", "pit_product_sk").contains).map(col).toSeq
    val (orphanUser, orphanProduct, kept, dups) = share match {
      case Some(persist) =>
        // shared shape: ONE frame carries orphan flags AND the dedup rank,
        // materialized once by the caller's hook; every consumer is a
        // filter over it. The rank window adds the orphan flags to the
        // partition key, so resolved rows group exactly as the plain
        // firstWins partition (the flags are constant false there) and
        // orphan rows — excluded from dedup by contract — only ever group
        // among themselves (their ranks are computed but never read).
        val w = Window.partitionBy(col("pit_user_sk").isNull,
            col("pit_product_sk").isNull,
            col("transaction_id"), col("pit_product_sk"))
          .orderBy(tiebreak: _*)
        val ann = persist(withBoth.withColumn("dedup_rn", row_number().over(w)))
        val res = col("pit_user_sk").isNotNull && col("pit_product_sk").isNotNull
        (ann.filter(col("pit_user_sk").isNull).drop("dedup_rn"),
          ann.filter(col("pit_user_sk").isNotNull && col("pit_product_sk").isNull).drop("dedup_rn"),
          ann.filter(res && col("dedup_rn") === 1).drop("dedup_rn"),
          ann.filter(res && col("dedup_rn") > 1).drop("dedup_rn"))
      case None =>
        val orphanU = withBoth.filter(col("pit_user_sk").isNull)
        val orphanP = withBoth.filter(col("pit_user_sk").isNotNull && col("pit_product_sk").isNull)
        val resolved = withBoth.filter(col("pit_user_sk").isNotNull && col("pit_product_sk").isNotNull)
        val (k, d) = Dedup.firstWins(resolved,
          Seq("transaction_id", "pit_product_sk"), tiebreak)
        (orphanU, orphanP, k, d)
    }

    val facts = kept.select(
      col("transaction_id"),
      col("pit_user_sk").as("user_sk"),
      col("pit_product_sk").as("product_sk"),
      DimDate.dateId(col("tx_date")).as("date_id"),
      col("quantity"),
      col("price").as("total"),
      col("payment_type"),
      col("status"),
      to_date(lit(today)).as("load_date")
    )

    def warn(df: DataFrame, errorType: String, message: org.apache.spark.sql.Column) =
      df.select(
        lit("transaction").as("entity"),
        lit("fact_transactions").as("table_name"),
        col("transaction_id").cast("string").as("record_id"),
        lit(errorType).as("error_type"),
        lit("warning").as("severity"),
        message.as("message"))

    val warnings = warn(orphanUser, "orphan_user",
        format_string("User %s not in dim_user for transaction %s, skipping",
          col("user_id").cast("string"), col("transaction_id").cast("string")))
      .unionByName(warn(orphanProduct, "orphan_product",
        format_string("Product %s not in dim_product for transaction %s, skipping",
          col("product_id").cast("string"), col("transaction_id").cast("string"))))
      .unionByName(warn(dups, "duplicate_tx_id",
        format_string("Could not insert transaction %s: duplicate key",
          col("transaction_id").cast("string"))))

    (facts, warnings, DimDate.fromDates(kept, col("tx_date")))
  }
}
