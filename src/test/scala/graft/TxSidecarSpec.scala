package graft

import org.apache.spark.sql.functions._
import graft.facts.TxSidecar
import graft.ops.Dedup

/** Unit coverage of the per-load_date id-bloom sidecars (the J5
  * sublinear-history-I/O path, VERDICT r15 #1): batch bloom build, range+
  * bloom probe semantics (superset/union contracts), prune resolution
  * incl. the ineffective-prune signal, and the partition-pruned anti-join
  * identity. The EtlRun integration (sidecar rows written per day, notes
  * in the run log, crash-ordering) is covered e2e in EtlRunSpec.
  */
class TxSidecarSpec extends SparkSpec {
  import spark.implicits._

  private def idsDf(ids: Seq[Long]) = ids.toDF("transaction_id")

  private def sidecarOf(date: String, ids: Seq[Long]): TxSidecar.Sidecar = {
    val bb = TxSidecar.buildBatchBloom(idsDf(ids), "transaction_id", 4096).get
    TxSidecar.Sidecar(date, bb.minId, bb.maxId, bb.nRows, bb.bloom)
  }

  private def metaOf(s: TxSidecar.Sidecar): TxSidecar.Meta =
    TxSidecar.Meta(s.loadDate, s.minId, s.maxId, s.nRows)

  test("buildBatchBloom: empty batch is None; ranges and counts are exact") {
    assert(TxSidecar.buildBatchBloom(idsDf(Nil), "transaction_id", 4096).isEmpty)
    val bb = TxSidecar.buildBatchBloom(idsDf(Seq(7L, 3L, 99L)), "transaction_id", 4096).get
    assert((bb.minId, bb.maxId, bb.nRows) === (3L, 99L, 3L))
  }

  test("probe: disjoint id ranges hit nothing — the typical-day zero-scan case") {
    val history = Seq(sidecarOf("2025-03-01", 1L to 100L),
      sidecarOf("2025-03-02", 101L to 200L))
    assert(TxSidecar.probeHitDates(idsDf(Seq(201L, 300L)), "transaction_id", history).isEmpty)
  }

  test("probe: an id present in a day's partition always hits that day (no false negatives)") {
    val history = Seq(sidecarOf("2025-03-01", 1L to 100L),
      sidecarOf("2025-03-02", 101L to 200L))
    val hits = TxSidecar.probeHitDates(idsDf(Seq(150L, 999L)), "transaction_id", history)
    assert(hits.contains("2025-03-02"))
    assert(!hits.contains("2025-03-01")) // 150 and 999 are outside day 1's range
  }

  test("probe: multiple sidecar rows for one date are unioned (re-run appends)") {
    val history = Seq(sidecarOf("2025-03-01", 1L to 10L),
      sidecarOf("2025-03-01", 500L to 510L)) // same-day re-run's second row
    assert(TxSidecar.probeHitDates(idsDf(Seq(505L)), "transaction_id", history)
      === Seq("2025-03-01"))
    assert(TxSidecar.probeHitDates(idsDf(Seq(100L)), "transaction_id", history).isEmpty)
  }

  test("resolve: sidecar-less partitions are always scanned; hits add to the set") {
    val st = TxSidecar.State(Seq(metaOf(sidecarOf("2025-03-02", 1L to 10L))),
      uncoveredDates = Seq("2025-03-01"))
    val r = TxSidecar.resolve(st, hits = Seq("2025-03-02"))
    assert(r.scanDates === Seq("2025-03-01", "2025-03-02"))
    assert(r.allDates === 2)
    assert(!r.ineffective) // < 5 partitions: never flagged
  }

  test("resolve: flags the q19 signature — >=80% of >=5 indexed partitions scanned") {
    val days = (1 to 6).map(i => s"2025-03-0$i")
    val st = TxSidecar.State(days.map(d => metaOf(sidecarOf(d, 1L to 5L))), Nil)
    assert(TxSidecar.resolve(st, hits = days.take(5)).ineffective) // 5/6 ≥ 80%
    assert(!TxSidecar.resolve(st, hits = days.take(4)).ineffective) // 4/6 < 80%
    // below 5 indexed partitions the flag never fires (tiny warehouses)
    val small = TxSidecar.State(days.take(4).map(d => metaOf(sidecarOf(d, 1L to 5L))), Nil)
    assert(!TxSidecar.resolve(small, hits = days.take(4)).ineffective)
  }

  test("readState: fact partitions without a sidecar row are uncovered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sidecar_state").toString
    val conf = spark.sessionState.newHadoopConf()
    try {
      val fact = Seq((1L, "2025-03-01"), (2L, "2025-03-02"))
        .toDF("transaction_id", "load_date")
        .withColumn("load_date", to_date(col("load_date")))
      fact.write.partitionBy("load_date").parquet(s"$dir/fact_transactions")
      val bb = TxSidecar.buildBatchBloom(idsDf(Seq(1L)), "transaction_id", 1024).get
      TxSidecar.sidecarRow(spark, "2025-03-01", bb)
        .write.parquet(s"$dir/${TxSidecar.tableName}")
      val st = TxSidecar.readState(spark, s"$dir/${TxSidecar.tableName}",
        s"$dir/fact_transactions")
      assert(st.metas.map(_.loadDate) === Seq("2025-03-01"))
      assert(st.uncoveredDates === Seq("2025-03-02"))
      // two-phase round-trip: a range-overlapping batch fetches the
      // persisted bloom (pushed load_date filter) and probes true...
      val batch1 = TxSidecar.buildBatchBloom(idsDf(Seq(1L)), "transaction_id", 1024).get
      assert(TxSidecar.probeState(idsDf(Seq(1L)), "transaction_id", st, batch1,
        spark, s"$dir/${TxSidecar.tableName}") === (Seq("2025-03-01"), 1))
      // ...and a range-disjoint batch ends at the metadata screen: zero
      // hits, zero bloom rows fetched, no probe job at all
      val batch2 = TxSidecar.buildBatchBloom(idsDf(Seq(500L)), "transaction_id", 1024).get
      assert(TxSidecar.probeState(idsDf(Seq(500L)), "transaction_id", st, batch2,
        spark, s"$dir/${TxSidecar.tableName}") === (Seq.empty, 0))
    } finally graft.io.Fs.deleteRecursively(dir, conf)
  }

  test("partition-pruned anti-join: identical to the plain anti-join under the superset contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sidecar_join").toString
    val conf = spark.sessionState.newHadoopConf()
    try {
      // history: evens 2..200 on day 1, 301..400 on day 2
      val hist = ((2L to 200L by 2).map((_, "2025-03-01")) ++
        (301L to 400L).map((_, "2025-03-02")))
        .toDF("transaction_id", "load_date")
        .withColumn("load_date", to_date(col("load_date")))
      hist.write.partitionBy("load_date").parquet(s"$dir/fact")
      val existing = spark.read.parquet(s"$dir/fact")
      val sidecars = Seq(sidecarOf("2025-03-01", 2L to 200L by 2),
        sidecarOf("2025-03-02", 301L to 400L))

      val incoming = idsDf((1L to 120L).toSeq) // overlaps day 1 only
      val bb = TxSidecar.buildBatchBloom(incoming, "transaction_id", 4096).get
      val hits = TxSidecar.probeHitDates(incoming, "transaction_id", sidecars)
      assert(hits === Seq("2025-03-01")) // day 2's range never probes true
      val res = TxSidecar.resolve(TxSidecar.State(sidecars.map(metaOf), Nil), hits)

      val prunedJoin = Dedup.antiJoinExistingPartitionPruned(incoming, existing,
        "transaction_id", "load_date",
        res.scanDates.map(java.sql.Date.valueOf), Some(bb.bloom))
      val plainJoin = Dedup.antiJoinExisting(incoming, existing, Seq("transaction_id"))
      assert(sortedRows(prunedJoin) === sortedRows(plainJoin))
      assert(prunedJoin.as[Long].collect().toSet === (1L to 120L by 2).toSet)
      // the day-2 partition is pruned OUT of the scan
      val plan = prunedJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("load_date=2025-03-02"), plan.take(1200))

      // empty scan set: the batch passes through with NO history read
      val disjoint = idsDf(Seq(1000L, 1001L))
      val none = TxSidecar.probeHitDates(disjoint, "transaction_id", sidecars)
      assert(none.isEmpty)
      val passthrough = Dedup.antiJoinExistingPartitionPruned(disjoint, existing,
        "transaction_id", "load_date", Nil, None)
      assert(passthrough.as[Long].collect().toSet === Set(1000L, 1001L))
      assert(!passthrough.queryExecution.executedPlan.toString.contains("fact"))
    } finally graft.io.Fs.deleteRecursively(dir, conf)
  }
}
