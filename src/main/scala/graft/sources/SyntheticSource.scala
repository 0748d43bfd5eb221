package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic ledger as a full DataSource V2 connector — the
  * connector-side twin of the scan discipline the registry proves on
  * parquet (PushedFilters / ReadSchema assertions): here WE are the
  * source, so pruning is implemented rather than inherited.
  *
  *   spark.read.format("graft.sources.SyntheticSource")
  *     .option("rows", 100000).option("slices", 16).load()
  *
  * Schema: id BIGINT, bucket BIGINT, cents BIGINT, tag VARCHAR — every
  * non-key column derives from `id` through LCG mixing whose constants
  * are chosen so all intermediates stay inside non-negative int64
  * (DuckDB raises on signed overflow where the JVM wraps, so the SAME
  * arithmetic must be exactly evaluable in both engines; see
  * [[SyntheticSource.h1]]). That makes the whole table reproducible as
  * a DuckDB `range()` expression — the oracle for q161.
  *
  * Scale story: rows split into `slices` contiguous id-ranges, one
  * [[InputPartition]] each — on a cluster each range is an independent
  * task with zero driver state. Filter pushdown on `id`
  * (=, <, <=, >, >=) intersects the requested range at PLAN time, so
  * out-of-range partitions are never even scheduled (partition
  * pruning, asserted via `description()` in SyntheticSourceSpec);
  * pushed filters are also left in the residual so Spark re-applies
  * them — pruning is an optimization, never a correctness dependency.
  * Column pruning materializes only requested fields — a pruned `tag`
  * is never allocated (no UTF8String churn on a 100 TB scan).
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new SyntheticTable(
      rows = opts.getOrElse("rows", "1000").toLong,
      slices = opts.getOrElse("slices", "8").toInt)
  }
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  // LCG mixing kept inside non-negative int64: id ≤ 2^40 ⇒
  // id*2654435761 < 2^72? NO — the contract is id < 2^32 (rows option
  // caps the id space), so id*2654435761 < 2^64... still too wide for
  // DuckDB's signed int64. Practical bound: rows ≤ 10^9 ⇒ product
  // ≤ 2.7·10^18 < 2^63−1 ≈ 9.22·10^18, and every later term is taken
  // mod 2^31 before the next multiply, so nothing else approaches the
  // boundary. Identical `%` semantics because operands never go
  // negative.
  def h1(id: Long): Long = (id * 2654435761L) % 2147483648L
  def h2(id: Long): Long = ((h1(id) + 1013904223L) * 1664525L) % 2147483648L
  def bucket(id: Long): Long = h2(id) % 97L
  def cents(id: Long): Long = (h2(id) * 31L + h1(id)) % 1000000L
  def tag(id: Long): String = "t" + (h1(id) % 7L)

  /** The SAME arithmetic as DuckDB SQL over a `range(0, rows)` series —
    * the q161 oracle builds on this. */
  def duckSql(rows: Long): String =
    s"""SELECT id, h2 % 97 AS bucket, (h2 * 31 + h1) % 1000000 AS cents,
       |    't' || CAST(h1 % 7 AS VARCHAR) AS tag
       |  FROM (SELECT id, h1, ((h1 + 1013904223) * 1664525) % 2147483648 AS h2
       |    FROM (SELECT range AS id, (range * 2654435761) % 2147483648 AS h1
       |      FROM range(0, $rows)))""".stripMargin
}

class SyntheticTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices)
}

class SyntheticScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L            // inclusive
  private var hi: Long = rows          // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, _) = filters.partition {
      case EqualTo("id", _: Long) | GreaterThan("id", _: Long) |
           GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) |
           LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: Long)            => lo = lo max v; hi = hi min (v + 1)
      case GreaterThan(_, v: Long)        => lo = lo max (v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = lo max v
      case LessThan(_, v: Long)           => hi = hi min v
      case LessThanOrEqual(_, v: Long)    => hi = hi min (v + 1)
      case _                              => ()
    }
    pushed = accepted
    filters // everything stays residual: pruning is never load-bearing
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order regardless of projection order
    required = StructType(SyntheticSource.schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new SyntheticScan(rows, slices, lo max 0L, hi min rows, required)
}

class SyntheticScan(rows: Long, slices: Int, lo: Long, hi: Long,
                    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def ranges: Seq[(Long, Long)] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by per)
      .map(s => (s max lo, (s + per) min hi))
      .filter { case (s, e) => s < e } // planning-time partition pruning
  }

  override def description(): String =
    s"graft-synthetic rows=$rows slices=$slices range=[$lo,$hi) " +
      s"partitions=${ranges.size} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    ranges.map { case (s, e) => SyntheticPartition(s, e) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

case class SyntheticPartition(lo: Long, hi: Long) extends InputPartition

class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SyntheticPartition]
    // resolve column generators ONCE per partition, not per row
    val gens: Array[Long => Any] = required.fields.map(_.name).map {
      case "id"     => (id: Long) => id
      case "bucket" => (id: Long) => SyntheticSource.bucket(id)
      case "cents"  => (id: Long) => SyntheticSource.cents(id)
      case "tag"    => (id: Long) => UTF8String.fromString(SyntheticSource.tag(id))
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var id = part.lo - 1
      override def next(): Boolean = { id += 1; id < part.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(id)).toSeq)
      override def close(): Unit = ()
    }
  }
}
