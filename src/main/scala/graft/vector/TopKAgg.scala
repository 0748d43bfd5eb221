package graft.vector

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: per group, keep the k (score, id) pairs with the
  * highest score (ties → smaller id), as one aggregation instead of a sort
  * window. The buffer is a bounded sorted vector (k is small), merged
  * map-side — so a top-k over N rows shuffles at most k pairs per
  * partition per group, and the reduce side never sees a sort of N.
  *
  * Usage: `ds.groupByKey(_.queryId).agg(TopKAgg.topK(k).toColumn)` or via
  * [[TopKAgg.apply]] for the (Long, Long, Double) row shape used by the
  * similarity-search operators.
  */
object TopKAgg {

  type Row = (Long, Long, Double) // (group, id, score)
  type Entry = (Double, Long)     // (score, id)

  /** keep order: better score first; on ties the smaller id wins. */
  private def better(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    val (before, after) = buf.span(x => better(x, e))
    val merged = before ::: e :: after
    if (merged.length > k) merged.take(k) else merged
  }

  def apply(k: Int): Aggregator[Row, List[Entry], Seq[Entry]] =
    new Aggregator[Row, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(b: List[Entry], r: Row): List[Entry] =
        insert(b, (r._3, r._2), k)
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, e, k))
      override def finish(r: List[Entry]): Seq[Entry] = r
      override def bufferEncoder: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]
      override def outputEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
    }
}
