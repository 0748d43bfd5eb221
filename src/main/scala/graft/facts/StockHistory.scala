package graft.facts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dims.DimDate

/** Change-only periodic snapshot of product stock (reference
  * ETL/etl.py:265-305): per valid product, resolve the CURRENT dim SK
  * (orphans warned + skipped), compare against the last recorded stock in
  * the fact, and insert only when it differs.
  *
  * The "last recorded value" probe is a per-key top-1 over the existing
  * fact — done set-based as one `max_by` aggregate on the fact (shuffles
  * only (product_sk, stock) pairs, then broadcasts: the aggregate is
  * key-sized, not fact-sized).
  */
object StockHistory {

  /** @return (inserts, warnings) */
  def load(validProducts: DataFrame, dimProduct: DataFrame, existingFact: DataFrame,
           today: String): (DataFrame, DataFrame) = {
    val todayId = DimDate.dateId(to_date(lit(today)))

    val currentDim = dimProduct.filter(col("current_flag") === 1)
      .select(col("product_id").as("d_product_id"), col("product_sk"))
    val joined = validProducts.join(broadcast(currentDim),
      col("product_id") === col("d_product_id"), "left_outer")

    val orphans = joined.filter(col("product_sk").isNull)
    val resolved = joined.filter(col("product_sk").isNotNull)

    // last stock per SK: deterministic even with date_id ties (max_by on a
    // (date_id, stock) struct picks the largest pair field-wise)
    val lastStock = existingFact
      .groupBy(col("product_sk"))
      .agg(max_by(col("stock"), struct(col("date_id"), col("stock"))).as("last_stock"))

    val inserts = resolved.join(broadcast(lastStock), Seq("product_sk"), "left_outer")
      .filter(col("last_stock").isNull || col("last_stock") =!= col("stock"))
      .select(
        col("product_sk"),
        todayId.as("date_id"),
        col("stock"),
        to_date(lit(today)).as("load_date"))

    val warnings = orphans.select(
      lit("product").as("entity"),
      lit("fact_stock_history").as("table_name"),
      col("product_id").cast("string").as("record_id"),
      lit("orphan_product").as("error_type"),
      lit("warning").as("severity"),
      format_string("Product %s not in dim_product, skipping stock history",
        col("product_id").cast("string")).as("message"))

    (inserts, warnings)
  }
}
