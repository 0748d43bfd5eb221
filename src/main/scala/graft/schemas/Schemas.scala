package graft.schemas

import org.apache.spark.sql.types._

/** Declared `StructType`s for every table family in the reference —
  * OLTP source (reference OLTP/scripts/create_db.py:10-42), OLAP star
  * (OLAP/scripts/create_db.py:10-75) and ETL audit
  * (ETL/scripts/create_db.py:10-42).
  *
  * Type mapping per SURVEY.md §1.5-1.6: SQLite INTEGER→Long (ids/SKs) or
  * Integer (small calendar parts/flags), REAL→Double (the reference
  * tolerates float money — `round(x,2)` + epsilon compare), TEXT→String,
  * DATE→Date, DATETIME→Timestamp. The raw OLTP `transactions.date` is a
  * STRING on purpose: the error injector writes arbitrary text there
  * (OLTP/scripts/generate_invalid.py:293-319) and the multi-format parser
  * (validation.py:89-103) is part of the contract.
  */
object Schemas {

  // ---- OLTP source ----------------------------------------------------

  val users: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("join_date", StringType) // raw ISO text in SQLite
  ))

  val products: StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("price", DoubleType),
    StructField("stock", IntegerType)
  ))

  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", LongType),
    StructField("date", StringType), // raw text; may be malformed
    StructField("user_id", LongType),
    StructField("product_id", LongType),
    StructField("quantity", IntegerType),
    StructField("price", DoubleType), // line TOTAL, not unit price
    StructField("payment_type", StringType),
    StructField("status", StringType)
  ))

  // ---- OLAP star schema ----------------------------------------------

  val dimDate: StructType = StructType(Seq(
    StructField("date_id", IntegerType),
    StructField("full_date", DateType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
    StructField("week", IntegerType),
    StructField("weekday", IntegerType)
  ))

  val dimUser: StructType = StructType(Seq(
    StructField("user_sk", LongType),
    StructField("user_id", LongType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("join_date", DateType),
    StructField("start_date", DateType),
    StructField("end_date", DateType),
    StructField("current_flag", IntegerType)
  ))

  val dimProduct: StructType = StructType(Seq(
    StructField("product_sk", LongType),
    StructField("product_id", LongType),
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("price", DoubleType),
    StructField("start_date", DateType),
    StructField("end_date", DateType),
    StructField("current_flag", IntegerType)
  ))

  val factTransactions: StructType = StructType(Seq(
    StructField("transaction_id", LongType),
    StructField("user_sk", LongType),
    StructField("product_sk", LongType),
    StructField("date_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("total", DoubleType),
    StructField("payment_type", StringType),
    StructField("status", StringType),
    StructField("load_date", DateType)
  ))

  val factStockHistory: StructType = StructType(Seq(
    StructField("product_sk", LongType),
    StructField("date_id", IntegerType),
    StructField("stock", IntegerType),
    StructField("load_date", DateType)
  ))

  // ---- ETL audit ------------------------------------------------------

  val etlRunLog: StructType = StructType(Seq(
    StructField("run_id", LongType),
    StructField("run_date", DateType),
    StructField("source_date", DateType),
    StructField("status", StringType), // 'success' | 'failed'
    StructField("started_at", TimestampType),
    StructField("ended_at", TimestampType),
    StructField("duration_ms", LongType),
    StructField("rows_users_inserted", LongType),
    StructField("rows_products_inserted", LongType),
    StructField("rows_stock_inserted", LongType),
    StructField("rows_transactions_inserted", LongType),
    StructField("errors", LongType),
    StructField("warnings", LongType),
    StructField("notes", StringType)
  ))

  val etlErrorLog: StructType = StructType(Seq(
    StructField("run_id", LongType),
    StructField("entity", StringType), // user|product|transaction|date
    StructField("table_name", StringType),
    StructField("record_id", StringType),
    StructField("error_type", StringType),
    StructField("message", StringType),
    StructField("created_at", TimestampType),
    StructField("severity", StringType) // error|warning
  ))
}
