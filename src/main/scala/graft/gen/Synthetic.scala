package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic OLTP data (reference OLTP/scripts/populate.py +
  * generate_invalid.py) — the positive corpus plus the 14-type adversarial
  * corpus (registry at generate_invalid.py:423-438), used by the
  * end-to-end pipeline tests to reproduce the demo.ipynb acceptance
  * battery (SURVEY §5).
  *
  * All randomness is md5-derived from (seed, row id): fully deterministic,
  * reproducible on any engine, and generated distributed via
  * `spark.range` — no driver-side loops.
  */
object Synthetic {

  /** Deterministic uniform double in [0,1) keyed by (seed, tag, id). */
  def rnd(tag: String, id: Column, seed: Int = 42): Column =
    conv(substring(md5(concat_ws("|", lit(seed), lit(tag), id)), 1, 12), 16, 10)
      .cast("double") / math.pow(2.0, 48)

  /** DuckDB text of [[rnd]] (same md5 input, same 2^48 division), so the
    * generators themselves can be oracle-checked. `id` is a SQL expr. */
  def rndSql(tag: String, id: String, seed: Int = 42): String =
    s"(('0x' || substr(md5('$seed|$tag|' || CAST($id AS VARCHAR)), 1, 12))::BIGINT" +
      " / 281474976710656.0)"

  private def pick(tag: String, id: Column, choices: Seq[String]): Column = {
    val n = choices.length
    val idx = floor(rnd(tag, id) * n).cast("int")
    choices.zipWithIndex.foldLeft(lit(choices.head)) { case (acc, (c, i)) =>
      when(idx === i, lit(c)).otherwise(acc)
    }
  }

  def users(spark: SparkSession, n: Int): DataFrame =
    spark.range(1, n + 1).select(
      col("id").as("user_id"),
      concat(lit("User "), col("id")).as("name"),
      concat(lit("user"), col("id"), lit("@example.com")).as("email"),
      date_format(date_add(to_date(lit("2024-01-01")),
        floor(rnd("join", col("id")) * 700).cast("int")), "yyyy-MM-dd").as("join_date"))

  val categories: Seq[String] = Seq("electronics", "clothing", "home", "sports", "books")

  def products(spark: SparkSession, n: Int): DataFrame =
    spark.range(1, n + 1).select(
      col("id").as("product_id"),
      concat(lit("Product "), col("id")).as("name"),
      pick("cat", col("id"), categories).as("category"),
      round(lit(10.0) + rnd("price", col("id")) * 90.0, 2).as("price"),
      floor(rnd("stock", col("id")) * 100).cast("int").as("stock"))

  val paymentTypes: Seq[String] = Seq("Visa", "MasterCard", "Wire Transfer", "Other")
  val statuses: Seq[String] = Seq("Success", "Failed")

  /** Weighted status pick (reference populate.py:219-226: default weights
    * [0.9, 0.1] over [success, failed]). */
  def weightedStatus(id: Column, successWeight: Double = 0.9): Column =
    when(rnd("st", id) < successWeight, lit("Success")).otherwise(lit("Failed"))

  /** Valid transactions for one day, price = round(unit_price * qty, 2)
    * like populate.py:263-264 (`price` is the line TOTAL). ~20% of ids
    * repeat with a second product — the multi-product pattern
    * (populate.py:178, 287-290). Status follows the reference's 90/10
    * success/failed weighting. */
  def transactions(spark: SparkSession, n: Int, day: String, nUsers: Int, nProducts: Int,
                   firstId: Long = 1): DataFrame = {
    val base = spark.range(firstId, firstId + n).select(
      col("id").as("transaction_id"),
      lit(day).as("date"),
      (floor(rnd("u", col("id")) * nUsers) + 1).cast("long").as("user_id"),
      (floor(rnd("p", col("id")) * nProducts) + 1).cast("long").as("product_id"),
      (floor(rnd("q", col("id")) * 5) + 1).cast("int").as("quantity"),
      pick("pay", col("id"), paymentTypes).as("payment_type"),
      weightedStatus(col("id")).as("status"))
    val multi = base.filter(rnd("multi", col("transaction_id")) < 0.2)
      .withColumn("product_id",
        (((col("product_id") + floor(rnd("p2", col("transaction_id")) * (nProducts - 1))) % nProducts) + 1).cast("long"))
    base.unionByName(multi)
      .withColumn("unit_price", round(lit(10.0) + rnd("price", col("product_id")) * 90.0, 2))
      .withColumn("price", round(col("unit_price") * col("quantity"), 2))
      .drop("unit_price")
      .select("transaction_id", "date", "user_id", "product_id", "quantity",
        "price", "payment_type", "status")
  }

  /** Transactions drawn against a real product CATALOG with the reference's
    * pick distributions (populate.py:209-213, 258-264): the product pool is
    * stock-weighted (weight = min(max(stock,1),10); out-of-stock products
    * never picked), quantity is uniform on [1, min(5, stock)], price is the
    * picked product's `price * qty` rounded to cents, and status follows
    * the 90/10 weighting. `users`/`products` are the catalog frames
    * ([[users]]/[[products]] shapes with dense 1..n ids).
    *
    * Generator utility, not a pipeline operator: the pool explode + global
    * index window run over the (small) product catalog, and the pool join
    * broadcasts — the big side (`spark.range(n)`) never shuffles.
    */
  def transactionsWeighted(spark: SparkSession, n: Int, day: String,
                           users: DataFrame, products: DataFrame,
                           firstId: Long = 1, successWeight: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pool = products.filter(col("stock") >= 1)
      .select(col("product_id"), col("price").as("unit_price"), col("stock"),
        explode(sequence(lit(1), least(greatest(col("stock"), lit(1)), lit(10)))).as("copy"))
      .withColumn("pool_idx",
        row_number().over(Window.orderBy("product_id", "copy")) - 1)
      .drop("copy")
    val poolSize = pool.count()
    val nUsers = users.count()
    val base = spark.range(firstId, firstId + n).select(
      col("id").as("transaction_id"), lit(day).as("date"),
      (floor(rnd("u", col("id")) * nUsers) + 1).cast("long").as("user_id"),
      floor(rnd("pp", col("id")) * poolSize).cast("long").as("pool_idx"),
      pick("pay", col("id"), paymentTypes).as("payment_type"),
      weightedStatus(col("id"), successWeight).as("status"))
    base.join(broadcast(pool), Seq("pool_idx"))
      .withColumn("quantity",
        (floor(rnd("q", col("transaction_id")) * least(lit(5), col("stock"))) + 1).cast("int"))
      .withColumn("price", round(col("unit_price") * col("quantity"), 2))
      .select("transaction_id", "date", "user_id", "product_id", "quantity",
        "price", "payment_type", "status")
  }

  /** Post-generation stock decrement: successful transactions reduce their
    * product's stock (reference populate.py:281-283, 305-318 — decremented
    * per batch flush there; one batch here). Clamped at 0: the reference
    * can't oversell because it re-checks availability per pick inside the
    * loop; the set-based form caps instead. */
  def applyStockDecrements(products: DataFrame, tx: DataFrame): DataFrame = {
    val sold = tx.filter(lower(col("status")) === "success")
      .groupBy("product_id").agg(sum("quantity").as("__sold"))
    products.join(sold, Seq("product_id"), "left_outer")
      .withColumn("stock",
        greatest(lit(0L), col("stock") - coalesce(col("__sold"), lit(0L))).cast("int"))
      .drop("__sold")
  }

  /** Mutate a deterministic subset of existing users — name/email changes
    * that trigger SCD2 re-versioning on the next run (reference
    * `change_existent_users`, populate.py:60-88). `frac` of users change,
    * chosen by seeded hash (no RNG state). */
  def mutateUsers(users: DataFrame, frac: Double, tag: String = "mut"): DataFrame =
    users.withColumn("__r", rnd(tag, col("user_id")))
      .withColumn("name", when(col("__r") < frac / 2, concat(col("name"), lit(" Jr."))).otherwise(col("name")))
      .withColumn("email",
        when(col("__r") >= frac / 2 && col("__r") < frac,
          concat(lit("new."), col("email"))).otherwise(col("email")))
      .drop("__r")

  /** Mutate a deterministic subset of existing products — price/stock
    * changes (reference `change_existent_products`, populate.py:91-122);
    * price changes re-version `dim_product`, stock changes land in
    * `fact_stock_history` only. */
  def mutateProducts(products: DataFrame, frac: Double, tag: String = "mut"): DataFrame =
    products.withColumn("__r", rnd(tag, col("product_id")))
      .withColumn("price",
        when(col("__r") < frac / 2, round(col("price") * 1.1, 2)).otherwise(col("price")))
      .withColumn("stock",
        when(col("__r") >= frac / 2 && col("__r") < frac,
          col("stock") + 10).otherwise(col("stock")))
      .drop("__r")

  /** The 14-type adversarial corpus (generate_invalid.py:423-438): rows
    * keyed `kind` ∈ {orphan_user, orphan_product, qty_zero, qty_negative,
    * price_mismatch, invalid_payment, invalid_status, bad_date, duplicate,
    * empty_name_user, bad_email_user, null_joindate_user,
    * excessive_price_product, negative_stock_product}. Returns
    * (users, products, transactions) extras to union onto the valid data. */
  def invalid(spark: SparkSession, day: String, nUsers: Int, nProducts: Int,
              perKind: Int = 2): (DataFrame, DataFrame, DataFrame) =
    invalid(spark, day, nUsers, nProducts, perKind, None)

  def invalid(spark: SparkSession, day: String, nUsers: Int, nProducts: Int,
              perKind: Int, existingTx: Option[DataFrame]): (DataFrame, DataFrame, DataFrame) = {
    def ids(tag: String, base: Long) = spark.range(base, base + perKind).select(col("id"))

    val badUsers =
      ids("emptyname", 9000).select(col("id").as("user_id"), lit("").as("name"),
        concat(lit("u"), col("id"), lit("@example.com")).as("email"), lit(day).as("join_date"))
      .unionByName(ids("bademail", 9100).select(col("id").as("user_id"),
        concat(lit("User "), col("id")).as("name"), lit("not-an-email").as("email"),
        lit(day).as("join_date")))
      .unionByName(ids("nulljoin", 9200).select(col("id").as("user_id"),
        concat(lit("User "), col("id")).as("name"),
        concat(lit("u"), col("id"), lit("@example.com")).as("email"),
        lit(null).cast("string").as("join_date")))

    val badProducts =
      ids("overprice", 9000).select(col("id").as("product_id"),
        concat(lit("Product "), col("id")).as("name"), lit("electronics").as("category"),
        lit(15000.0).as("price"), lit(10).as("stock"))
      .unionByName(ids("negstock", 9100).select(col("id").as("product_id"),
        concat(lit("Product "), col("id")).as("name"), lit("home").as("category"),
        lit(25.0).as("price"), lit(-5).as("stock")))

    def tx(idBase: Long, mutate: DataFrame => DataFrame): DataFrame =
      mutate(spark.range(idBase, idBase + perKind).select(
        col("id").as("transaction_id"), lit(day).as("date"),
        (floor(rnd("u", col("id")) * nUsers) + 1).cast("long").as("user_id"),
        (floor(rnd("p", col("id")) * nProducts) + 1).cast("long").as("product_id"),
        lit(2).as("quantity"), lit(50.0).as("price"),
        lit("Visa").as("payment_type"), lit("Success").as("status")))

    val badTx = Seq[DataFrame](
      tx(9000, _.withColumn("user_id", col("user_id") + 100000)), // orphan_user
      tx(9100, _.withColumn("product_id", col("product_id") + 100000)), // orphan_product
      tx(9200, _.withColumn("quantity", lit(0))), // qty_zero
      tx(9300, _.withColumn("quantity", lit(-3))), // qty_negative
      tx(9400, _.withColumn("price", lit(0.01))), // price_mismatch (warning)
      tx(9500, _.withColumn("payment_type", lit("Bitcoin"))), // invalid_payment_type
      tx(9600, _.withColumn("status", lit("Pending"))), // invalid_status
      tx(9700, _.withColumn("date", { // dd-MM-yyyy — unparseable by contract
        val Array(y, m, d) = day.split("-"); lit(s"$d-$m-$y")
      })),
      // duplicate ids: of RANDOM EXISTING transactions when a corpus is
      // supplied (reference generate_invalid.py:326-356 — each duplicate
      // copies a randomly chosen existing transaction_id with fresh random
      // attributes; seeded-rank pick here so it is reproducible), else of
      // low ids "that might exist soon" (the reference's empty-DB fallback)
      existingTx match {
        case Some(ex) =>
          import org.apache.spark.sql.expressions.Window
          // seeded-rank pick via orderBy().limit() — TakeOrdered, fully
          // parallel; the index window then runs over perKind rows only
          // (an unpartitioned window over the whole corpus would funnel
          // every row through one task)
          val w = Window.orderBy("__r", "transaction_id")
          val picked = ex.select(col("transaction_id"))
            .withColumn("__r", md5(concat(lit("dup|"), col("transaction_id").cast("string"))))
            .orderBy("__r", "transaction_id").limit(perKind)
            .withColumn("__k", row_number().over(w) - 1)
            .select(col("__k"), col("transaction_id"))
          tx(9800, identity)
            .withColumn("__k", col("transaction_id") - 9800)
            .drop("transaction_id")
            .join(broadcast(picked), Seq("__k")).drop("__k")
            .select("transaction_id", "date", "user_id", "product_id",
              "quantity", "price", "payment_type", "status")
        case None =>
          tx(9800, identity).withColumn("transaction_id", col("transaction_id") - 9800 + 1)
      }
    ).reduce(_ unionByName _)

    (badUsers, badProducts, badTx)
  }

  /** DuckDB mirror of `invalid(...)._3` — the 9 adversarial transaction
    * blocks with identical md5-derived ids (oracle for S14). */
  def invalidTxSql(day: String, nUsers: Int, nProducts: Int, perKind: Int = 2): String = {
    def base(idBase: Long,
             date: String = s"'$day'", user: String = null, product: String = null,
             qty: String = "2", price: String = "50.0",
             pay: String = "'Visa'", st: String = "'Success'",
             idExpr: String = "id") = {
      val u = Option(user).getOrElse(
        s"CAST(floor(${rndSql("u", "id")} * $nUsers) + 1 AS BIGINT)")
      val p = Option(product).getOrElse(
        s"CAST(floor(${rndSql("p", "id")} * $nProducts) + 1 AS BIGINT)")
      s"""SELECT $idExpr AS transaction_id, $date AS date, $u AS user_id,
         |  $p AS product_id, CAST($qty AS INT) AS quantity,
         |  CAST($price AS DOUBLE) AS price, $pay AS payment_type, $st AS status
         |FROM range($idBase, ${idBase + perKind}) t(id)""".stripMargin
    }
    val Array(y, m, d) = day.split("-")
    Seq(
      base(9000, user = s"CAST(floor(${rndSql("u", "id")} * $nUsers) + 1 + 100000 AS BIGINT)"),
      base(9100, product = s"CAST(floor(${rndSql("p", "id")} * $nProducts) + 1 + 100000 AS BIGINT)"),
      base(9200, qty = "0"),
      base(9300, qty = "-3"),
      base(9400, price = "0.01"),
      base(9500, pay = "'Bitcoin'"),
      base(9600, st = "'Pending'"),
      base(9700, date = s"'$d-$m-$y'"),
      base(9800, idExpr = "id - 9800 + 1")
    ).mkString("\nUNION ALL\n")
  }
}
