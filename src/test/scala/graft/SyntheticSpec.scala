package graft

import org.apache.spark.sql.functions._
import graft.gen.Synthetic

/** Generators: determinism, shape, and the mutation operators that drive
  * SCD2 re-versioning (reference populate.py change_existent_*).
  */
class SyntheticSpec extends SparkSpec {
  import spark.implicits._

  test("generators are deterministic and fully distributed (no driver loops)") {
    val u1 = Synthetic.users(spark, 100)
    val u2 = Synthetic.users(spark, 100)
    assert(sortedRows(u1) === sortedRows(u2))
    assert(u1.count() === 100)
    val p = Synthetic.products(spark, 50)
    assert(p.filter(col("price") < 10 || col("price") >= 100).count() === 0)
    assert(p.select("category").distinct().count() <= Synthetic.categories.length)
  }

  test("transactions: price is the line total, ~20% multi-product") {
    val tx = Synthetic.transactions(spark, 1000, "2025-01-01", 50, 20)
    val n = tx.count()
    assert(n > 1000 && n < 1400) // base + ~20% multi-product echoes
    val perId = tx.groupBy("transaction_id").count()
    assert(perId.filter(col("count") > 1).count() > 100) // multi-product ids exist
  }

  test("transactionsWeighted follows the reference's pick distributions") {
    val users = Synthetic.users(spark, 50)
    val products = Synthetic.products(spark, 40)
    val tx = Synthetic.transactionsWeighted(spark, 20000, "2025-01-01", users, products)
    val n = tx.count().toDouble
    // status weights 0.9/0.1 (populate.py:219-226)
    val succ = tx.filter(col("status") === "Success").count() / n
    assert(succ > 0.885 && succ < 0.915, s"success fraction $succ")
    // stock-weighted product pool (populate.py:209-213): per-product pick
    // counts track weight/totalWeight within a generous z-bound
    val w = least(greatest(col("stock"), lit(1)), lit(10))
    val weights = products.filter(col("stock") >= 1)
      .select(col("product_id"), w.as("w"))
    val totalW = weights.agg(sum("w")).first().getLong(0).toDouble
    val offTarget = weights
      .join(tx.groupBy("product_id").count(), Seq("product_id"), "left_outer")
      .withColumn("c", coalesce(col("count"), lit(0L)).cast("double"))
      .withColumn("e", col("w") / totalW * n)
      .filter(abs(col("c") - col("e")) > greatest(lit(30.0), sqrt(col("e")) * 6))
    assert(offTarget.count() === 0, offTarget.collect().mkString(", "))
    // out-of-stock products are never picked; qty ∈ [1, min(5, stock)]
    // (populate.py:258-262, 280-282)
    val cat = products.select(col("product_id"), col("stock").as("cat_stock"))
    val joined = tx.join(cat, Seq("product_id"))
    assert(tx.join(cat.filter(col("cat_stock") < 1), Seq("product_id"), "left_semi").count() === 0)
    assert(joined.filter(col("quantity") < 1 ||
      col("quantity") > least(lit(5), col("cat_stock"))).count() === 0)
  }

  test("applyStockDecrements: success-only, clamped at zero") {
    val products = Synthetic.products(spark, 40)
    // small batch so stocks don't all clamp to zero (avg sold << avg stock)
    val tx = Synthetic.transactionsWeighted(spark, 300, "2025-01-01",
      Synthetic.users(spark, 50), products)
    val after = Synthetic.applyStockDecrements(products, tx)
    val sold = tx.filter(col("status") === "Success")
      .groupBy("product_id").agg(sum("quantity").as("sold"))
    val check = products.select(col("product_id"), col("stock").as("s0"))
      .join(after.select(col("product_id"), col("stock").as("s1")), Seq("product_id"))
      .join(sold, Seq("product_id"), "left_outer")
      .withColumn("expected", greatest(lit(0L), col("s0") - coalesce(col("sold"), lit(0L))))
    assert(check.filter(col("s1") =!= col("expected")).count() === 0)
    assert(after.filter(col("stock") < 0).count() === 0)
    // failed transactions decrement nothing (populate.py:281-283): counting
    // ALL sales would land on a different stock for some product
    val soldAll = tx.groupBy("product_id").agg(sum("quantity").as("sold_all"))
    assert(tx.filter(col("status") === "Failed").count() > 0)
    assert(check.join(soldAll, Seq("product_id"))
      .filter(greatest(lit(0L), col("s0") - col("sold_all")) =!= col("s1")).count() > 0)
  }

  test("duplicate injection copies existing transaction ids when a corpus is given") {
    val tx = Synthetic.transactions(spark, 500, "2025-01-01", 50, 20)
    val (_, _, badT) = Synthetic.invalid(spark, "2025-01-01", 50, 20, 2, Some(tx))
    val dupIds = badT.filter(col("transaction_id") < 9000)
      .select("transaction_id").as[Long].collect()
    assert(dupIds.length === 2)
    val existing = tx.select("transaction_id").as[Long].collect().toSet
    assert(dupIds.forall(existing), s"non-existing ids: ${dupIds.filterNot(existing).mkString(",")}")
    // the other 8 kinds are untouched by the corpus-aware variant
    assert(badT.count() === 18)
  }

  test("mutateUsers changes ~frac of users and nothing else") {
    val base = Synthetic.users(spark, 200)
    val mut = Synthetic.mutateUsers(base, 0.2)
    val changed = base.as("a").join(mut.as("b"), "user_id")
      .filter(col("a.name") =!= col("b.name") || col("a.email") =!= col("b.email"))
    val nChanged = changed.count()
    assert(nChanged > 20 && nChanged < 60) // ~40 expected at frac=0.2
    assert(mut.count() === 200)
    // deterministic: same frac + tag → same mutation set
    assert(sortedRows(Synthetic.mutateUsers(base, 0.2)) === sortedRows(mut))
  }

  test("mutateProducts price changes re-version dim_product via Scd2") {
    val base = Synthetic.products(spark, 100)
    val dim = graft.dims.Scd2(Seq("product_id"), Seq("name", "category", "price"), "product_sk")
    val snap0 = dim.init(base.drop("stock"), lit("2025-01-01"))
    val mut = Synthetic.mutateProducts(base, 0.3)
    val snap1 = dim.merge(snap0, mut.drop("stock"), "2025-02-01", to_date(lit("2025-02-01")))
    val nPriceChanged = base.as("a").join(mut.as("b"), "product_id")
      .filter(col("a.price") =!= col("b.price")).count()
    // each price change -> one expired + one new version
    assert(snap1.count() === 100 + nPriceChanged)
    assert(snap1.filter(col("current_flag") === 0).count() === nPriceChanged)
    // stock-only changes must NOT version (stock is excluded from the dim)
    val stockOnly = base.as("a").join(mut.as("b"), "product_id")
      .filter(col("a.stock") =!= col("b.stock") && col("a.price") === col("b.price")).count()
    assert(stockOnly > 0)
  }
}
