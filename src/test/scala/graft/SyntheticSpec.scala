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
