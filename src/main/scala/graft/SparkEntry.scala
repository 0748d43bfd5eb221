package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{QCurate, QEtl, QLlm, QScale}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def registry: Seq[graft.queries.Qry] = QEtl.all ++ QLlm.all ++ QCurate.all ++ QScale.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the composed PIT fact-transaction load (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_fact_tx_load")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
