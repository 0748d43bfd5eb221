package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Let-binding for Column expression trees.
  *
  * Spark evaluates higher-order-function lambdas interpreted, and a FREE
  * subexpression referenced inside a lambda body is re-evaluated at every
  * reference — `transform(sequence(...), i => f(expensive, i))` recomputes
  * `expensive` once per element. Catalyst's subexpression elimination only
  * applies inside whole-stage codegen, which higher-order functions opt out
  * of, so nothing rescues the interpreted path.
  *
  * `letOnce(e)(body)` forces exactly-once evaluation by binding `e` as a
  * lambda variable: `element_at(transform(array(e), x => body(x)), 1)`.
  * The HOF evaluates its input `array(e)` once; every reference inside
  * `body` is then a bound variable read, not a recomputation. Cost: one
  * 1-element array allocation per row — noise next to what it saves
  * (measured: the 3-gram shingle pipeline over text columns dropped ~10×).
  */
object Let {
  def letOnce(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), x => body(x)), 1)

  /** Two bindings (each evaluated once, independent). */
  def letOnce2(e1: Column, e2: Column)(body: (Column, Column) => Column): Column =
    letOnce(e1)(x1 => letOnce(e2)(x2 => body(x1, x2)))
}
