package graft.validate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's full data contract as `Column` predicates — one `Rule`
  * per check in `DataValidator` (reference ETL/validation.py:31-176), with
  * the same error_type keys, severities and message shapes.
  *
  * Each catalog is evaluated by [[Validator]] in ONE projection pass
  * (SURVEY.md §2.9 U1): no per-row loops, no UDFs — every predicate is a
  * codegen'd expression, so the whole contract costs one scan at any scale.
  */
object Rules {

  val validPaymentTypes: Seq[String] = Seq("visa", "mastercard", "wire transfer", "other")
  val validStatuses: Seq[String] = Seq("success", "failed")
  val emailPattern = "^[^\\s@]+@[^\\s@]+\\.[^\\s@]+$"

  /** Python renders None as "None" inside f-strings; keep message parity. */
  private def pyStr(c: Column): Column = coalesce(c.cast("string"), lit("None"))

  /** Multi-format date parser (reference validation.py:89-103, SURVEY F4).
    * Branch order matters and is reproduced exactly:
    *   1. `%Y-%m-%d` (non-padded month/day accepted, as in strptime)
    *   2. else, if the string contains '/': `%Y/%m/%d`
    *   3. else, if it contains 'T': ISO date = the prefix before 'T'
    *      (padded, as `datetime.fromisoformat`)
    *   4. else, if it is exactly 8 digits: `%Y%m%d`
    *   5. else: unparseable → null (callers raise `bad_date_format`)
    */
  def parseMultiDate(c: Column): Column =
    coalesce(
      try_to_date(c, "yyyy-M-d"),
      when(c.contains("/"), try_to_date(c, "yyyy/M/d"))
        .when(c.contains("T"), try_to_date(substring_index(c, "T", 1), "yyyy-MM-dd"))
        .when(c.rlike("^\\d{8}$"), try_to_date(c, "yyyyMMdd"))
    )

  /** User contract (validation.py:34-58). All three checks share the
    * reference's single `invalid_user` error_type; any firing rejects. */
  def userRules(userId: Column, name: Column, email: Column, joinDate: Column): Seq[Rule] = Seq(
    Rule.error("invalid_user",
      name.isNull || trim(name) === "",
      format_string("Empty name for user %s", pyStr(userId))),
    Rule.error("invalid_user",
      email.isNull || !email.rlike(emailPattern),
      format_string("Invalid email \"%s\" for user %s", pyStr(email), pyStr(userId))),
    Rule.error("invalid_user",
      joinDate.isNull,
      format_string("NULL join_date for user %s", pyStr(userId)))
  )

  /** Product contract (validation.py:60-87). */
  def productRules(productId: Column, name: Column, price: Column, stock: Column): Seq[Rule] = Seq(
    Rule.error("invalid_product",
      name.isNull || trim(name) === "",
      format_string("Empty name for product %s", pyStr(productId))),
    Rule.error("price_ge_10000",
      price >= 10000,
      format_string("Product %s price %s >= 10000", pyStr(productId), pyStr(price))),
    Rule.error("negative_stock",
      stock < 0,
      format_string("Product %s has negative stock %s", pyStr(productId), pyStr(stock)))
  )

  /** Transaction contract (validation.py:105-165).
    *
    * Cross-entity inputs (U2): callers left-join the already-validated
    * users/products of the SAME run onto the transaction rows first and
    * pass the resulting columns — `userKnown`/`productKnown` are the
    * existence flags (J1 folded into one pass) and `expectedPrice` is the
    * valid product's unit price (J4).
    *
    * In-batch duplicate detection (A7) needs a window, not a per-row
    * predicate: callers pass `dupOccurrence` = `row_number() over
    * (partition by transaction_id order by <extract order>)`; occurrence
    * ≥ 2 logs a warning (never rejects), exactly the reference's
    * `seen_tx_ids` insertion-order behavior (validation.py:155-159).
    *
    * The price-mismatch guard (U3) fires only when every error-severity
    * check passed and quantity > 0 (validation.py:161) — expressed here by
    * nesting the other checks' negation into its condition.
    */
  def transactionRules(txId: Column, dateStr: Column, userId: Column, productId: Column,
                       quantity: Column, paymentType: Column, status: Column, total: Column,
                       userKnown: Column, productKnown: Column,
                       expectedPrice: Column, dupOccurrence: Column): Seq[Rule] = {
    val qtyZero = quantity === 0
    val qtyNeg = quantity < 0
    val payBad = !lower(coalesce(paymentType, lit(""))).isin(validPaymentTypes.map(lit(_)): _*)
    val statusBad = !lower(coalesce(status, lit(""))).isin(validStatuses.map(lit(_)): _*)
    val dateBad = parseMultiDate(dateStr).isNull
    val anyError = !userKnown || !productKnown || qtyZero || qtyNeg || payBad || statusBad || dateBad
    Seq(
      Rule.error("orphan_user", !userKnown,
        format_string("Transaction %s references non-existent user %s",
          pyStr(txId), pyStr(userId))),
      Rule.error("orphan_product", !productKnown,
        format_string("Transaction %s references non-existent product %s",
          pyStr(txId), pyStr(productId))),
      Rule.error("qty_zero", qtyZero,
        format_string("Transaction %s has zero quantity", pyStr(txId))),
      Rule.error("qty_negative", qtyNeg,
        format_string("Transaction %s has negative quantity %s", pyStr(txId), pyStr(quantity))),
      Rule.error("invalid_payment_type", payBad,
        format_string("Transaction %s has invalid payment_type \"%s\"",
          pyStr(txId), pyStr(paymentType))),
      Rule.error("invalid_status", statusBad,
        format_string("Transaction %s has invalid status \"%s\"", pyStr(txId), pyStr(status))),
      Rule.error("bad_date_format", dateBad,
        format_string("Transaction %s has unparseable date \"%s\"", pyStr(txId), pyStr(dateStr))),
      Rule.warning("duplicate_tx_id", dupOccurrence >= 2,
        format_string("Duplicate transaction_id %s", pyStr(txId))),
      // try_divide: ANSI-safe — qty=0 rows never take this branch but the
      // division must not be able to throw regardless of evaluation order
      Rule.warning("price_mismatch",
        expectedPrice.isNotNull && !anyError && quantity > 0 &&
          abs(try_divide(total, quantity) - expectedPrice) > 0.01,
        format_string("Transaction %s price mismatch: expected %s, got %s",
          pyStr(txId), pyStr(expectedPrice), pyStr(try_divide(total, quantity))))
    )
  }
}
