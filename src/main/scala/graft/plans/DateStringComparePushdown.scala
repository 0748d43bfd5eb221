package graft.plans

import java.time.{LocalDate, ZoneId}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}

/** Optimizer rule: comparisons of `date_format(col, 'yyyy-MM-dd')` against
  * a string literal become native date/timestamp comparisons, so the
  * predicate reaches the parquet scan (PushedFilters / row-group pruning)
  * instead of evaluating a formatter per row behind an opaque string
  * compare. This is the single most common pushdown-killing pattern in
  * user queries (the reference's raw-string daily extract has exactly this
  * shape), and at 100 TB it is the difference between pruned row groups
  * and a full fact scan.
  *
  * Rewrites (ISO `yyyy-MM-dd` format only, literal must parse strictly):
  *  - DATE column, any comparison op: compare the column to the DATE
  *    literal directly — zero-padded ISO strings order exactly like the
  *    dates they render (for 4-digit years, the DateType norm; years
  *    ≥ 10000 already compared wrongly as strings, so nothing regresses).
  *  - TIMESTAMP column: each op becomes a half-open bound on the day
  *    boundary in the SESSION time zone (the same zone `date_format`
  *    renders in, DST-correct via ZonedDateTime):
  *    `= d` → `[start(d), start(d+1))`, `<= d` → `< start(d+1)`,
  *    `> d` → `>= start(d+1)`, `< d` → `< start(d)`, `>= d` → `>= start(d)`.
  *    `<=>` is NOT rewritten for timestamps (the conjunction form maps a
  *    null input to null where `<=>` yields false — visible outside
  *    filters).
  *
  * Null semantics are preserved: both the formatted and the native form
  * null-propagate identically for every rewritten op. Unparseable or
  * non-ISO literals are left untouched (their string-compare semantics
  * genuinely differ). Injected via [[graft.functions.GraftExtensions]].
  */
object DateStringComparePushdown extends Rule[LogicalPlan] {

  private val isoFmt = DateTimeFormatter.ISO_LOCAL_DATE

  private def isIsoFormat(fmt: Expression): Boolean = fmt match {
    case Literal(s, StringType) => s != null && s.toString == "yyyy-MM-dd"
    case _ => false
  }

  private def parseDay(lit: Literal): Option[LocalDate] = lit match {
    case Literal(s, StringType) if s != null =>
      try Some(LocalDate.parse(s.toString, isoFmt)) catch { case _: Exception => None }
    case _ => None
  }

  private def dateLit(d: LocalDate): Literal =
    Literal(d.toEpochDay.toInt, DateType)

  /** Day-boundary micros in the zone the MATCHED date_format renders in —
    * its analysis-time-resolved timeZoneId, not the (possibly since
    * changed) optimization-time session zone. */
  private def dayStartMicros(d: LocalDate, tz: Option[String]): Long = {
    val zone = ZoneId.of(tz.getOrElse(SQLConf.get.sessionLocalTimeZone))
    ChronoUnit.MICROS.between(java.time.Instant.EPOCH, d.atStartOfDay(zone).toInstant)
  }

  private def tsLit(d: LocalDate, tz: Option[String]): Literal =
    Literal(dayStartMicros(d, tz), TimestampType)

  /** Naive (zone-less) day-boundary micros for TIMESTAMP_NTZ bounds. */
  private def ntzLit(d: LocalDate): Literal =
    Literal(ChronoUnit.MICROS.between(
      java.time.Instant.EPOCH,
      d.atStartOfDay.toInstant(java.time.ZoneOffset.UTC)), TimestampNTZType)

  /** A zone with no DST transitions (fixed offset): there the NTZ→LTZ cast
    * renders back to the identical naive value under `date_format`, so
    * unwrapping the cast and comparing naive bounds is exact. In a DST zone
    * a skipped local hour at a day boundary could shift the rendered date,
    * so the rewrite stays off. */
  private def fixedOffset(tz: Option[String]): Boolean =
    try ZoneId.of(tz.getOrElse(SQLConf.get.sessionLocalTimeZone))
      .getRules.isFixedOffset
    catch { case _: Exception => false }

  /** The timestamp rewrite for `date_format(ts) <op> day`, or None when the
    * op has no single/range bound form we rewrite. */
  private def tsRewrite(cmp: BinaryComparison, ts: Expression, day: LocalDate,
                        tz: Option[String]): Option[Expression] =
    cmp match {
      case _: EqualTo => Some(And(
        GreaterThanOrEqual(ts, tsLit(day, tz)), LessThan(ts, tsLit(day.plusDays(1), tz))))
      case _: LessThan => Some(LessThan(ts, tsLit(day, tz)))
      case _: LessThanOrEqual => Some(LessThan(ts, tsLit(day.plusDays(1), tz)))
      case _: GreaterThan => Some(GreaterThanOrEqual(ts, tsLit(day.plusDays(1), tz)))
      case _: GreaterThanOrEqual => Some(GreaterThanOrEqual(ts, tsLit(day, tz)))
      case _ => None // EqualNullSafe: null → false vs null, not filter-safe everywhere
    }

  /** Mirror an op for literal-on-the-left shapes: `'d' < f(c)` ⟺ `f(c) > 'd'`. */
  private def flip(cmp: BinaryComparison, l: Expression, r: Expression): BinaryComparison =
    cmp match {
      case _: LessThan => GreaterThan(l, r)
      case _: LessThanOrEqual => GreaterThanOrEqual(l, r)
      case _: GreaterThan => LessThan(l, r)
      case _: GreaterThanOrEqual => LessThanOrEqual(l, r)
      case _: EqualTo => EqualTo(l, r)
      case other => other.withNewChildren(Seq(l, r)).asInstanceOf[BinaryComparison]
    }

  /** The NTZ twin of [[tsRewrite]]: naive day-boundary bounds, no zone. */
  private def ntzRewrite(cmp: BinaryComparison, ts: Expression,
                         day: LocalDate): Option[Expression] =
    cmp match {
      case _: EqualTo => Some(And(
        GreaterThanOrEqual(ts, ntzLit(day)), LessThan(ts, ntzLit(day.plusDays(1)))))
      case _: LessThan => Some(LessThan(ts, ntzLit(day)))
      case _: LessThanOrEqual => Some(LessThan(ts, ntzLit(day.plusDays(1))))
      case _: GreaterThan => Some(GreaterThanOrEqual(ts, ntzLit(day.plusDays(1))))
      case _: GreaterThanOrEqual => Some(GreaterThanOrEqual(ts, ntzLit(day)))
      case _ => None
    }

  private def rewrite(cmp: BinaryComparison, fmtChild: Expression,
                      day: LocalDate, tz: Option[String]): Option[Expression] =
    fmtChild match {
      // Spark 4.1+ reads parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ; the
      // analyzer then wraps the column in Cast(ntz AS timestamp) under
      // date_format. That cast blocks parquet pushdown — but when the
      // cast's zone and date_format's render zone agree (both resolve from
      // the same session) and the zone has no DST, cast-then-render is the
      // identity on the naive value, so we unwrap and bound the BARE NTZ
      // attribute: the predicate reaches PushedFilters / row-group pruning.
      case Cast(inner, TimestampType, castTz, _) if inner.dataType == TimestampNTZType =>
        // Zero-offset render zone: unwrap and bound the bare NTZ attribute.
        // ANY other zone: leave the expression COMPLETELY alone — do not
        // fall through to tsRewrite on the cast. Rewriting on the cast is
        // sound by itself (zoned day-start instants), but it arms Spark's
        // own UnwrapCastInBinaryComparison, which converts the instant
        // bounds back to naive NTZ literals and is unsound across a DST
        // gap: the NTZ→LTZ cast maps every naive value inside a skipped
        // interval AND the first value after it to the same instant, so a
        // single naive bound cannot represent the instant bound (observed:
        // Pacific/Apia's skipped 2011-12-30 — the rewrite dropped the
        // whole gap day from an equality extract; PlanRuleSpec pins it).
        if (castTz == tz && fixedOffset(tz)) ntzRewrite(cmp, inner, day) else None
      case _ => fmtChild.dataType match {
        case DateType => cmp match {
          case _: EqualTo | _: EqualNullSafe | _: LessThan | _: LessThanOrEqual |
               _: GreaterThan | _: GreaterThanOrEqual =>
            Some(cmp.withNewChildren(Seq(fmtChild, dateLit(day))))
          case _ => None
        }
        case TimestampType => tsRewrite(cmp, fmtChild, day, tz)
        case TimestampNTZType => ntzRewrite(cmp, fmtChild, day)
        case _ => None
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case cmp: BinaryComparison => (cmp.left, cmp.right) match {
      case (DateFormatClass(child, fmt, tz), l: Literal) if isIsoFormat(fmt) =>
        parseDay(l).flatMap(rewrite(cmp, child, _, tz)).getOrElse(cmp)
      case (l: Literal, DateFormatClass(child, fmt, tz)) if isIsoFormat(fmt) =>
        parseDay(l).flatMap(d => rewrite(flip(cmp, cmp.right, cmp.left), child, d, tz))
          .getOrElse(cmp)
      case _ => cmp
    }
  }
}
