package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal / type converters mirroring the reference's on-demand string
  * parsers (reference: rapids-and-rivers-impl/src/main/kotlin/.../JsonMessage.kt:782-838).
  *
  * All converters take a STRING column (JSON temporal values are strings in
  * the reference's data model, SURVEY §1.3) and produce a typed column, with
  * `try`-semantics twins that yield null instead of failing — the analogue of
  * the reference's Optional variants and of `require(key, parser)` treating a
  * parser throw as a validation error.
  */
object Converters {

  /** Accepted ISO local forms: second precision with 0/1/2/3/6-digit
    * fractions, and minute precision — mirroring java.time's
    * ISO_LOCAL_DATE_TIME leniency the reference inherits (fractions of
    * width 4, 5, 7-9 are not representable in one Spark pattern and are
    * rejected; rare in practice).
    */
  private val LocalPatterns = Seq(
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]",
    "yyyy-MM-dd'T'HH:mm:ss[.SS][.S]",
    "yyyy-MM-dd'T'HH:mm")

  /** Offset suffixes: Z / +HH:MM (XXX), Z / +HH (X), +HHMM (XXXX). */
  private val InstantPatterns =
    LocalPatterns.flatMap(p => Seq(p + "XXX", p + "X", p + "XXXX"))

  private def tryAny(c: Column, patterns: Seq[String]): Column =
    patterns.map(p => try_to_timestamp(c, lit(p))).reduce(coalesce(_, _))

  /** JsonMessage.kt:786-787 asLocalDate — strict ISO date. */
  def asLocalDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** Lenient: null on unparseable/empty rather than error (JsonMessage.kt:792-796). */
  def asOptionalLocalDate(c: Column): Column =
    try_to_timestamp(nullif(c, lit("")), lit("yyyy-MM-dd")).cast("date")

  /** JsonMessage.kt:789-790 asYearMonth — "2020-01". */
  def asYearMonth(c: Column): Column = to_date(concat(c, lit("-01")), "yyyy-MM-dd")

  def asOptionalYearMonth(c: Column): Column =
    try_to_timestamp(concat(nullif(c, lit("")), lit("-01")), lit("yyyy-MM-dd")).cast("date")

  /** JsonMessage.kt:803 asLocalDateTime — ISO local, no zone suffix accepted
    * (null on parse failure; requireParsed turns that into a validation
    * error, the analogue of the reference's parser throw).
    */
  def asLocalDateTime(c: Column): Column = tryAny(c, LocalPatterns)

  def asOptionalLocalDateTime(c: Column): Column =
    tryAny(nullif(c, lit("")), LocalPatterns)

  /** JsonMessage.kt:805-810 asInstant — requires a zone/offset suffix. */
  def asInstant(c: Column): Column = tryAny(c, InstantPatterns)

  def asOptionalInstant(c: Column): Column =
    tryAny(nullif(c, lit("")), InstantPatterns)

  /** JsonMessage.kt:819-825 lenient: accept either an Instant (zoned) or a
    * LocalDateTime (unzoned, interpreted in session zone = UTC).
    */
  def asLocalDateTimeLenient(c: Column): Column =
    coalesce(asInstant(c), asLocalDateTime(c))

  def asInstantLenient(c: Column): Column = asLocalDateTimeLenient(c)

  def asOptionalLocalDateTimeLenient(c: Column): Column =
    asLocalDateTimeLenient(nullif(c, lit("")))

  /** UUID validation (JsonMessage.kt:782 String.toUUID) — value stays a string;
    * the check is format validity.
    */
  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
  def isUuid(c: Column): Column = c.rlike(UuidRe)
}
