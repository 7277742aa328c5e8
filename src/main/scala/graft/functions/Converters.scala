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

  private val IsoLocalDateTime = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]"
  private val IsoInstant       = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][.SSS]X"

  /** JsonMessage.kt:786-787 asLocalDate — strict ISO date. */
  def asLocalDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** Lenient: null on unparseable/empty rather than error (JsonMessage.kt:792-796). */
  def asOptionalLocalDate(c: Column): Column =
    try_to_timestamp(nullif(c, lit("")), lit("yyyy-MM-dd")).cast("date")

  /** JsonMessage.kt:789-790 asYearMonth — "2020-01". */
  def asYearMonth(c: Column): Column = to_date(concat(c, lit("-01")), "yyyy-MM-dd")

  def asOptionalYearMonth(c: Column): Column =
    try_to_timestamp(concat(nullif(c, lit("")), lit("-01")), lit("yyyy-MM-dd")).cast("date")

  /** JsonMessage.kt:803 asLocalDateTime — ISO local, no zone suffix accepted. */
  def asLocalDateTime(c: Column): Column = to_timestamp(c, IsoLocalDateTime)

  def asOptionalLocalDateTime(c: Column): Column =
    try_to_timestamp(nullif(c, lit("")), lit(IsoLocalDateTime))

  /** JsonMessage.kt:805-810 asInstant — requires zone/offset suffix. */
  def asInstant(c: Column): Column = to_timestamp(c, IsoInstant)

  def asOptionalInstant(c: Column): Column =
    try_to_timestamp(nullif(c, lit("")), lit(IsoInstant))

  /** JsonMessage.kt:819-825 lenient: accept either an Instant (zoned) or a
    * LocalDateTime (unzoned, interpreted in session zone = UTC).
    */
  def asLocalDateTimeLenient(c: Column): Column =
    coalesce(try_to_timestamp(c, lit(IsoInstant)), try_to_timestamp(c, lit(IsoLocalDateTime)))

  def asInstantLenient(c: Column): Column = asLocalDateTimeLenient(c)

  def asOptionalLocalDateTimeLenient(c: Column): Column =
    asLocalDateTimeLenient(nullif(c, lit("")))

  /** UUID validation (JsonMessage.kt:782 String.toUUID) — value stays a string;
    * the check is format validity.
    */
  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
  def isUuid(c: Column): Column = c.rlike(UuidRe)
}
