package graft.messages

/** Dot-separated key paths ("a.b" reads nested field b of object a), the
  * reference's nested-key convention (JsonMessage.kt:35,763-768).
  */
object JsonPaths {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Compile a dot path to a variant/JSON path expression. Non-identifier
    * keys (envelope fields like `@id`, `@event_name`) use bracket quoting.
    * Spark's variant path grammar has no escape sequences inside quoted
    * segments, so a segment containing `'` switches to `["…"]` quoting; a
    * segment containing both quote kinds is unrepresentable and rejected
    * (same fail-fast posture as backtick keys on the fast path).
    */
  def variantPath(key: String): String =
    "$" + key.split('.').map {
      case k if Ident.pattern.matcher(k).matches() => "." + k
      case k if !k.contains("'") => "['" + k + "']"
      case k if !k.contains("\"") => "[\"" + k + "\"]"
      case k => throw new IllegalArgumentException(
        s"Key segment '$k' contains both quote characters and cannot be expressed as a variant path")
    }.mkString
}
