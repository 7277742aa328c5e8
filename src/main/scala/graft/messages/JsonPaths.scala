package graft.messages

/** Dot-separated key paths ("a.b" reads nested field b of object a), the
  * reference's nested-key convention (JsonMessage.kt:35,763-768).
  */
object JsonPaths {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Compile a dot path to a variant/JSON path expression. Non-identifier
    * keys (envelope fields like `@id`, `@event_name`) use bracket quoting.
    */
  def variantPath(key: String): String =
    "$" + key.split('.').map {
      case k if Ident.pattern.matcher(k).matches() => "." + k
      case k => "['" + k + "']"
    }.mkString
}
