package graft

/**
 * Column-name path handling: separator-joined level paths with an escape
 * character, plus Spark backtick quoting.
 *
 * Semantics follow the reference's escape/split/join state machine
 * (nexpresso/hierarchical_packer.py:39-81, 2264-2337): level paths are
 * joined with `separator` (default "."); a field name that itself contains
 * the separator or the escape char has those characters prefixed with the
 * escape char ("\\" by default).
 *
 * Spark hazard: dots are meaningful in `df.col("a.b")`. Every internal
 * column reference in this library goes through [[ColName.quote]] so a
 * literal dotted top-level name resolves as one column.
 */
final case class ColName(separator: String = ColName.DefaultSeparator,
                         escapeChar: String = ColName.DefaultEscapeChar) {
  require(separator.length == 1, s"separator must be a single char, got '$separator'")
  require(escapeChar.length == 1, s"escape char must be a single char, got '$escapeChar'")
  require(separator != escapeChar, "separator and escape char must differ")

  private val sep = separator.charAt(0)
  private val esc = escapeChar.charAt(0)

  /** Escape a single field name so it can be embedded in a joined path. */
  def escapeField(field: String): String = {
    val sb = new StringBuilder(field.length + 4)
    field.foreach { c =>
      if (c == sep || c == esc) sb.append(esc)
      sb.append(c)
    }
    sb.toString
  }

  /** Inverse of [[escapeField]]. */
  def unescapeField(field: String): String = {
    val sb = new StringBuilder(field.length)
    var i = 0
    while (i < field.length) {
      val c = field.charAt(i)
      if (c == esc && i + 1 < field.length) { sb.append(field.charAt(i + 1)); i += 2 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split a joined path into unescaped segments (escape-aware). */
  def splitPath(path: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < path.length) {
      val c = path.charAt(i)
      if (c == esc && i + 1 < path.length) { cur.append(path.charAt(i + 1)); i += 2 }
      else if (c == sep) { parts += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    parts += cur.toString
    parts.toSeq
  }

  /** Join unescaped segments into an escaped path. */
  def joinPath(segments: Seq[String]): String =
    segments.map(escapeField).mkString(separator)

  /** Backtick-quote a literal (possibly dotted) top-level column name for Spark. */
  def quote(name: String): String = ColName.quote(name)
}

object ColName {
  val DefaultSeparator = "."
  val DefaultEscapeChar = "\\"
  val default: ColName = ColName()

  /** Backtick-quote any literal column name so Spark treats it as one
    * top-level column even if it contains dots. Embedded backticks are
    * doubled per Spark identifier rules. */
  def quote(name: String): String = "`" + name.replace("`", "``") + "`"

  /** A Column referencing a literal top-level name (never a struct path). */
  def topCol(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(quote(name))
}
