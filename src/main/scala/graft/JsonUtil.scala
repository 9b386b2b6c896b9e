package graft

/** The ONE JSON string escaper every record writer shares — Verify's
  * oracle_sql.json, Bench's oracle temp file and stdout/record lines. Two
  * drifting copies of the escape table would corrupt one of the producers
  * the driver parses (backslash, quote, and ALL control chars < 0x20 must
  * escape, or a tab in builder-authored SQL silently zeroes a round's
  * correctness record). */
object JsonUtil {
  def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
