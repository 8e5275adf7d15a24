package graft.tools

/** Minimal JSON writer for the driver-facing artifacts (oracle_sql.json,
  * errors.json). Escapes backslash, quote, and ALL control chars (<0x20)
  * — a tab or CR in builder-authored SQL would otherwise make the
  * driver's json.load fail and silently zero the round's correctness.
  */
object JsonOut {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def obj(kvs: Iterable[(String, String)]): String =
    kvs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}
