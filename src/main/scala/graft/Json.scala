package graft

/** Minimal JSON string quoting shared by the two artifact writers (Verify's
  * oracle_sql.json/errors.json and Bench's errors field). One escaper on
  * purpose: these artifacts are parsed by the driver's `json.load`, and an
  * escaping bug silently zeroes a round's correctness record — the fix must
  * never need applying in two places. Escapes backslash, quote, and ALL
  * control chars (<0x20), since builder-authored SQL carries tabs/newlines. */
object Json {
  /** A double as a JSON value: finite → its literal; NaN/±Inf → `null`
    * (bare `NaN` is not JSON and breaks the consumer's `json.load`). */
  private[graft] def num(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "null"

  private[graft] def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
