package graft

/** Minimal JSON string escaping shared by the Verify/Bench output
  * writers: backslash, quote, and ALL control chars < 0x20 — a tab or
  * CR in an exception message or builder-authored SQL must not corrupt
  * the driver-parsed JSON line. */
object Json {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
