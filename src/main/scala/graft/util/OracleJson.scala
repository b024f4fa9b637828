package graft.util

/** Serializes the oracle-SQL map as the flat JSON object the driver
  * (and tools/{check_oracle,oracle_types}.py) consume. Shared by
  * [[graft.Verify]] and the OracleTypesSpec guard so both paths emit
  * byte-identical JSON.
  */
object OracleJson {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def dump(oracles: Map[String, String]): String =
    oracles.map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")
}
