package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT running any query
  * — the input tools/duckdb_baseline.py needs for a same-window bench
  * pairing (running full graft.Verify just to refresh the SQL text costs
  * ~10 min of cluster time the pairing doesn't need).
  * Usage: runMain graft.tools.OracleDump <outPath> [sfDir]
  * (sfDir selects scale-keyed fixture oracles — see SparkEntry.oracleSqlFor)
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
