package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump a single SparkEntry query + its oracle (targeted gate runs). */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args.take(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keep = names.split(",").toSet
    graft.Verify.dump(spark,
      graft.SparkEntry.queries.filter(kv => keep.contains(kv._1)),
      sfDir, outDir)
    def esc(x: String) = x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val body = graft.SparkEntry.oracleSql.filter(kv => keep.contains(kv._1))
      .map { case (k, v) => "\"" + esc(k) + "\": \"" + esc(v) + "\"" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      body.getBytes("UTF-8"))
    spark.stop()
  }
}
