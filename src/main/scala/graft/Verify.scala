package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query's result to `outDir/<name>/` parquet. A query that
    * throws (analysis or execution) must be a VISIBLE red row, not a silent
    * absence from the round's correctness record — the exact hole Bench
    * closed with its "errors" field in r4. Failures land in
    * `outDir/_errors.json`, written even when empty so its presence proves
    * the accounting ran. Returns the error map for tests.
    */
  /** Oracle-geometry tie: the DuckDB oracle SQL for the hyperplane-LSH
    * family bakes the fixed [[ops.Dedup.HYP_BITS]]-bit bucket constants
    * into static text, while the Spark side computes
    * [[ops.Dedup.hypBitsFor]](n) — a function of corpus size. The two
    * agree iff the gated fixture stays small enough that the occupancy
    * pin returns the base width. This check makes that dependency LOUD:
    * a grown fixture fails here with a named cause instead of surfacing
    * as an inscrutable hash mismatch in the driver's compare. Rehearsal
    * corpora never pass through Verify, so the wider geometry stays
    * available to them.
    */
  private def assertOracleGeometry(spark: SparkSession, sfDir: String): Unit = {
    // a dir without the embeddings fixture (unit-test stubs) has no LSH
    // query to protect — those queries fail visibly on their own scan
    if (!Files.exists(Paths.get(s"$sfDir/embeddings.parquet"))) return
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val bits = ops.Dedup.hypBitsFor(n)
    require(bits == ops.Dedup.HYP_BITS,
      s"oracle geometry violated: $sfDir has $n vectors -> hypBitsFor = " +
        s"$bits, but the static DuckDB oracles bake ${ops.Dedup.HYP_BITS}-bit " +
        "buckets. Regenerate the LSH oracle SQL at the computed width (or " +
        "shrink the gated fixture) before trusting any hash compare.")
  }

  def dump(spark: SparkSession,
           queries: Map[String, (SparkSession, String) => DataFrame],
           sfDir: String, outDir: String): Map[String, String] = {
    assertOracleGeometry(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try {
        // drop any previous dump first: a query failing BEFORE its write
        // starts must not leave a stale (passing) result behind in a
        // reused outDir
        val target = Paths.get(s"$outDir/$name")
        if (Files.exists(target)) {
          Files.walk(target).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
        }
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(500)}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
      }
    }
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional comma-separated subset for fast local iteration; the
    // driver always calls with exactly (sfDir, outDir) → full run
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // size the generated-class cache to the suite (see Bench): queries
      // sharing subplans (the assembly chain) reuse compiled classes
      // instead of re-Janino-compiling after eviction
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dump(spark,
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) },
      sfDir, outDir)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
