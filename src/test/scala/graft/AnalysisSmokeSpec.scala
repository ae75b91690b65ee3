package graft

/** Constructs EVERY `SparkEntry.queries` DataFrame against the real sf0.001
  * fixture and forces analysis (no execution). This is the gate the r8
  * regression proved missing: the driver fixture changed `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ and three queries stopped
  * analyzing while `sbt test` stayed green — their specs built in-memory
  * frames with the old type. Analysis against the fixture itself catches
  * any schema-vintage drift in seconds.
  *
  * Note: a few queries fit driver-held model state (k-means centroids, DSIR
  * buckets, BPE merges) at construction time, so this runs small jobs too —
  * still cheap at sf0.001, and a stronger check for exactly those queries.
  */
class AnalysisSmokeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every registered query analyzes against the sf0.001 fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sf).queryExecution.analyzed
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} queries failed analysis:\n${failures.mkString("\n")}")
  }

  test("every query has an oracle entry (approx_stats got its banded gate in r12)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracle: ${noOracle.mkString(", ")}")
  }

  test("README's stated query count matches SparkEntry.queries (no doc drift)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val stated = "(\\d+) named queries".r.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
    assert(stated.contains(SparkEntry.queries.size),
      s"README says $stated; SparkEntry.queries has ${SparkEntry.queries.size}")
  }

  test("SURVEY §2.13's stated query count matches SparkEntry.queries (no doc drift)") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val stated = """\*\*(\d+)/\d+\s*\n?\s*exact-hash matching""".r
      .findFirstMatchIn(survey).map(_.group(1).toInt)
    assert(stated.contains(SparkEntry.queries.size),
      s"SURVEY §2.13 says $stated; SparkEntry.queries has ${SparkEntry.queries.size}")
  }
}
