package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native expressions resolvable from plain
  * SQL text on a session built with `withExtensions` — no imperative
  * registration call anywhere on the user's path.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) resolves vec_dot and sorted_intersect_count in SQL") {
    // reuse the shared SparkContext but force a NEW SparkSession so the
    // builder applies the extensions (getOrCreate would hand back the
    // default session and skip them)
    SparkSpec.session // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = try {
      SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
    } finally {
      SparkSession.setActiveSession(SparkSpec.session)
      SparkSession.setDefaultSession(SparkSpec.session)
    }
    val row = s.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 2L)
    // the text kernels resolve from SQL text too
    val k = s.sql(
      """SELECT simhash56(array('a', 'b', 'c', 'a')) AS sh,
        |       ngram_stats(array('a', 'b', 'c', 'a')).total_3grams AS tot,
        |       size(shingle_hashes(array('a', 'b', 'c', 'a'))) AS nsh,
        |       size(minhash_sig(array('a', 'b', 'c'), 12)) AS nmh,
        |       size(winnow_fps(array('a','b','c','d','e','f','g'), 3, 2)) AS nwf
        |""".stripMargin).collect().head
    assert(k.getLong(1) == 2L) // 4 tokens -> 2 raw 3-grams
    assert(k.getInt(2) == 2)   // both 3-grams distinct
    assert(k.getInt(3) == 12)
    assert(k.getInt(4) >= 1)
  }
}
