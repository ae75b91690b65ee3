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
  }
}
