package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is bit-identical to the HOF zip_with+aggregate fold") {
    val df = Seq(
      (1L, Array(0.1f, -2.5f, 3.75f), Array(1.5f, 0.25f, -4.0f)),
      (2L, Array.tabulate(64)(i => (i * 0.37f - 3f)), Array.tabulate(64)(i => (7f - i * 0.11f))),
      (3L, Array.empty[Float], Array.empty[Float]))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorFunctions.vec_dot(spark, "a", "b").as("fused"),
        expr("""aggregate(zip_with(a, b, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
               |         CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("hof"))
      .as[(Long, Double, Double)].collect()
    // exact equality: same fold order, same widening — not approx
    got.foreach { case (id, fused, hof) => assert(fused == hof, s"id=$id") }
  }

  test("vec_dot survives codegen (value matches interpreted eval) and SQL registration") {
    VectorFunctions.register(spark)
    val one = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(one == 1.5 * 2.0 + 2.0 * 0.5)
  }

  test("vec_dot rejects non-float-array inputs at analysis") {
    VectorFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(err.getMessage.contains("array<float>"))
  }
}
