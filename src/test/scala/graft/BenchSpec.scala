package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

class BenchSpec extends SparkSpec {

  test("bench surfaces a failing query in errors instead of a ~0s time") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, _) => s.range(3).toDF("x")),
      "boom" -> ((_, _) => throw new RuntimeException("deliberate failure")))
    val (times, errors) = Bench.runAll(spark, qs, "unused")
    assert(times.keySet == Set("ok", "boom"), "every query must be timed")
    assert(errors.keySet == Set("boom"), "only the failing query may error")
    assert(errors("boom").contains("deliberate failure"))
    assert(errors("boom").contains("RuntimeException"))
  }
}
