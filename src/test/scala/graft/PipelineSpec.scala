package graft

import java.sql.{Date, Timestamp}

import graft.pipeline.ReferencePipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("enrich: CASE dollar value — equal-stake, changed-stake (abs), failed (0, kept: quirk Q7)") {
    val tx = Seq(
      (1L, ts("2024-01-11 01:00:00"), 10L, 5.0, 5.0, true, 0L),  // equal: 5*2
      (2L, ts("2024-01-11 02:00:00"), 11L, 3.0, 8.0, true, 0L),  // abs(-5)*2
      (3L, ts("2024-01-11 03:00:00"), 12L, 9.0, 1.0, false, 0L)) // failed: 0, kept
      .toDF("_id", "createdAt", "stashId", "stake", "alreadyBonded", "successful", "chain")
    val price = Seq((0L, Date.valueOf("2024-01-11"), 2.0))
      .toDF("chain", "price_date", "price")
    val got = ReferencePipeline.enrich(tx, price)
      .select("_id", "priceUSD", "txDollarValue")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 3) // failed row kept
    assert(got(1L) == ((1L, 2.0, 10.0)))
    assert(got(2L) == ((2L, 2.0, 10.0)))
    assert(got(3L) == ((3L, 2.0, 0.0)))
  }

  test("enrich is inner-join strict: a tx day without a price row drops (quirk Q5 stance)") {
    val tx = Seq((1L, ts("2024-01-12 01:00:00"), 10L, 5.0, 5.0, true, 0L))
      .toDF("_id", "createdAt", "stashId", "stake", "alreadyBonded", "successful", "chain")
    val price = Seq((0L, Date.valueOf("2024-01-11"), 2.0))
      .toDF("chain", "price_date", "price")
    assert(ReferencePipeline.enrich(tx, price).count() == 0)
  }

  test("anti-join append is idempotent: re-running over already-written ids appends nothing") {
    val incoming = graft.pipeline.Tables.tx(spark, "/root/testdata/sf0.001")
    val existing = incoming // first run wrote everything
    assert(incoming.join(existing.select("_id"), Seq("_id"), "left_anti").count() == 0)
  }

  test("price backfill covers exactly the gap days present in the source") {
    val rows = ReferencePipeline.priceBackfill(spark, "/root/testdata/sf0.001")
      .select("chain", "price_date").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, d) => d > "2024-01-10" && d <= "2024-01-30" })
    // one row per (chain, day), no duplicates
    assert(rows.distinct.length == rows.length)
  }
}
