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

  test("rolling price stats: window ramp, constant-series volatility 0, single row NULL") {
    val daily = (1 to 9).map(d => (0L, Date.valueOf(f"2024-01-0$d"), 5.0)) :+
      ((1L, Date.valueOf("2024-01-01"), 3.0)) // lone row on the other chain
    val got = ReferencePipeline.rollingStats(
        daily.toDF("chain", "price_date", "price"))
      .select("chain", "price_date", "ma7", "vol7", "n_win")
      .as[(Long, String, Double, Option[Double], Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // n_win ramps 1..7 then stays 7 (rows-framed, per-chain)
    assert(got((0L, "2024-01-03"))._3 == 3L)
    assert(got((0L, "2024-01-08"))._3 == 7L)
    assert(got((0L, "2024-01-09"))._3 == 7L)
    // constant series: ma7 = the price, vol7 = 0 once n_win >= 2
    assert(got((0L, "2024-01-09"))._1 == 5.0)
    assert(got((0L, "2024-01-05"))._2.contains(0.0))
    // one-row windows have no sample variance: NULL, not inf/NaN
    assert(got((0L, "2024-01-01"))._2.isEmpty)
    assert(got((1L, "2024-01-01"))._2.isEmpty)
  }
}
