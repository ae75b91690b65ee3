package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.pipeline.Tables

/** approx_stats has no DuckDB oracle (sketches differ across engines by
  * design) — instead, bound the estimates against the exact answers on
  * the fixture: HLL++ distinct within its published 5% error at this
  * precision, t-digest median within 5% of the exact median.
  */
class RelationalApproxSpec extends SparkSpec {

  test("approx sketches land within error bounds of the exact aggregates") {
    val sf = "/root/testdata/sf0.01"
    val approx = Relational.approxStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy((col("event_id") % 2).as("chain"))
      .agg(countDistinct(col("user_id")).as("users"),
        expr("percentile(value, 0.5)").as("median"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((chain, (aUsers, aMedian)) <- approx) {
      val (eUsers, eMedian) = exact(chain)
      assert(math.abs(aUsers - eUsers).toDouble / eUsers <= 0.05,
        s"chain $chain: approx users $aUsers vs exact $eUsers")
      assert(math.abs(aMedian - eMedian) / math.abs(eMedian) <= 0.05,
        s"chain $chain: approx median $aMedian vs exact $eMedian")
    }
  }
}
