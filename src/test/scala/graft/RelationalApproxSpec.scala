package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.pipeline.Tables

/** approx_stats is gated by the BANDED oracle (exact values hash-compared
  * cross-engine; each engine attests its sketches land within published
  * error bounds). This spec drives the Spark side of that attestation
  * directly, with TIGHTER bands than the gate: HLL++ distinct within its
  * published 5% rsd, t-digest median within 5% of the exact median —
  * so a sketch regression trips here before it ever nears the gate's
  * 3σ/±1%-rank bands.
  */
class RelationalApproxSpec extends SparkSpec {

  test("approx sketches land within error bounds of the exact aggregates") {
    val sf = "/root/testdata/sf0.01"
    val banded = Relational.approxStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val raw = Tables.events(spark, sf)
      .groupBy((col("event_id") % 2).as("chain"))
      .agg(countDistinct(col("user_id")).as("users"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        expr("percentile(value, 0.5D)").as("median"),
        expr("approx_percentile(value, 0.5D, 10000)").as("approx_median"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(banded.keySet == raw.keySet && banded.nonEmpty)
    for ((chain, (n, exactUsers, usersInBand, medianInBand)) <- banded) {
      val (eUsers, aUsers, eMedian, aMedian) = raw(chain)
      assert(n > 0 && exactUsers == eUsers,
        s"chain $chain: gated exact_users $exactUsers vs recomputed $eUsers")
      assert(usersInBand && medianInBand,
        s"chain $chain: gate bands must hold on the fixture")
      assert(math.abs(aUsers - eUsers).toDouble / eUsers <= 0.05,
        s"chain $chain: approx users $aUsers vs exact $eUsers")
      assert(math.abs(aMedian - eMedian) / math.abs(eMedian) <= 0.05,
        s"chain $chain: approx median $aMedian vs exact $eMedian")
    }
  }
}
