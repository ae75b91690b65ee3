package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.ops.DataQuality
import graft.pipeline.Tables

/** Data-quality ledger: the production fixture is CLEAN, so `violations=0`
  * there proves nothing about detection — these tests plant one corruption
  * per rule through the `dqLedger` seam and assert each rule fires with the
  * exact planted count (and ONLY the planted count: over-firing is as much
  * a bug as under-firing, it quarantines good data at 100 TB).
  */
class DataQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val lineitem = Tables.lineitem(spark, sf)
  private lazy val customer = Tables.customer(spark, sf)
  private lazy val events = Tables.events(spark, sf)
  private lazy val documents = Tables.documents(spark, sf)

  /** One planted-corruption row: the table's first row with the named
    * columns overwritten (schema-preserving, so `unionByName` is exact).
    */
  private def planted(df: DataFrame, cols: (String, Column)*): DataFrame =
    cols.foldLeft(df.limit(1)) { case (d, (n, c)) =>
      d.withColumn(n, c.cast(df.schema(n).dataType))
    }

  private def ledgerMap(ledger: DataFrame): Map[String, (Long, Long, Int)] =
    ledger.collect().map { r =>
      r.getString(r.fieldIndex("rule")) ->
        ((r.getLong(r.fieldIndex("checked")),
          r.getLong(r.fieldIndex("violations")),
          r.getInt(r.fieldIndex("pass"))))
    }.toMap

  test("clean fixture: all 15 rules present, every rule passes") {
    val m = ledgerMap(DataQuality.dqExpectations(spark, sf))
    assert(m.size == 15, s"expected 15 rules, got ${m.keySet.toSeq.sorted}")
    m.foreach { case (rule, (checked, viol, pass)) =>
      assert(checked > 0, s"$rule checked nothing")
      assert(viol == 0 && pass == 1, s"$rule fired on clean data ($viol)")
    }
  }

  test("every rule fires on planted corruption with the exact planted count") {
    // fresh orderkeys so only row D trips uniqueness
    val badOrders = orders
      .unionByName(planted(orders, "o_orderkey" -> lit(9000001L),
        "o_custkey" -> lit(null)))                       // A: null custkey (also a ref orphan: null never equi-joins)
      .unionByName(planted(orders, "o_orderkey" -> lit(9000002L),
        "o_orderstatus" -> lit("X")))                    // B: unaccepted status
      .unionByName(planted(orders, "o_orderkey" -> lit(9000003L),
        "o_totalprice" -> lit(-5.0)))                    // C: non-positive price
      .unionByName(orders.limit(1))                      // D: duplicate orderkey
      .unionByName(planted(orders, "o_orderkey" -> lit(9000005L),
        "o_custkey" -> lit(-999L)))                      // E: dangling custkey

    val badLine = lineitem
      .unionByName(planted(lineitem, "l_quantity" -> lit(99.0)))
      .unionByName(planted(lineitem, "l_discount" -> lit(0.5)))
      .unionByName(planted(lineitem, "l_extendedprice" -> lit(-1.0)))
      .unionByName(planted(lineitem, "l_orderkey" -> lit(-777L)))

    val badEvents = events
      .unionByName(planted(events, "user_id" -> lit(null)))   // null id (also a ref orphan)
      .unionByName(planted(events, "value" -> lit(-3.0)))
      .unionByName(planted(events, "props" -> lit("""{"x":1}""")))
      .unionByName(planted(events, "user_id" -> lit(-5L)))    // dangling user

    val badDocs = documents
      .unionByName(planted(documents, "n_chars" -> (length(col("text")) + 1)))
      .unionByName(planted(documents, "text" -> lit(""), "n_chars" -> lit(0L)))

    val m = ledgerMap(DataQuality.dqLedger(
      badOrders, badLine, customer, badEvents, badDocs))

    val expected = Map(
      "not_null_o_custkey" -> 1L, "accepted_o_orderstatus" -> 1L,
      "positive_o_totalprice" -> 1L, "unique_o_orderkey" -> 1L,
      "ref_orders_customer" -> 2L, // A's null + E's dangling key
      "range_l_quantity" -> 1L, "range_l_discount" -> 1L,
      "nonneg_l_extendedprice" -> 1L, "ref_lineitem_orders" -> 1L,
      "not_null_user_id" -> 1L, "positive_value" -> 1L,
      "json_props_has_k" -> 1L, "ref_events_customer" -> 2L,
      "chars_consistency" -> 1L, "nonempty_text" -> 1L)
    assert(m.keySet == expected.keySet)
    expected.foreach { case (rule, want) =>
      val (_, viol, pass) = m(rule)
      assert(viol == want, s"$rule: planted $want violations, ledger says $viol")
      assert(pass == 0, s"$rule must fail with planted corruption")
    }
    // checked counts the corrupted rows too — the denominator is the table
    assert(m("not_null_o_custkey")._1 == orders.count() + 5)
    assert(m("range_l_quantity")._1 == lineitem.count() + 4)
  }

  test("incremental: merge ≡ cold ledger at any split, including empty slices") {
    val badEvents = events
      .unionByName(planted(events, "user_id" -> lit(null)))
      .unionByName(planted(events, "value" -> lit(-3.0)))
      .unionByName(planted(events, "user_id" -> lit(-5L)))
    val cold = ledgerMap(
      DataQuality.dqEventPartial(badEvents, customer)
        .withColumn("pass", (col("violations") === 0).cast("int")))
    // far past (empty pre), mid-corpus, far future (empty post)
    for (wm <- Seq("2020-01-01", "2024-01-15 13:00:00", "2030-01-01")) {
      val cut = to_timestamp(lit(wm))
      val merged = ledgerMap(DataQuality.dqIncrementalMerge(
        DataQuality.dqEventPartial(badEvents.filter(col("ts") <= cut), customer),
        DataQuality.dqEventPartial(badEvents.filter(col("ts") > cut), customer)))
      assert(merged == cold, s"split at $wm diverged from the cold ledger")
    }
  }

  test("stream melt: rule-keyed counters ≡ the one-scan ledger partials") {
    val badEvents = events
      .unionByName(planted(events, "user_id" -> lit(null)))
      .unionByName(planted(events, "props" -> lit("""{"x":1}""")))
      .unionByName(planted(events, "user_id" -> lit(-5L)))
    val melted = ledgerMap(
      DataQuality.dqEventMelt(badEvents, customer)
        .groupBy(col("rule"))
        .agg(count(lit(1)).as("checked"), sum(col("bad")).as("violations"))
        .withColumn("pass", (col("violations") === 0).cast("int")))
    val oneScan = ledgerMap(
      DataQuality.dqEventPartial(badEvents, customer)
        .withColumn("pass", (col("violations") === 0).cast("int")))
    assert(melted == oneScan,
      "the pre-agg melt (stream form) and post-agg stack (batch form) must " +
        "count identically")
  }

  test("unique incremental: standing key set + anti-join ≡ cold count-distinct") {
    // planted: D duplicates a standing key from the arriving side, E
    // duplicates WITHIN the batch, F re-dups a key already dup in standing
    val standing = orders.filter(col("o_orderkey") % 2 === 0)
      .unionByName(planted(orders, "o_orderkey" -> lit(2L)))          // standing-side dup
    val arrivals = orders.filter(col("o_orderkey") % 2 === 1)
      .unionByName(planted(orders, "o_orderkey" -> lit(2L)))          // D: dups a standing key
      .unionByName(planted(orders, "o_orderkey" -> lit(9000011L)))    // E1
      .unionByName(planted(orders, "o_orderkey" -> lit(9000011L)))    // E2: within-batch dup
    val got = DataQuality.dqUniqueIncrementalOver(standing, arrivals).head
    val all = standing.unionByName(arrivals)
    val n = all.count()
    val nd = all.select(col("o_orderkey")).distinct().count()
    assert(got.getLong(got.fieldIndex("checked")) == n)
    assert(got.getLong(got.fieldIndex("violations")) == n - nd,
      "incremental uniqueness must equal the cold count - count_distinct")
    assert(got.getLong(got.fieldIndex("violations")) >= 3,
      "all three planted duplication shapes must be counted")
    assert(got.getInt(got.fieldIndex("pass")) == 0)
    // and the clean split passes
    val clean = DataQuality.dqUniqueIncrementalOver(
      orders.filter(col("o_orderkey") % 2 === 0),
      orders.filter(col("o_orderkey") % 2 === 1)).head
    assert(clean.getInt(clean.fieldIndex("pass")) == 1)
  }

  test("drift: planted violation day and volume spike flag; day one never flags") {
    import spark.implicits._
    def day(d: Int, n: Int, nulls: Int): Seq[(java.sql.Timestamp, java.lang.Long, Double, String)] =
      (0 until n).map { i =>
        (java.sql.Timestamp.valueOf(f"2024-02-$d%02d 06:00:0${i % 10}"),
          if (i < nulls) null else java.lang.Long.valueOf(i),
          1.0, """{"k": 3}""")
      }
    // day1: violation but NO baseline; day3: 3 violations vs clean history;
    // day4: 3.1x volume; day5: volume crash
    val ev = (day(1, 10, 1) ++ day(2, 10, 0) ++ day(3, 10, 3) ++
      day(4, 31, 0) ++ day(5, 1, 0))
      .toDF("ts", "user_id", "value", "props")
    val flags = DataQuality.dqDriftOver(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getInt(r.fieldIndex("volume_flag")), r.getInt(r.fieldIndex("viol_flag")))))
      .toMap
    assert(flags("2024-02-01") == ((0, 0)), "day one has no baseline, must not flag")
    assert(flags("2024-02-02") == ((0, 0)))
    assert(flags("2024-02-03") == ((0, 1)), "violation burst must trip viol_flag")
    assert(flags("2024-02-04") == ((1, 0)), "3x volume must trip volume_flag")
    assert(flags("2024-02-05") == ((1, 0)), "volume crash must trip volume_flag")
  }

  test("plan: 15 rules cost 10 scans — row rules share one aggregate pass per table") {
    val scans = DataQuality.dqExpectations(spark, sf)
      .queryExecution.optimizedPlan.collect { case l: LogicalRelation => l }
    // 4 row-rule table scans + 3 referential rules × (child + parent);
    // adding a row rule must add a column to its table's agg, NOT a scan
    assert(scans.size == 10, s"expected 10 scans, got ${scans.size}")
    val p = DataQuality.dqExpectations(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"),
      "singleton ref-rule stitch must broadcast, never cartesian")
  }
}
