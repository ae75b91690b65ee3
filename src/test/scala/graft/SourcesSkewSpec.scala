package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.JsonFixtureSource

class SourcesSkewSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(name: String, lines: String*): String = {
    val dir = Files.createTempDirectory("graft-json")
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("coingecko history fixture: declared schema, nested field, d-M-yyyy date") {
    val p = writeLines("hist.json",
      """{"id":"polkadot","date":"5-1-2024","market_data":{"current_price":{"usd":7.25}}}""",
      """{"id":"kusama","date":"15-1-2024","market_data":{"current_price":{"usd":31.5}}}""")
    val got = JsonFixtureSource.coingeckoHistory(spark, p)
      .select(col("coin"), col("price_date").cast("string"), col("price"))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(("polkadot", "2024-01-05", 7.25), ("kusama", "2024-01-15", 31.5)))
  }

  test("coingecko ticker fixture: array payload, element_at(1).current_price") {
    val p = writeLines("tick.json",
      """[{"id":"polkadot","current_price":7.5},{"id":"other","current_price":1.0}]""")
    val got = JsonFixtureSource.coingeckoTicker(spark, p)
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("polkadot", 7.5)))
  }

  test("yieldscan stats fixture: flat extraction") {
    val p = writeLines("stats.json",
      """{"chain":"polkadot","totalAmountCurrentlyManaged":123.5,"extra":"ignored"}""")
    val got = JsonFixtureSource.yieldscanStats(spark, p)
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("polkadot", 123.5)))
  }

  private def v2Scan(df: org.apache.spark.sql.DataFrame): graft.sources.HistoryScan = {
    df.count() // force planning through AQE
    df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[graft.sources.HistoryScan]
    }.getOrElse(fail("no BatchScanExec in the executed plan"))
  }

  test("history DSv2: same rows as the declared-schema reader; one partition per file") {
    val dir = Files.createTempDirectory("graft-v2")
    Files.writeString(dir.resolve("a.json"),
      """{"id":"polkadot","date":"5-1-2024","market_data":{"current_price":{"usd":7.25}}}""")
    Files.writeString(dir.resolve("b.json"),
      """{"id":"kusama","date":"15-1-2024","market_data":{"current_price":{"usd":31.5}}}""")
    val v2 = spark.read.format("graft-history").load(dir.toString)
    val got = v2.select(col("coin"), col("price_date").cast("string"), col("price"))
      .as[(String, String, Double)].collect().toSet
    assert(got == Set(("polkadot", "2024-01-05", 7.25), ("kusama", "2024-01-15", 31.5)))
    assert(v2.rdd.getNumPartitions == 2, "one input partition per snapshot file")
  }

  test("history DSv2: column pruning and coin filter reach the scan") {
    val p = writeLines("hist.json",
      """{"id":"polkadot","date":"5-1-2024","market_data":{"current_price":{"usd":7.25}}}""",
      """{"id":"kusama","date":"15-1-2024","market_data":{"current_price":{"usd":31.5}}}""")
    val pruned = v2Scan(spark.read.format("graft-history").load(p).select("price"))
    assert(pruned.readSchema().fieldNames.toSeq == Seq("price"),
      "projection must prune to the selected column at the reader")
    val filtered = spark.read.format("graft-history").load(p)
      .where(col("coin") === "polkadot")
    assert(v2Scan(filtered).coins.contains(Set("polkadot")),
      "coin equality must push into the partition reader")
    assert(filtered.select("coin", "price").as[(String, Double)].collect().toSeq ==
      Seq(("polkadot", 7.25)))
  }

  test("history DSv2 streams: each new snapshot file is exactly one new micro-batch") {
    val dir = Files.createTempDirectory("graft-v2s")
    val ckpt = Files.createTempDirectory("graft-v2s-ckpt").toString
    val out = Files.createTempDirectory("graft-v2s-out").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-history").load(dir.toString)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Files.writeString(dir.resolve("a.json"),
      """{"id":"polkadot","date":"5-1-2024","market_data":{"current_price":{"usd":7.25}}}""")
    run()
    assert(spark.read.parquet(out).count() == 1)
    Files.writeString(dir.resolve("b.json"),
      """{"id":"kusama","date":"15-1-2024","market_data":{"current_price":{"usd":31.5}}}""")
    run()
    // the restarted query resumes from the committed file offset: file a is
    // NOT reprocessed, file b lands exactly once
    val rows = spark.read.parquet(out)
      .select(col("coin"), col("price")).as[(String, Double)].collect().toSeq
    assert(rows.sorted == Seq(("kusama", 31.5), ("polkadot", 7.25)))
    // a file landing with an out-of-order (lexicographically smaller) name
    // must NOT shift committed batches: with filename-watermark offsets it
    // is skipped (documented monotonic-naming contract) and nothing is
    // re-emitted — a positional offset would have replayed b.json here
    Files.writeString(dir.resolve("0-late.json"),
      """{"id":"late","date":"1-1-2024","market_data":{"current_price":{"usd":1.0}}}""")
    run()
    val after = spark.read.parquet(out)
      .select(col("coin"), col("price")).as[(String, Double)].collect().toSeq
    assert(after.sorted == Seq(("kusama", 31.5), ("polkadot", 7.25)))
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 500).map(i => (i.toLong, if (i % 10 == 0) "hot" else s"k$i", i * 1.5))
      .toDF("id", "key", "v")
    val salted = Skew.saltedSumCount(df, Seq("key"), "v", "id", buckets = 8)
      .select("key", "n", "total").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val plain = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .select("key", "n", "total").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (n, t)) =>
      assert(salted(k)._1 == n && math.abs(salted(k)._2 - t) < 1e-9)
    }
  }

  test("salted join is row-identical to the plain join") {
    val large = (1 to 300).map(i => (i.toLong, s"k${i % 7}", i.toDouble)).toDF("id", "key", "v")
    val small = (0 until 7).map(i => (s"k$i", i * 100.0)).toDF("key", "w")
    val plain = large.join(small, Seq("key")).select("id", "key", "v", "w")
    val salted = Skew.saltedJoin(large, small, Seq("key"), "id", factor = 4)
      .select("id", "key", "v", "w")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("approx_count_distinct tracks exact within tolerance on real data") {
    val ev = graft.pipeline.Tables.events(spark, "/root/testdata/sf0.01")
    val r = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select("exact", "approx").as[(Long, Long)].collect()
    r.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.1, s"$approx vs $exact")
    }
  }
}
