package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingPipeline
import graft.streaming.StreamingPipeline.TxRow

class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch idempotent sink: overlapping micro-batches append each key once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-sink")
    val sink = s"$dir/out"
    val in = MemoryStream[TxRow]
    val q = StreamingPipeline.writeIdempotent(in.toDF(), sink, Seq("_id"), s"$dir/ckpt")
    in.addData(
      TxRow(1L, ts("2024-01-11 01:00:00"), 10L, 5.0, 1.0, true, 0L),
      TxRow(2L, ts("2024-01-11 02:00:00"), 11L, 3.0, 2.0, true, 0L))
    q.processAllAvailable()
    in.addData(
      TxRow(2L, ts("2024-01-11 02:00:00"), 11L, 3.0, 2.0, true, 0L), // replay of id 2
      TxRow(3L, ts("2024-01-11 03:00:00"), 12L, 7.0, 3.0, true, 0L))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(sink).select("_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("mergeByKey generation swap: merge, last-write-wins, crash-window heal") {
    val dir = Files.createTempDirectory("graft-merge-sink")
    val sink = s"$dir/daily"
    def batch(rows: (String, Long)*) = rows.toDF("day", "n")
    StreamingPipeline.mergeByKey(batch(("d1", 1L), ("d2", 1L)), sink, Seq("day"))
    StreamingPipeline.mergeByKey(batch(("d2", 5L), ("d3", 1L)), sink, Seq("day"))
    def read() = spark.read.parquet(sink).as[(String, Long)].collect().sorted.toSeq
    assert(read() == Seq(("d1", 1L), ("d2", 5L), ("d3", 1L)),
      "matched key replaced, unmatched kept, new inserted")
    // simulate the one crash window: live renamed away, staging lost —
    // the next merge must heal from .old instead of restarting empty
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(sink),
      new org.apache.hadoop.fs.Path(sink + ".old")))
    StreamingPipeline.mergeByKey(batch(("d3", 9L)), sink, Seq("day"))
    assert(read() == Seq(("d1", 1L), ("d2", 5L), ("d3", 9L)),
      "the healed generation preserves every previously merged key")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(sink + ".old")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(sink + ".staging")),
      "no generation debris after a successful swap")
  }

  test("mergeByKeyPartitioned: merges touched partitions, untouched files byte-identical") {
    val dir = Files.createTempDirectory("graft-merge-part")
    val sink = s"$dir/daily"
    def batch(rows: (String, Long, Long)*) = rows.toDF("day", "chain", "n")
    StreamingPipeline.mergeByKeyPartitioned(
      batch(("d1", 0L, 1L), ("d1", 1L, 2L), ("d2", 1L, 3L)),
      sink, Seq("day", "chain"), "chain")
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(part: String): Map[String, (Long, Long)] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$sink/$part"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.getName -> (f.getLen, f.getModificationTime))
        .toMap
    val chain0Before = files("chain=0")
    // second batch touches ONLY chain=1
    StreamingPipeline.mergeByKeyPartitioned(
      batch(("d2", 1L, 7L), ("d3", 1L, 4L)),
      sink, Seq("day", "chain"), "chain")
    assert(files("chain=0") == chain0Before,
      "untouched partition's files must be byte-identical (same names, sizes, mtimes)")
    def read() = spark.read.parquet(sink)
      .select($"day", $"chain".cast("long"), $"n")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(read() == Seq(("d1", 0L, 1L), ("d1", 1L, 2L), ("d2", 1L, 7L), ("d3", 1L, 4L)),
      "matched key replaced in the touched partition, unmatched kept, new inserted")
    // idempotency of the at-least-once retry: re-merging the same batch is a fixpoint
    StreamingPipeline.mergeByKeyPartitioned(
      batch(("d2", 1L, 7L), ("d3", 1L, 4L)),
      sink, Seq("day", "chain"), "chain")
    assert(read() == Seq(("d1", 0L, 1L), ("d1", 1L, 2L), ("d2", 1L, 7L), ("d3", 1L, 4L)))
  }

  test("GraftExtensions registers vec_dot in a fresh extended session") {
    // A second SparkSession in the same JVM shares the SparkContext but can
    // carry its own extensions.
    val extended = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    try {
      val ext = new org.apache.spark.sql.SparkSessionExtensions
      new GraftExtensions().apply(ext) // constructs + injects without error
      // functional check through the registry path used by the extension
      graft.functions.VectorFunctions.register(extended)
      val d = extended.sql(
        "SELECT vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(d == 6.0)
    } finally ()
  }

  test("DeltaIndex: view row set is batch-decomposition-invariant and fanout stays logarithmic") {
    // The accumulated-arrival index behind the streaming replays: the
    // same 64 rows arriving as 1, 2, or 32 batch deltas must yield the
    // SAME index view (the replays' batch-decomposition-invariance rests
    // on it), and the standing run count must respect the Bentley–Saxe
    // bound (≤ log₂B + 1 — the A/B in SCALING.md r15 is the WHY: a flat
    // run-per-batch list regressed every replay via linear scan fanout).
    val all = (0L until 64L).toDF("k")
    val zero = all.limit(0).localCheckpoint()
    def build(batches: Seq[Seq[Long]]): StreamingPipeline.DeltaIndex = {
      val idx = new StreamingPipeline.DeltaIndex(zero)
      batches.foreach { b =>
        idx += b.toDF("k").localCheckpoint()
      }
      idx
    }
    val oneGulp = build(Seq(0L until 64L))
    val byTwo = build((0L until 64L).grouped(32).toSeq)
    val byOne = build((0L until 64L).grouped(2).toSeq) // 32 batches of 2
    val expect = (0L until 64L).toSeq
    for (idx <- Seq(oneGulp, byTwo, byOne))
      assert(idx.view.as[Long].collect().sorted.toSeq == expect)
    // 32 appends = binary counter over levels: 32 = 2^5 → exactly 1 run;
    // the bound for any B is popcount(B) ≤ log₂B + 1
    assert(byOne.runCount == 1)
    val byOneOdd = build((0L until 62L).grouped(2).toSeq) // 31 batches
    assert(byOneOdd.runCount == 5) // popcount(31) = 5 ≤ log₂31 + 1
    assert(byOneOdd.view.as[Long].collect().sorted.toSeq == (0L until 62L))
  }
}
