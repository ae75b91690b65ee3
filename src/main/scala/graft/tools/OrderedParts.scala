package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the ORDERED multi-batch replay corpus: every streamed table
  * re-written as N part files range-partitioned on its replay clock,
  * with strictly ascending modification times, so a
  * `SPARK_GRAFT_MAX_FILES_PER_TRIGGER=1` replay consumes the corpus in
  * event order — the shape a production firehose actually has (a
  * trigger cadence over a roughly time-ordered stream).
  *
  * WHY (round 15): the multi-batch oracle rehearsal on hash-partitioned
  * ScaleUp parts passed all six accumulating replays (those are
  * decomposition- AND order-invariant by construction) but failed the
  * event-time twins (watermark drops, session splits, SCD2 version
  * chains, stream-stream join state eviction) — hash parts replay in
  * essentially RANDOM event-time order, an adversarial firehose no
  * watermark contract promises to absorb. Order-sensitivity is the
  * documented semantics of those operators, not a bug; this corpus is
  * the gate shape that tests what the contract actually promises:
  * batch-decomposition invariance under in-order arrival.
  *
  * The file stream source processes files oldest-modification-first;
  * ascending mtimes per range index make arrival order deterministic
  * (`repartitionByRange` partition j = j-th clock range = part-0000j,
  * and the explicit mtime bump removes any listing-order dependence).
  *
  * Usage: runMain graft.tools.OrderedParts <srcSfDir> <dstDir> [nParts]
  */
object OrderedParts {
  /** Replay clock per streamed table; dims and non-streamed tables copy
    * through unchanged (single file, never micro-batched).
    */
  val CLOCKS: Map[String, String] = Map(
    "events" -> "ts",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id",
    "customer" -> "c_custkey")

  val TABLES: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val nParts = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // raw-nanos events vintage reads as a plain long and writes back
      // as one (same convention as ScaleUp)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    TABLES.foreach { t =>
      val in = s"$src/$t.parquet"
      val out = s"$dst/$t.parquet"
      val df = spark.read.parquet(in)
      CLOCKS.get(t) match {
        case Some(clock) =>
          df.repartitionByRange(nParts, col(clock))
            .write.mode(SaveMode.Overwrite).parquet(out)
          // ascending mtimes in range order: part-0000j is clock range j
          val parts = new java.io.File(out).listFiles()
            .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
          val base = java.nio.file.attribute.FileTime.fromMillis(1000000000000L)
          parts.zipWithIndex.foreach { case (f, i) =>
            java.nio.file.Files.setLastModifiedTime(f.toPath,
              java.nio.file.attribute.FileTime.fromMillis(
                base.toMillis + i * 1000L))
          }
          println(s"[ordered] $t: ${parts.length} range parts on $clock")
        case None =>
          df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)
          println(s"[ordered] $t: copied (no replay clock)")
      }
    }
    spark.stop()
  }
}
