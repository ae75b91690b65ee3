package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the SCALING.md rehearsal corpus: an N× replica of an existing
  * SF directory under structure-preserving transforms, so cost SHOULD
  * scale linearly and any super-linear query is a genuine finding, not an
  * artifact of the blow-up construction.
  *
  *  - `documents`: replica r ≥ 1 maps every token t → "t_r" — a token
  *    BIJECTION per replica. Within-replica token counts, lengths (+2–3
  *    chars), shingle sets and therefore the whole dup/Jaccard/cluster
  *    structure are preserved exactly; across replicas no shingle ever
  *    matches, so pair spaces grow linearly with N by construction.
  *    doc_id offset is a multiple of DECONTAM_MOD (97), so the benchmark
  *    split replicates per replica; replica 0 is untouched (query docs
  *    0..2 stay the only query docs — the serving-scale shape).
  *  - `embeddings`: replica r applies a seeded per-replica SIGN-FLIP
  *    pattern (an orthogonal transform): within-replica cosines are
  *    bit-preserved, cross-replica cosines are essentially random, so
  *    near-dup/ANN candidate spaces also grow linearly. vec_id offset is
  *    a multiple of 97 for the eval-split mod.
  *  - `events`: replica r shifts user_id and event_id by r·ID_OFFSET —
  *    new USERS with byte-identical per-user event sequences, the shape
  *    of firehose growth (more users per day, not longer history).
  *    Per-user windows/state (sessionize, transitions, attribution,
  *    first-seen) and per-(chain, day) rollups replicate exactly;
  *    ID_OFFSET is even, so the event_id-parity chain split is
  *    preserved. ts stays in the source vintage (raw nanos reads as a
  *    plain long and writes back as one — `Tables.events` normalizes
  *    either vintage).
  *  - every other table is copied unchanged (the TPC-H dims are
  *    dimension-sized by definition).
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <replicas>
  */
object ScaleUp {
  val ID_OFFSET = 97L * 1000000L // ≡ 0 (mod 97): decontam split replicates

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val n = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dst).mkdirs()

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until n).map { r =>
      if (r == 0) docs
      else docs.select(
        (col("doc_id") + lit(r * ID_OFFSET)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1_$r").as("text"),
        col("lang"), col("source"),
        // n_chars rides along for report queries; keep it consistent with
        // the suffixed text (each token grew by len("_" + r))
        (col("n_chars") + size(split(col("text"), "\\s+")) * lit(1 + r.toString.length))
          .cast(docs.schema("n_chars").dataType).as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    (0 until n).map { r =>
      if (r == 0) emb
      else {
        // deterministic ±1 pattern per (replica, component): an orthogonal
        // transform — within-replica geometry is exact, cross-replica
        // cosines decorrelate
        val flips = (0 until dim).map { i =>
          val h = (i * 2654435761L + r * 40503L) ^ ((i.toLong * r) << 7)
          if (((h >> 3) & 1L) == 0L) 1.0f else -1.0f
        }
        val flipArr = array(flips.map(lit): _*)
        emb.select(
          (col("vec_id") + lit(r * ID_OFFSET)).as("vec_id"),
          zip_with(col("embedding"), flipArr, (x, s) => (x * s).cast("float"))
            .as("embedding"),
          col("label"))
      }
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    // events: new users per replica, same per-user sequences and days.
    // nanosAsLong lets the TIMESTAMP(NANOS) vintage read as a long; it
    // writes back as a plain long, which Tables.events treats as the
    // raw-nanos vintage — value-identical timestamps either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    (0 until n).map { r =>
      if (r == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(r * ID_OFFSET))
        .withColumn("user_id", col("user_id") + lit(r * ID_OFFSET))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")

    // customer: new custkeys per replica (ID_OFFSET is even, so the
    // odd/even standing-arrival split convention is parity-preserved),
    // QI fields unchanged — classes keep their identity and k scales ×n,
    // the realistic growth direction for the privacy audits (round 14:
    // lets the privacy streaming twins run the decade harness).
    val cust = spark.read.parquet(s"$src/customer.parquet")
    (0 until n).map { r =>
      if (r == 0) cust
      else cust.withColumn("c_custkey", col("c_custkey") + lit(r * ID_OFFSET))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/customer.parquet")

    // remaining tables unchanged
    val others = Seq("region", "nation", "supplier", "part",
      "orders", "lineitem")
    others.foreach { t =>
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      val to = java.nio.file.Paths.get(s"$dst/$t.parquet")
      if (java.nio.file.Files.exists(from) && !java.nio.file.Files.exists(to)) {
        if (java.nio.file.Files.isDirectory(from)) {
          java.nio.file.Files.walk(from).forEach { p =>
            val rel = from.relativize(p)
            val tp = to.resolve(rel)
            if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(tp)
            else java.nio.file.Files.copy(p, tp)
          }
        } else java.nio.file.Files.copy(from, to)
      }
    }
    println(s"[scaleup] wrote ${n}x corpus to $dst")
    spark.stop()
  }
}
