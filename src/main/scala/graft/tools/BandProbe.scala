package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal}
import graft.pipeline.Tables

/** SCALING.md probe for the occupancy-rung band geometry
  * ([[Dedup.mihGeometry]]): runs [[Dedup.bandedHammingPairs]] at an
  * EXPLICIT (blocks, radius) over a rehearsal corpus, reporting wall
  * seconds, the candidate mass the geometry generated (the quantity the
  * rung ladder exists to bound), and the final pair count (which must be
  * identical across rungs — the bit-identical claim, asserted here at
  * rehearsal scale where no oracle runs).
  *
  * Usage: runMain graft.tools.BandProbe <sfDir> <simhash|pfp> <blocks> <radius>
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, family, blocksS, radiusS) = args.take(4)
    val (blocks, radius) = (blocksS.toInt, radiusS.toInt)
    // optional 5th arg "cogroup": force the mihPairsRung2 kernel at THIS
    // family's 2-block geometry even where the explode-join also exists
    // (the pfp rung-2 A/B — its radius is 1, so the blocks==2 && radius>1
    // auto-route below never fires for it)
    val forceCogroup = args.length > 4 && args(4) == "cogroup"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val (sigs, id, sig, bits, maxH) = family match {
      case "simhash" =>
        (Dedup.simhashSignatures(Dedup.exactReps(docs)).localCheckpoint(),
          "doc_id", "simhash", Dedup.SIMHASH_BITS, Dedup.SIMHASH_MAX_HAMMING)
      case "pfp" =>
        (Multimodal.perceptualSignatures(Multimodal.sliceFrames(docs))
          .localCheckpoint(),
          "media_id", "pfp", Multimodal.PFP_BITS, Multimodal.PFP_MAX_HAMMING)
    }
    val n = sigs.count()
    // candidate mass: the pre-filter join size this geometry generates
    // (per unordered pair of distinct docs; multi-band hits counted once,
    // like the pair output). blocks=2 routes to the rung-2 cogroup
    // operator (partition-grouped expansion — no explode-join exists at
    // that geometry).
    val t0 = System.nanoTime()
    val pairs =
      (if (forceCogroup || (blocks == 2 && radius > 1))
        Dedup.mihPairsRung2(sigs, id, sig, bits, maxH, ("d1", "d2"))
      else Dedup.bandedHammingPairs(sigs, id, sig, bits, maxH,
        blocks, radius, ("d1", "d2"))).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val cands = if (forceCogroup || (blocks == 2 && radius > 1)) -1L else {
      val bandBits = bits / blocks
      val mask = (1L << bandBits) - 1
      val bands = sigs.select(col(id), col(sig),
          explode(expr(s"sequence(0, ${blocks - 1})")).as("band_no"))
        .withColumn("band_val", expr(s"($sig >> (band_no * $bandBits)) & $mask"))
      val probe = if (radius == 0) bands else
        bands.select(col(id), col("band_no"),
          explode(expr(
            s"concat(array(band_val), transform(sequence(0, ${bandBits - 1}), " +
              "i -> band_val ^ shiftleft(1L, i)))")).as("band_val"))
      probe.select(col("band_no"), col("band_val"), col(id).as("_d1"))
        .join(bands.select(col("band_no"), col("band_val"), col(id).as("_d2")),
          Seq("band_no", "band_val"))
        .filter(col("_d1") < col("_d2"))
        .select(col("_d1"), col("_d2")).distinct().count()
    }
    println(s"""{"family":"$family","n":$n,"blocks":$blocks,"radius":$radius,""" +
      s""""secs":${math.round(secs * 10) / 10.0},"pairs":$pairs,"candidates":$cands}""")
    spark.stop()
  }
}
