package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum}

import graft.ops.Dedup
import graft.pipeline.Tables

/** Rehearsal diagnostic for the knn-graph construction: per-table bucket
  * occupancy of the occupancy-pinned hyperplane geometry (n_buckets,
  * max_occ, Σ occ² = candidate rows) plus the measured wall of the full
  * construction — the instrument for attributing super-linear growth to
  * either candidate mass (occupancy skew: clustered vectors share sign
  * patterns, so the L2 norm of the occupancy distribution can grow even
  * while the pinned MEAN stays flat) or to the fixed box.
  *
  * Usage: runMain graft.tools.GraphProbe <sfDir>
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle-partition A/B knob (the r10 fixed-box protocol): a cluster
    // sizes reduce partitions to the data; the 32-thread box pins them
    // to 32 unless told otherwise
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    println(s"[probe] n=$n bits=${Dedup.hypBitsFor(n)}")
    Dedup.knnOccupancy(emb).orderBy("t").collect().foreach { r =>
      println(s"[probe] t=${r.getInt(0)} n_buckets=${r.getLong(1)} " +
        s"max_occ=${r.getLong(2)} cand_rows=${r.getLong(3)}")
    }
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag=$r wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES")) {
      time("cand_raw")(Dedup.knnCandStage(emb, dedup = false).count())
      time("cand_dedup")(Dedup.knnCandStage(emb, dedup = true).count())
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_GROUPED")) {
      val base = graft.ops.Similarity.withNorm(emb).localCheckpoint()
      val bits = Dedup.hypBitsFor(base.count())
      time("cand_grouped")(Dedup.knnCandGrouped(base, bits, 64).count())
      // equality vs the join form: identical (vec_id, nn_id, cosine) multisets
      val g = Dedup.knnCandGrouped(base, bits, 64)
      val j = Dedup.knnCandStage(emb, dedup = false)
      time("cand_diff")(g.exceptAll(j).count() + j.exceptAll(g).count())
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_KERNEL")) {
      val base = graft.ops.Similarity.withNorm(emb).localCheckpoint()
      val bits = Dedup.hypBitsFor(base.count())
      time("bucket_frame")(Dedup.knnBucketFrame(base, bits, 64).count())
      // the kernel's group-shuffle + materialization alone: count rows
      // per group without any dots
      import spark.implicits._
      time("group_shuffle")(Dedup.knnBucketFrame(base, bits, 64)
        .as[(Long, Long, Array[Float], Double)]
        .groupByKey(_._1)
        .mapGroups { (_, it) => var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c }
        .reduce(_ + _))
      time("kernel_topk")(Dedup.knnCandGrouped(base, bits, 64, kCut = 3).count())
      // payload A/B: the same group shuffle WITHOUT the embedding arrays
      time("group_shuffle_slim")(Dedup.knnBucketFrame(base, bits, 64)
        .select(col("g"), col("vec_id"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (_, it) => var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c }
        .reduce(_ + _))
      // and the bucket computation alone, unprunable (aggregate over g)
      time("bucket_eval")(Dedup.knnBucketFrame(base, bits, 64)
        .agg(sum(col("g"))).head.getLong(0))
    }
    time("knn_edges")(Dedup.knnGraph(emb).count())
    if (sys.env.contains("SPARK_GRAFT_PROBE_GROUPED")) {
      val g = Dedup.knnGraph(emb)
      val j = Dedup.knnGraphJoin(emb)
      time("knn_vs_join_diff")(g.exceptAll(j).count() + j.exceptAll(g).count())
    }
    spark.stop()
  }
}
