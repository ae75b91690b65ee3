package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.pipeline.Tables

/** SCALING.md harness: graph-ANN recall as a function of corpus size and
  * the (rounds, beam) traversal schedule. The gated `simsearch_graph_recall`
  * query measures recall at the FIXED serving constants
  * ([[Similarity.GRAPH_ROUNDS]] = 3, beams {2,4,8}) — this probe sweeps the
  * schedule at the ScaleUp decades (1×/10×/30× of sf0.1) against the
  * brute-force truth RECOMPUTED PER SCALE, because a fixed-hop traversal
  * is exactly the design whose recall decays as the corpus grows (HNSW
  * pays log-N layers for this). The NN-descent adjacency and the
  * width-independent seed stage are computed once per corpus and shared
  * across the sweep, so a (rounds × beams) grid costs little more than
  * its largest cell.
  *
  * Usage: runMain graft.tools.RecallProbe <sfDir> [rounds,rounds,...]
  *        [beam,beam,...]  — prints one JSON line per (rounds, beam).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val roundsList =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(3, 5, 7)
    val beams =
      if (args.length > 2) args(2).split(",").map(_.toInt).toSeq else Seq(8, 16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val base = Similarity.withNorm(emb).localCheckpoint()
    // 5th arg "degree=K[,iters=I]": rebuild the adjacency at a custom
    // geometry instead of serving the standing GRAPH_DEGREE index — the
    // index-side lever when the standing graph itself is the recall
    // ceiling (no traversal can out-search its graph).
    val custom = args.lift(4).map { s =>
      val kv = s.split(",").map(_.split("=")).map(a => a(0) -> a(1).toInt).toMap
      (kv.getOrElse("degree", Similarity.GRAPH_DEGREE),
        kv.getOrElse("iters", 3))
    }
    val edges = custom match {
      case None => Similarity.graphIndex(spark, dir)
      case Some((k, it)) =>
        val adj = Similarity.nnDescentAdj(emb, k = k, iters = it)
        val payload = base.select(col("vec_id").as("dst"),
          col("embedding").as("ed"), col("nm").as("nd"))
        adj.join(payload, Seq("dst"))
          .select(col("src"), col("dst"), col("ed"), col("nd"))
          .repartition(col("src")).localCheckpoint()
    }
    val truth = Similarity
      .bruteForceTopk(emb, col("vec_id") < Similarity.N_QUERIES, Similarity.IVF_TOP_K)
      .select(col("q_id"), col("n_id")).localCheckpoint()
    val denom = (Similarity.N_QUERIES * Similarity.IVF_TOP_K).toDouble
    // Graph-local ceiling: recall if the answer were the query's OWN
    // adjacency row — measures whether the truth is even IN the graph
    // near the query. A schedule can only close the gap between the
    // traversal and this ceiling; below it, the INDEX is the problem.
    val localHits = edges
      .filter(col("src") < Similarity.N_QUERIES)
      .select(col("src").as("q_id"), col("dst").as("n_id"))
      .join(truth, Seq("q_id", "n_id"), "left_semi").count()
    println(f"""{"dir":"$dir","n_vectors":$n,"graph_local_ceiling":${localHits / denom}%.4f}""")
    val lshSeeds = Similarity.beamSeeds(base).localCheckpoint()
    // Optional COARSE ENTRY LAYER (4th arg "anchors"): a fixed-size
    // deterministic node sample (every N/1024th vec_id — the HNSW
    // top-layer idea) scored brute-force per query; its top seeds union
    // with the LSH seeds under the same GRAPH_SEED_CAP cosine cut. Entry
    // cost is |Q| × 1024 — corpus-INDEPENDENT, unlike LSH buckets whose
    // occupancy dilutes with N.
    val useAnchors = args.length > 3 && args(3) == "anchors"
    val seeds = if (!useAnchors) lshSeeds else {
      val step = math.max(1L, n / 1024L)
      val anchors = base.filter(col("vec_id") % step === 0)
        .select(col("vec_id").as("node"), col("embedding").as("ed"),
          col("nm").as("nd"))
      val queries = base.filter(col("vec_id") < Similarity.N_QUERIES)
        .select(col("vec_id").as("q_id"), col("embedding").as("eq"),
          col("nm").as("nq"))
      val cosine = round(
        graft.functions.VectorFunctions.vec_dot_cols(spark, col("eq"), col("ed"))
          / (col("nq") * col("nd")), 6)
      val anchorSeeds = queries.join(broadcast(anchors))
        .withColumn("cosine", cosine)
        .select(col("q_id"), col("node"), col("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("node"))
      lshSeeds.select(col("q_id"), col("node"), col("cosine"))
        .unionByName(anchorSeeds)
        .groupBy(col("q_id"), col("node")).agg(max(col("cosine")).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= Similarity.GRAPH_SEED_CAP)
        .select(col("q_id"), col("node"), col("cosine"))
        .localCheckpoint()
    }
    for (r <- roundsList; bw <- beams) {
      val t0 = System.nanoTime()
      val visited = Similarity
        .beamTraverse(edges, base, bw, rounds = r, seeds = Some(seeds))
        .localCheckpoint()
      val nCand = visited.count()
      val hits = Similarity.graphTopkFrom(visited)
        .select(col("q_id"), col("n_id"))
        .join(truth, Seq("q_id", "n_id"), "left_semi")
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir","n_vectors":$n,"rounds":$r,"beam":$bw,""" +
        f""""n_candidates":$nCand,"recall":${hits / denom}%.4f,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
