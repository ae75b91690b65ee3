package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** Graph analytics over corpus-derived graphs — here PageRank over the
  * approximate k-NN similarity graph ([[Dedup.knnGraph]]): a centrality
  * score for every embedded document, the standard "how referenced /
  * how central is this item" signal used for corpus quality weighting
  * (harmonic/PageRank centrality over link graphs in CommonCrawl-scale
  * curation) and as a sampling prior.
  *
  * Determinism across engines: the rank update is computed in FIXED
  * POINT — ranks are parts-per-billion longs, contributions use integer
  * division — so the result is bit-identical regardless of the order
  * partial sums combine in. A double formulation would drift between
  * Spark and DuckDB (and between two Spark runs with different partition
  * counts) in the last bits, and rounding intermediate doubles leaves a
  * knife-edge probability per value per round; integers have no edge.
  *
  * Scale shape: the edge frame is joined per iteration pre-partitioned
  * on `src` (the static big side moves once, the ranks side — one row
  * per node — reshuffles per round), contributions aggregate with
  * map-side partial sums, and each round is localCheckpoint'ed so
  * lineage stays flat (the k-means/CC lesson). Dangling-node mass (no
  * out-edges) is dropped, the standard simplified variant — rank sums
  * stay below [[PR_SCALE]] by the leaked mass plus integer truncation.
  */
object Graph {

  /** Fixed-point scale: ranks are expressed in parts per billion. */
  val PR_SCALE = 1000000000L

  /** Damping factor as an exact rational (85/100). */
  val PR_DAMP_NUM = 85L
  val PR_DAMP_DEN = 100L

  /** Fixed iteration count — deterministic output shape; centrality
    * separates within a few rounds on bounded-degree graphs.
    */
  val PR_ITERS = 3

  /** PageRank over an arbitrary directed edge list. `nodes` carries one
    * `id` column; `edges` carries (src, dst). Returns (id, rank_ppb,
    * rank) with rank_ppb the exact fixed-point value.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = PR_ITERS): DataFrame = {
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("k"))
    // static per-iteration build side: (src, dst, out-degree), moved once
    val e = edges.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), col("k"))
      .repartition(col("src"))
      .localCheckpoint()
    // node frame pre-partitioned on id: the per-round left join then
    // reshuffles only the contribution aggregate, never the node set
    val n0 = nodes.select(col("id")).repartition(col("id")).localCheckpoint()
    val n = n0.count()
    require(n > 0, "pageRank needs a non-empty node set")
    val r0 = PR_SCALE / n
    val base = (PR_SCALE - PR_DAMP_NUM * PR_SCALE / PR_DAMP_DEN) / n
    var ranks = n0.select(col("id"), lit(r0).as("r"))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr(s"($PR_DAMP_NUM * r) div ($PR_DAMP_DEN * k)").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = n0
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("s"), lit(0L))).cast("long").as("r"))
        .localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank_ppb"),
      round(col("r").cast("double") / lit(PR_SCALE.toDouble), 6).as("rank"))
  }

  /** PageRank over the k-NN similarity graph: each vector links to its
    * [[Dedup.KNN_K]] nearest LSH-bucketed neighbors; rank measures how
    * often a vector is someone ELSE's neighbor, weighted recursively —
    * hub documents in embedding space.
    */
  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    pageRank(
      emb.select(col("vec_id").as("id")),
      Dedup.knnGraph(emb).select(col("vec_id").as("src"), col("nn_id").as("dst")))
      .select(col("id").as("vec_id"), col("rank_ppb"), col("rank"))
  }

  /** The oracle unrolls the fixed iteration count as chained CTEs over
    * the same k-NN edge list ([[Dedup.simsearchKnnGraphSql]] nested as a
    * CTE), replaying the identical integer arithmetic (`//` floor
    * division ≡ Spark `div` on non-negative operands; sums cast back to
    * BIGINT before reuse — DuckDB widens integer sums to HUGEINT).
    */
  val graphPagerankSql: String = {
    val iterCtes = (1 to PR_ITERS).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS id,
         |         CAST(sum(($PR_DAMP_NUM * r.r) // ($PR_DAMP_DEN * e.k)) AS BIGINT) AS s
         |  FROM e JOIN r${i - 1} r ON e.src = r.id
         |  GROUP BY 1),
         |r$i AS (
         |  SELECT n.id, CAST(b.base + coalesce(c.s, 0) AS BIGINT) AS r
         |  FROM nodes n CROSS JOIN b LEFT JOIN c$i c ON n.id = c.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH knn AS (${Dedup.simsearchKnnGraphSql}),
       |edges AS (SELECT vec_id AS src, nn_id AS dst FROM knn),
       |outd AS (SELECT src, CAST(count(*) AS BIGINT) AS k FROM edges GROUP BY 1),
       |e AS (SELECT g.src, g.dst, o.k FROM edges g JOIN outd o ON g.src = o.src),
       |nodes AS (SELECT vec_id AS id FROM embeddings),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |b AS (SELECT CAST((CAST($PR_SCALE AS BIGINT)
       |                    - $PR_DAMP_NUM * CAST($PR_SCALE AS BIGINT) // $PR_DAMP_DEN) // n
       |               AS BIGINT) AS base,
       |             CAST(CAST($PR_SCALE AS BIGINT) // n AS BIGINT) AS r0 FROM nn),
       |r0 AS (SELECT id, b.r0 AS r FROM nodes CROSS JOIN b),
       |$iterCtes
       |SELECT id AS vec_id, r AS rank_ppb,
       |       round(CAST(r AS DOUBLE) / $PR_SCALE, 6) AS rank
       |FROM r$PR_ITERS""".stripMargin
  }
}
