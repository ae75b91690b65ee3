package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, dim 64). Two tiers:
  *
  *  - [[simsearchTopk]]: brute-force cosine top-k — the exact baseline.
  *    Queries are broadcast; candidates stream; per-partition the work is a
  *    codegen'd higher-order fold (zip_with + aggregate), no UDF.
  *  - [[simsearchIvf]]: IVF-style — the `label` column plays the coarse
  *    quantizer cell (at scale: a k-means assignment computed upstream),
  *    so each query only scans its own cell ≈ 1/nlist of the corpus.
  *
  * Dot products fold left-to-right over the array in both engines; the
  * residual reorder noise (≤1e-15) is pinned by round(.,6), and ranking
  * happens on the rounded score with an id tie-break, so Spark and DuckDB
  * rank identically.
  */
object Similarity {

  /** Left-fold dot product of two float-array columns, in double — the
    * fused codegen expression (graft.functions.FloatVecDot), bit-identical
    * to the HOF `aggregate(zip_with(...))` formulation it replaces but with
    * no per-pair array allocation. Registration is session-idempotent; the
    * SparkSession is taken from the active session of the calling query.
    */
  def dotExpr(a: String, b: String): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.VectorFunctions.vec_dot(spark, a, b)
  }

  /** Adds the L2 norm `nm` to an embeddings frame — computed once per
    * vector, before any join fans rows out.
    */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nm",
      sqrt(graft.functions.VectorFunctions.vec_norm_sq(emb.sparkSession, "embedding")))

  /** DuckDB twins: positional unnest + per-vector norms. */
  val UNNEST_CTE: String =
    """u AS (
      |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings)""".stripMargin

  val NORM_CTE: String =
    """nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nm FROM u GROUP BY 1)""".stripMargin

  val N_QUERIES = 8
  val TOP_K = 5
  val IVF_TOP_K = 3

  /** Brute-force cosine top-k of `emb` against the query rows selected by
    * `isQuery`, k per query.
    */
  def bruteForceTopk(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val base = withNorm(emb)
    val queries = base.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("embedding").as("eq"), col("nm").as("nq"))
    val cands = base.select(col("vec_id").as("n_id"), col("embedding").as("ec"), col("nm").as("nc"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    cands.join(broadcast(queries), col("n_id") =!= col("q_id"))
      .withColumn("cosine", round(dotExpr("eq", "ec") / (col("nq") * col("nc")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rnk"))
  }

  def simsearchTopk(spark: SparkSession, sfDir: String): DataFrame =
    bruteForceTopk(Tables.embeddings(spark, sfDir), col("vec_id") < N_QUERIES, TOP_K)

  val simsearchTopkSql: String =
    s"""WITH ${UNNEST_CTE},
       |${NORM_CTE},
       |dots AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS n_id, sum(a.x * b.x) AS dot
       |  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < $N_QUERIES AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |cos AS (
       |  SELECT d.q_id, d.n_id, round(d.dot / (n1.nm * n2.nm), 6) AS cosine
       |  FROM dots d
       |  JOIN nrm n1 ON d.q_id = n1.vec_id
       |  JOIN nrm n2 ON d.n_id = n2.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |                               ORDER BY cosine DESC, n_id) AS rnk
       |  FROM cos)
       |SELECT q_id, n_id, cosine, rnk FROM ranked WHERE rnk <= $TOP_K""".stripMargin

  /** IVF-bucketed ANN: restrict each query's scan to its own coarse cell
    * (here the `label` column). Same top-k machinery, 1/nlist the work.
    */
  def ivfTopk(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val base = withNorm(emb)
    val queries = base.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("label"),
        col("embedding").as("eq"), col("nm").as("nq"))
    val cands = base.select(col("vec_id").as("n_id"), col("label"),
      col("embedding").as("ec"), col("nm").as("nc"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    cands.join(broadcast(queries), Seq("label"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine", round(dotExpr("eq", "ec") / (col("nq") * col("nc")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("label"), col("n_id"), col("cosine"), col("rnk"))
  }

  def simsearchIvf(spark: SparkSession, sfDir: String): DataFrame =
    ivfTopk(Tables.embeddings(spark, sfDir), col("vec_id") < N_QUERIES, IVF_TOP_K)

  val simsearchIvfSql: String =
    s"""WITH ${UNNEST_CTE},
       |${NORM_CTE},
       |dots AS (
       |  SELECT a.vec_id AS q_id, a.label AS label, b.vec_id AS n_id, sum(a.x * b.x) AS dot
       |  FROM u a JOIN u b ON a.i = b.i AND a.label = b.label
       |                    AND a.vec_id < $N_QUERIES AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2, 3),
       |cos AS (
       |  SELECT d.q_id, d.label, d.n_id, round(d.dot / (n1.nm * n2.nm), 6) AS cosine
       |  FROM dots d
       |  JOIN nrm n1 ON d.q_id = n1.vec_id
       |  JOIN nrm n2 ON d.n_id = n2.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |                               ORDER BY cosine DESC, n_id) AS rnk
       |  FROM cos)
       |SELECT q_id, label, n_id, cosine, rnk FROM ranked WHERE rnk <= $IVF_TOP_K""".stripMargin
}
