package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Step 5 — `update_nominations_updated_data` (updatescript.py:154-218):
  * route successful new transactions into per-metric sinks, each with its own
  * derived `volume` column. One shared incremental scan, three filtered
  * projections (SURVEY.md §3.4) — never three scans.
  *
  * Behavioral contract preserved from the reference (SURVEY.md §2.12):
  *  - Q1: on kusama the `stake > alreadyBonded` branch routes into the
  *    *nominations* sink (updatescript.py:201-204), not a separate
  *    amount-staked sink as on polkadot (updatescript.py:169-172). Encoded
  *    explicitly in [[kusamaNominations]] rather than bug-ported silently.
  *  - Q2: each sink's `volume` is derived independently from its own branch
  *    (the reference mutates one aliased dict in branch order; the final
  *    per-sink values are what we replicate).
  *  - Q7: failed transactions are dropped entirely here (updatescript.py:158),
  *    unlike step 2 which keeps them with value 0.
  *
  * The AUM sink's "is this stash already known?" probe (updatescript.py:175)
  * is sequential state: a row sees every row *previously inserted*. Set
  * re-derivation: per (chain, stashId) in (createdAt, _id) order, the first
  * successful row is always inserted with volume = stake (it finds no prior
  * row, both branches insert); later rows are inserted iff stake ≠ bonded,
  * with volume = stake - alreadyBonded (sign preserved — the reference does
  * not abs() here, updatescript.py:178). Window `row_number` — one shuffle on
  * (chain, stashId), which is the minimum any stateful first-seen needs.
  */
object Routing {
  import Tables._

  /** Successful transactions after the watermark — the shared scan. */
  private def batch(spark: SparkSession, sfDir: String): DataFrame =
    tx(spark, sfDir)
      .filter(col("createdAt") > lit(WM).cast("timestamp") && col("successful"))

  private val passthrough = Seq("_id", "createdAt", "stashId", "stake",
    "alreadyBonded", "successful", "chain").map(col)

  private val BATCH_CTE: String =
    s"""batch AS (
       |  SELECT * FROM tx WHERE createdAt > TIMESTAMP '$WM' AND successful)""".stripMargin

  /** Polkadot nominations-updated sink (updatescript.py:164-167). */
  def polkadotNominations(spark: SparkSession, sfDir: String): DataFrame =
    batch(spark, sfDir)
      .filter(col("chain") === 0 && col("stake") === col("alreadyBonded"))
      .select(passthrough :+ col("stake").as("volume"): _*)

  val polkadotNominationsSql: String =
    s"""WITH $TX_CTE,
       |$BATCH_CTE
       |SELECT _id, createdAt, stashId, stake, alreadyBonded, successful, chain,
       |       stake AS volume
       |FROM batch WHERE chain = 0 AND stake = alreadyBonded""".stripMargin

  /** Polkadot amount-staked sink (updatescript.py:169-172). */
  def polkadotAmountStaked(spark: SparkSession, sfDir: String): DataFrame =
    batch(spark, sfDir)
      .filter(col("chain") === 0 && col("stake") > col("alreadyBonded"))
      .select(passthrough :+ (col("stake") - col("alreadyBonded")).as("volume"): _*)

  val polkadotAmountStakedSql: String =
    s"""WITH $TX_CTE,
       |$BATCH_CTE
       |SELECT _id, createdAt, stashId, stake, alreadyBonded, successful, chain,
       |       stake - alreadyBonded AS volume
       |FROM batch WHERE chain = 0 AND stake > alreadyBonded""".stripMargin

  /** Kusama nominations sink — receives BOTH the equal-stake and the
    * increased-stake branches (quirk Q1, updatescript.py:196-204), with the
    * branch-specific volume.
    */
  def kusamaNominations(spark: SparkSession, sfDir: String): DataFrame =
    batch(spark, sfDir)
      .filter(col("chain") === 1 && col("stake") >= col("alreadyBonded"))
      .select(passthrough :+
        when(col("stake") === col("alreadyBonded"), col("stake"))
          .otherwise(col("stake") - col("alreadyBonded")).as("volume"): _*)

  val kusamaNominationsSql: String =
    s"""WITH $TX_CTE,
       |$BATCH_CTE
       |SELECT _id, createdAt, stashId, stake, alreadyBonded, successful, chain,
       |       CASE WHEN stake = alreadyBonded THEN stake ELSE stake - alreadyBonded END AS volume
       |FROM batch WHERE chain = 1 AND stake >= alreadyBonded""".stripMargin

  /** AUM sink, both chains (updatescript.py:174-186, 206-218): first row per
    * (chain, stashId) always lands with volume = stake; later rows land only
    * when stake ≠ alreadyBonded, with the signed delta.
    */
  def aum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("chain"), col("stashId"))
      .orderBy(col("createdAt"), col("_id"))
    batch(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 || col("stake") =!= col("alreadyBonded"))
      .select(passthrough :+
        when(col("rn") === 1, col("stake"))
          .otherwise(col("stake") - col("alreadyBonded")).as("volume"): _*)
  }

  val aumSql: String =
    s"""WITH $TX_CTE,
       |$BATCH_CTE,
       |numbered AS (
       |  SELECT *, row_number() OVER (PARTITION BY chain, stashId
       |                               ORDER BY createdAt, _id) AS rn
       |  FROM batch)
       |SELECT _id, createdAt, stashId, stake, alreadyBonded, successful, chain,
       |       CASE WHEN rn = 1 THEN stake ELSE stake - alreadyBonded END AS volume
       |FROM numbered WHERE rn = 1 OR stake <> alreadyBonded""".stripMargin

  /** Standalone W1 operator (SURVEY.md §2.5): the first event ever seen per
    * (chain, stashId) across full history — the reference's implicit
    * first-seen semantics as an explicit ranking query.
    */
  def firstSeenStash(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("chain"), col("stashId"))
      .orderBy(col("createdAt"), col("_id"))
    tx(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("chain"), col("stashId"), col("_id"),
        col("createdAt").as("firstSeenAt"), col("stake").as("firstStake"))
  }

  val firstSeenStashSql: String =
    s"""WITH $TX_CTE,
       |numbered AS (
       |  SELECT *, row_number() OVER (PARTITION BY chain, stashId
       |                               ORDER BY createdAt, _id) AS rn
       |  FROM tx)
       |SELECT chain, stashId, _id, createdAt AS firstSeenAt, stake AS firstStake
       |FROM numbered WHERE rn = 1""".stripMargin
}
