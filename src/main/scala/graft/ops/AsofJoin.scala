package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** As-of join: enrich each left row with the most recent right row whose
  * time is at-or-before the left row's time, per key — the operator Spark
  * lacks natively (SPARK-22947). Built by composition (preference (a) of
  * the custom-operator ladder): union both sides into one frame, sort by
  * (key, time, side) inside a window, and carry the right-side values
  * forward with `last(..., ignoreNulls)` — one shuffle on the key, linear
  * in |left|+|right|, versus the quadratic blowup of the naive range-join
  * formulation.
  *
  * Scale note: the window serializes per key. With fine-grained keys
  * (instrument id, user id) this scales flat; for very-low-cardinality
  * keys at 100 TB the next step is time-bucketing the partition key and
  * carrying a per-bucket seed value in (or a custom SparkPlan, ladder
  * step (c)).
  */
object AsofJoin {

  /** Left rows + `valueCols` from the as-of matching right row (null where
    * no right row precedes). Ties (equal timestamps) match, like DuckDB's
    * `ASOF JOIN ... ON l.t >= r.t`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val leftOther = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTime)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("_t"), lit(0).as("_is_r")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftOther.map(col): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("_t"), lit(1).as("_is_r")) ++
        valueCols.map(col) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows sort before left rows at the same instant, so an
    // exactly-coincident right value is visible to the left row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .select(
        keys.map(col) ++ Seq(col("_t"), col("_is_r")) ++ leftOther.map(col) ++
          valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_is_r") === 0)
      .select(keys.map(col) ++ Seq(col("_t").as(leftTime)) ++ leftOther.map(col) ++
        valueCols.map(col): _*)
  }

  /** tx enrichment via as-of semantics: each transaction takes the most
    * recent daily price at-or-before its timestamp (vs. the reference's
    * strict same-day bucket, updatescript.py:66-67 — as-of also covers
    * gap days). Inner semantics: transactions before the first price drop.
    */
  def txEnrichAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.txSince(spark, sfDir, Tables.WM)
    val p = Tables.dailyPrice(spark, sfDir)
      .select(col("chain"), col("price_date").cast("timestamp").as("pts"), col("price"))
    asofJoin(t, p, Seq("chain"), "createdAt", "pts", Seq("price"))
      .filter(col("price").isNotNull)
      .select(col("_id"), col("createdAt"), col("chain"), col("stake"),
        col("price").as("asof_price"))
  }

  val txEnrichAsofSql: String =
    s"""WITH ${Tables.TX_CTE},
       |${Tables.PRICE_CTE},
       |p2 AS (SELECT chain, CAST(price_date AS TIMESTAMP) AS pts, price FROM price),
       |t AS (SELECT * FROM tx WHERE createdAt > TIMESTAMP '${Tables.WM}')
       |SELECT t._id, t.createdAt, t.chain, t.stake, p.price AS asof_price
       |FROM t ASOF JOIN p2 p ON t.chain = p.chain AND t.createdAt >= p.pts""".stripMargin
}
