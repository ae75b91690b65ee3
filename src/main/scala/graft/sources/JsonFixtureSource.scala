package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's HTTP JSON sources (CoinGecko history/ticker and YieldScan
  * stats — /root/reference/updatescript.py:15-21) as bronze fixture tables.
  * Engine rule (SURVEY.md §2.1 S6–S8): no network I/O inside operators —
  * ingestion lands raw JSON-lines, and these readers parse it with a
  * DECLARED schema (no inference pass over the data) and extract exactly
  * the nested fields the reference touches.
  */
object JsonFixtureSource {

  /** CoinGecko /coins/{id}/history payload: the reference reads
    * `["market_data"]["current_price"]["usd"]` (updatescript.py:40,49).
    */
  val HISTORY_SCHEMA: StructType = StructType.fromDDL(
    "id STRING, date STRING, " +
      "market_data STRUCT<current_price: STRUCT<usd: DOUBLE>>")

  def coingeckoHistory(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(HISTORY_SCHEMA).json(path)
      .select(col("id").as("coin"),
        to_date(col("date"), "d-M-yyyy").as("price_date"),
        col("market_data.current_price.usd").as("price"))

  /** CoinGecko markets ticker: a JSON array, the reference takes
    * `[0]["current_price"]` (updatescript.py:42,51). Parsed with an array
    * schema + element_at — the F8 array-index path.
    */
  val TICKER_SCHEMA: String = "ARRAY<STRUCT<id: STRING, current_price: DOUBLE>>"

  def coingeckoTicker(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), TICKER_SCHEMA, Map.empty[String, String]).as("payload"))
      .select(element_at(col("payload"), 1).getField("id").as("coin"),
        element_at(col("payload"), 1).getField("current_price").as("price"))

  /** YieldScan /transactions/stats: flat field extraction
    * (updatescript.py:121,137).
    */
  val STATS_SCHEMA: StructType = StructType.fromDDL(
    "chain STRING, totalAmountCurrentlyManaged DOUBLE")

  def yieldscanStats(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(STATS_SCHEMA).json(path)
      .select(col("chain"), col("totalAmountCurrentlyManaged"))
}
