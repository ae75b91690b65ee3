package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** Declarative data-quality expectations over the warehouse tables — the
  * Deequ/Great-Expectations stage a 100 TB ingest runs BEFORE anything
  * downstream trusts the data. The reference pipeline encodes its
  * expectations implicitly (skip-if-missing guards, `successful` filters,
  * /root/reference/updatescript.py:37-47,62-96); this family makes the
  * contract explicit: one ledger row per rule with (checked, violations,
  * pass), so a regression is a diffable row, not a silent downstream skew.
  *
  * Scale design: every ROW-LEVEL rule on a table folds into ONE shared
  * single-pass aggregate over that table (conditional `sum(cast(bool))`
  * columns melted to rows by `stack` — the Deequ "one scan, many metrics"
  * discipline; adding a rule adds a column to the agg, not a scan).
  * UNIQUENESS inherently needs key distinctness — that rule rides the same
  * agg as a `count_distinct` (hash-partial + final, the unavoidable
  * shuffle priced by the check, not by re-scanning). REFERENTIAL rules are
  * one-pass orphan counts (LEFT equi-join + conditional sum): dimension
  * key-sets broadcast (customer), fact→fact (lineitem→orders) shuffles on
  * the join key under AQE. The ledger output is ≤ |rules| rows.
  */
object DataQuality {

  /** One row-level rule: name + the VIOLATION predicate (true = bad row). */
  private final case class Rule(name: String, bad: Column)

  /** All row-level rules for one table as a single aggregate pass, melted
    * to (rule, tbl, checked, violations) rows via `stack`.
    */
  private def rowRules(df: DataFrame, tbl: String, rules: Seq[Rule],
                       uniqueKey: Option[(String, Column)] = None): DataFrame = {
    val aggs =
      rules.map(r => sum(r.bad.cast("long")).as(r.name)) ++
        uniqueKey.map { case (n, k) =>
          (count(lit(1)) - count_distinct(k)).as(n)
        }
    val names = rules.map(_.name) ++ uniqueKey.map(_._1)
    val one = df.agg(count(lit(1)).as("checked"), aggs: _*)
    val stackArgs = names.map(n => s"'$n', $n").mkString(", ")
    one.selectExpr(
      s"stack(${names.size}, $stackArgs) as (rule, violations)", "checked")
      .select(col("rule"), lit(tbl).as("tbl"), col("checked"),
        col("violations").cast("long").as("violations"))
  }

  /** A referential rule: orphans of `child` (on `key`) absent from
    * `parent` (on `pkey`). ONE pass: LEFT equi-join against the parent's
    * distinct key set (distinct so a corrupt duplicate parent key can't
    * inflate `checked`), then `checked` and `violations` fall out of the
    * same aggregate — never a row-by-row probe, never a second child scan.
    * A null child key never equi-joins, so it counts as an orphan, which
    * is the semantics we want: a null FK is as dangling as a wrong one.
    */
  private def refRule(name: String, tbl: String, child: DataFrame, key: String,
                      parent: DataFrame, pkey: String): DataFrame =
    child.select(col(key))
      .join(parent.select(col(pkey).as(key)).distinct()
        .withColumn("__hit", lit(1)), Seq(key), "left")
      .agg(count(lit(1)).as("checked"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit(name).as("rule"), lit(tbl).as("tbl"),
        col("checked"), col("violations"))

  /** `dq_expectations`: the full rule ledger. Columns: rule, tbl, checked,
    * violations, pass (1 iff violations = 0).
    */
  def dqExpectations(spark: SparkSession, sfDir: String): DataFrame =
    dqLedger(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.events(spark, sfDir),
      Tables.documents(spark, sfDir))

  /** The ledger over explicit table frames — the seam the spec uses to
    * prove each rule actually FIRES on planted corruption (the production
    * fixture is clean, so violations=0 there proves nothing about
    * detection).
    */
  private[graft] def dqLedger(orders: DataFrame, lineitem: DataFrame,
                              customer: DataFrame, events: DataFrame,
                              documents: DataFrame): DataFrame = {

    val orderRules = rowRules(orders, "orders", Seq(
      Rule("not_null_o_custkey", col("o_custkey").isNull),
      Rule("accepted_o_orderstatus", !col("o_orderstatus").isin("O", "F", "P")),
      Rule("positive_o_totalprice", !(col("o_totalprice") > 0))),
      uniqueKey = Some(("unique_o_orderkey", col("o_orderkey"))))

    val lineRules = rowRules(lineitem, "lineitem", Seq(
      Rule("range_l_quantity", !col("l_quantity").between(1, 50)),
      Rule("range_l_discount", !col("l_discount").between(0, 0.1)),
      Rule("nonneg_l_extendedprice", !(col("l_extendedprice") >= 0))))

    val eventRules = rowRules(events, "events", Seq(
      Rule("not_null_user_id", col("user_id").isNull),
      Rule("positive_value", !(col("value") > 0)),
      // parseable JSON object carrying the expected integer payload key
      Rule("json_props_has_k",
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").isNull)))

    val docRules = rowRules(documents, "documents", Seq(
      Rule("chars_consistency", col("n_chars") =!= length(col("text"))),
      Rule("nonempty_text", !(length(col("text")) > 0))))

    val refs = Seq(
      refRule("ref_orders_customer", "orders", orders, "o_custkey", customer, "c_custkey"),
      refRule("ref_lineitem_orders", "lineitem",
        lineitem.withColumnRenamed("l_orderkey", "lkey"), "lkey",
        orders.withColumnRenamed("o_orderkey", "lkey"), "lkey"),
      refRule("ref_events_customer", "events", events, "user_id",
        customer.withColumnRenamed("c_custkey", "user_id"), "user_id"))

    (Seq(orderRules, lineRules, eventRules, docRules) ++ refs)
      .reduce(_ unionByName _)
      .withColumn("pass", (col("violations") === 0).cast("int"))
  }

  val dqExpectationsSql: String = {
    def row(rule: String, tbl: String, checkedSql: String, violSql: String) =
      s"""SELECT '$rule' AS rule, '$tbl' AS tbl,
         |       CAST(($checkedSql) AS BIGINT) AS checked,
         |       CAST(($violSql) AS BIGINT) AS violations""".stripMargin
    val rows = Seq(
      row("not_null_o_custkey", "orders", "SELECT count(*) FROM orders",
        "SELECT count(*) FROM orders WHERE o_custkey IS NULL"),
      row("accepted_o_orderstatus", "orders", "SELECT count(*) FROM orders",
        "SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P')"),
      row("positive_o_totalprice", "orders", "SELECT count(*) FROM orders",
        "SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0)"),
      row("unique_o_orderkey", "orders", "SELECT count(*) FROM orders",
        "SELECT count(*) - count(DISTINCT o_orderkey) FROM orders"),
      row("range_l_quantity", "lineitem", "SELECT count(*) FROM lineitem",
        "SELECT count(*) FROM lineitem WHERE l_quantity NOT BETWEEN 1 AND 50"),
      row("range_l_discount", "lineitem", "SELECT count(*) FROM lineitem",
        "SELECT count(*) FROM lineitem WHERE l_discount NOT BETWEEN 0 AND 0.1"),
      row("nonneg_l_extendedprice", "lineitem", "SELECT count(*) FROM lineitem",
        "SELECT count(*) FROM lineitem WHERE NOT (l_extendedprice >= 0)"),
      row("not_null_user_id", "events", "SELECT count(*) FROM events",
        "SELECT count(*) FROM events WHERE user_id IS NULL"),
      row("positive_value", "events", "SELECT count(*) FROM events",
        "SELECT count(*) FROM events WHERE NOT (value > 0)"),
      row("json_props_has_k", "events", "SELECT count(*) FROM events",
        "SELECT count(*) FROM events WHERE try_cast(json_extract_string(props, '$.k') AS BIGINT) IS NULL"),
      row("chars_consistency", "documents", "SELECT count(*) FROM documents",
        "SELECT count(*) FROM documents WHERE n_chars <> length(text)"),
      row("nonempty_text", "documents", "SELECT count(*) FROM documents",
        "SELECT count(*) FROM documents WHERE NOT (length(text) > 0)"),
      row("ref_orders_customer", "orders", "SELECT count(*) FROM orders",
        """SELECT count(*) FROM orders o LEFT JOIN customer c
          |   ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL""".stripMargin),
      row("ref_lineitem_orders", "lineitem", "SELECT count(*) FROM lineitem",
        """SELECT count(*) FROM lineitem l LEFT JOIN orders o
          |   ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL""".stripMargin),
      row("ref_events_customer", "events", "SELECT count(*) FROM events",
        """SELECT count(*) FROM events e LEFT JOIN customer c
          |   ON e.user_id = c.c_custkey WHERE c.c_custkey IS NULL""".stripMargin))
    s"""SELECT rule, tbl, checked, violations,
       |       CASE WHEN violations = 0 THEN 1 ELSE 0 END AS pass
       |FROM (${rows.mkString("\nUNION ALL\n")})""".stripMargin
  }
}
