package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** Privacy-risk auditing over the customer dimension — the stage a
  * training-data pipeline runs NEXT TO the PII scrub
  * ([[TextAnalysis]]'s regex redaction): scrubbing removes direct
  * identifiers, but re-identification risk lives in QUASI-IDENTIFIER
  * combinations (nation × segment × balance bucket singles a person out
  * even with the name gone). Three classic audits, each a plain
  * aggregate so the numbers are exact cross-engine:
  *
  *  - K-ANONYMITY (Sweeney): equivalence-class size histogram over the
  *    QI tuple — a class of size k means each member hides among k
  *    records; k < [[K_MIN]] is the re-identifiable mass.
  *  - L-DIVERSITY (Machanavajjhala et al.): within each QI class, how
  *    many DISTINCT sensitive values appear — a k-anonymous class with
  *    one sensitive value still leaks it (homogeneity attack).
  *  - THE GENERALIZATION LADDER: k-anonymity re-evaluated at
  *    successively coarser QI encodings (finer balance buckets → coarser
  *    → suppressed; nation → region) in ONE pass — the "cheapest
  *    generalization that reaches k ≥ K" decision as a query, the same
  *    melt discipline as [[DataQuality]]'s rules (adding a ladder level
  *    adds rows to the melt, not a scan).
  *
  * Scale design: every audit is scan → (melt ≤ |levels|×) → hash
  * aggregate on the class key → tiny histogram (≤ |levels| · max-k
  * rows). The nation→region generalization joins the 25-row nation dim
  * BROADCAST. No windows, no pair spaces, no driver state; class-key
  * skew is impossible past the cap because a class IS a group — the
  * biggest class is one aggregation cell, never a pair blowup (contrast
  * ER blocking, where a hot key meant |b|² pairs).
  *
  * The reference has no privacy surface (updatescript.py handles public
  * chain data); this family is beyond-reference engine completeness.
  */
object Privacy {

  /** Minimum acceptable equivalence-class size (the classic k = 5). */
  val K_MIN = 5L

  /** Minimum acceptable within-class sensitive diversity. */
  val L_MIN = 3L

  /** Balance bucket at the finest ladder level: floor(acctbal / 1000).
    * The fixture scans `c_acctbal` as parquet DOUBLE, and the explicit
    * cast below pins that: floor of an IEEE double division is then
    * bit-identical in Spark and DuckDB by construction, even if a future
    * fixture ships the column as DECIMAL (whose division follows
    * engine-specific scale rules, a different argument entirely).
    * Integer `div` would NOT be cross-engine-safe either way (Spark
    * truncates toward zero, DuckDB floors — they differ on negatives).
    */
  private def balBucket(width: Int): Column =
    floor(col("c_acctbal").cast("double") / lit(width)).cast("long")

  /** The ladder: level → the QI tuple rendered as one class-key string.
    * Levels coarsen monotonically — each level's classes are unions of
    * the previous level's — so min-k can only rise up the ladder (the
    * spec asserts this).
    */
  private def ladder: Seq[(Int, Column)] = Seq(
    0 -> concat_ws("|", col("c_nationkey"), col("c_mktsegment"), balBucket(1000)),
    1 -> concat_ws("|", col("c_nationkey"), col("c_mktsegment"), balBucket(5000)),
    2 -> concat_ws("|", col("c_nationkey"), col("c_mktsegment")),
    3 -> concat_ws("|", col("n_regionkey"), col("c_mktsegment")),
    4 -> concat_ws("|", col("n_regionkey")))

  private def withRegion(customer: DataFrame, nation: DataFrame): DataFrame =
    customer.join(
      broadcast(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey"))), Seq("c_nationkey"))

  /** `privacy_k_anon`: the class-size histogram at the FINEST QI level
    * (level 0) — (k, n_classes, n_rows, at_risk). `n_rows = k·n_classes`
    * is the re-identifiable record mass when `at_risk` = 1.
    */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    kAnonymityOver(Tables.customer(spark, sfDir))

  private[graft] def kAnonymityOver(customer: DataFrame): DataFrame =
    customer
      .groupBy(concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        balBucket(1000)).as("qi"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"))
      .select(col("k"), col("n_classes"),
        (col("k") * col("n_classes")).as("n_rows"),
        (col("k") < K_MIN).cast("int").as("at_risk"))

  /** `privacy_l_diversity`: within-class sensitive-value diversity.
    * QI = (nation, balance bucket); sensitive = market segment. Output
    * is the (l, n_classes, n_rows, below_l) histogram — `below_l` marks
    * homogeneity-attack exposure (classes whose members' segment is
    * (near-)determined by their QI).
    */
  def lDiversity(spark: SparkSession, sfDir: String): DataFrame =
    lDiversityOver(Tables.customer(spark, sfDir))

  private[graft] def lDiversityOver(customer: DataFrame): DataFrame =
    customer
      .groupBy(concat_ws("|", col("c_nationkey"), balBucket(1000)).as("qi"))
      .agg(count(lit(1)).as("k"), count_distinct(col("c_mktsegment")).as("l"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_rows"))
      .select(col("l"), col("n_classes"), col("n_rows"),
        (col("l") < L_MIN).cast("int").as("below_l"))

  /** `privacy_generalization`: k-anonymity at every ladder level in one
    * pass — melt each record to (level, class-key) rows, one hash
    * aggregate keyed (level, key), then a per-level rollup: class count,
    * worst-case k, the record mass still below [[K_MIN]], and whether
    * the level meets k ≥ K. The cheapest adequate generalization is the
    * smallest level with `meets_k` = 1.
    */
  def generalizationLadder(spark: SparkSession, sfDir: String): DataFrame =
    generalizationLadderOver(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir))

  private[graft] def generalizationLadderOver(customer: DataFrame,
      nation: DataFrame): DataFrame =
    ladderRollup(ladderCounts(customer, nation))

  /** `privacy_k_anon_incremental`: the k-anonymity audit MAINTAINED as
    * customers arrive — the incremental completion of [[kAnonymity]]
    * (privacy was the last audit family without one). k-anonymity is a
    * corpus-level property, so there is no "arrival-touching
    * restriction": the standing state is the per-QI-class COUNT table
    * ([[FitStore]]-persisted, one row per occupied class — aggregate
    * grain, never per-record), arrival deltas merge by sum, and the
    * histogram rolls up from the merged counts. Output ≡ the cold audit
    * over the full corpus (the oracle is literally [[kAnonymitySql]]).
    * Even c_custkey plays the standing corpus, odd the arriving batch.
    * Per-batch cost: one scan of the batch + a ≤|classes|-row merge —
    * the DQ-ledger partial-merge pattern applied to the privacy grain.
    */
  def kAnonymityIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val standing = sharedClassCounts(spark, sfDir,
      "privacy_qik_st", qiK, cust.filter(col("c_custkey") % 2 === 0))
    val deltas = classCounts(qiK, cust.filter(col("c_custkey") % 2 === 1))
    kHistogram(mergeCounts(standing, deltas).select(col("qi"), col("k")))
  }

  /** `privacy_l_div_incremental`: l-diversity maintained under arrivals.
    * `count_distinct(segment)` does NOT merge from per-class counts —
    * the mergeable grain is one level finer: the standing state is the
    * (qi, segment, cnt) table, deltas sum at that grain, and k/l derive
    * from the merged table (k = Σ cnt, l = distinct segments present).
    * The same choose-the-grain lesson as ER's mode-source survivorship:
    * persist the count table, not the statistic.
    */
  def lDiversityIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val standing = sharedClassCounts(spark, sfDir,
      "privacy_qiseg_st", qiSeg, cust.filter(col("c_custkey") % 2 === 0))
    val deltas = classCounts(qiSeg, cust.filter(col("c_custkey") % 2 === 1))
    lHistogram(mergeCounts(standing, deltas))
  }

  /** The l-diversity rollup from the mergeable (qi, seg, k) grain —
    * shared verbatim by the incremental merge and the streaming drain
    * (round-14: the privacy family's twins must share one rollup body
    * so the modes cannot drift).
    */
  private[graft] def lHistogram(merged: DataFrame): DataFrame =
    merged.groupBy(col("qi"))
      .agg(sum(col("k")).as("k"), count(lit(1)).as("l"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).cast("long").as("n_rows"))
      .select(col("l"), col("n_classes"), col("n_rows"),
        (col("l") < L_MIN).cast("int").as("below_l"))

  /** `privacy_ladder_incremental`: the generalization ladder maintained
    * under arrivals — the last privacy audit to get its incremental
    * form. The melt is per-record and level-local, so the standing
    * state is the (level, qi, k) count table (the same one-pass melt,
    * persisted at the aggregate grain) and arrival deltas are the
    * batch's own melt; the per-level rollup runs over the merged
    * ≤ |levels|·|classes|-row table. Output ≡ the cold ladder over the
    * full corpus ([[generalizationLadderSql]] verbatim). The nation dim
    * joins BROADCAST on both sides of the split, as in the cold pass.
    */
  def generalizationLadderIncremental(spark: SparkSession,
      sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val standing = sharedLadderCounts(spark, sfDir)
    val deltas = ladderCounts(cust.filter(col("c_custkey") % 2 === 1), nation)
    ladderRollup(standing.unionByName(deltas)
      .groupBy(col("level"), col("qi")).agg(sum(col("k")).as("k")))
  }

  /** The per-level rollup from the (level, qi, k) class grain — shared
    * verbatim by the cold ladder, the incremental merge, and the
    * streaming drain.
    */
  private[graft] def ladderRollup(cls: DataFrame): DataFrame =
    cls.groupBy(col("level"))
      .agg(count(lit(1)).as("n_classes"), min(col("k")).as("min_k"),
        sum(when(col("k") < K_MIN, col("k")).otherwise(lit(0L))).as("rows_below_k"))
      .select(col("level"), col("n_classes"), col("min_k"), col("rows_below_k"),
        (col("rows_below_k") === 0).cast("int").as("meets_k"))

  /** The FitStore-persisted standing (level, qi, k) ladder table (even
    * custkeys) — shared by the incremental and the streaming drain.
    */
  private[graft] def sharedLadderCounts(spark: SparkSession,
      sfDir: String): DataFrame =
    SharedFits.memo(spark, s"privacy_ladder_st:$sfDir") {
      FitStore.frame(spark, "privacy_ladder_st",
        SharedFits.memo(spark, s"fp:customer_even:$sfDir") {
          FitStore.fingerprint(
            Tables.customer(spark, sfDir).filter(col("c_custkey") % 2 === 0),
            Seq("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"))
        }) {
        ladderCounts(
          Tables.customer(spark, sfDir).filter(col("c_custkey") % 2 === 0),
          Tables.nation(spark, sfDir))
      }.localCheckpoint()
    }

  /** The ladder melt at its mergeable (level, qi, k) grain. */
  private[graft] def ladderCounts(customer: DataFrame, nation: DataFrame): DataFrame =
    withRegion(customer, nation)
      .select(explode(array(ladder.map { case (lvl, key) =>
        struct(lit(lvl).as("level"), key.as("qi"))
      }: _*)).as("m"))
      .groupBy(col("m.level").as("level"), col("m.qi").as("qi"))
      .agg(count(lit(1)).as("k"))

  /** k-anonymity QI key (level 0) and the l-diversity (QI, sensitive)
    * grain key. Both include every column the downstream statistic
    * needs, so partials merge without loss.
    */
  private[graft] def qiK: Seq[Column] = Seq(
    concat_ws("|", col("c_nationkey"), col("c_mktsegment"), balBucket(1000))
      .as("qi"))
  private[graft] def qiSeg: Seq[Column] = Seq(
    concat_ws("|", col("c_nationkey"), balBucket(1000)).as("qi"),
    col("c_mktsegment").as("seg"))

  private[graft] def classCounts(keys: Seq[Column], c: DataFrame): DataFrame =
    c.groupBy(keys: _*).agg(count(lit(1)).as("k"))

  private[graft] def mergeCounts(standing: DataFrame, deltas: DataFrame): DataFrame = {
    val keyCols = standing.columns.filterNot(_ == "k").map(col).toSeq
    standing.unionByName(deltas)
      .groupBy(keyCols: _*).agg(sum(col("k")).as("k"))
  }

  private[graft] def kHistogram(classes: DataFrame): DataFrame =
    classes.groupBy(col("k")).agg(count(lit(1)).as("n_classes"))
      .select(col("k"), col("n_classes"),
        (col("k") * col("n_classes")).as("n_rows"),
        (col("k") < K_MIN).cast("int").as("at_risk"))

  /** The FitStore-persisted standing class-count table (fingerprinted on
    * the even-custkey half it is fitted from).
    */
  private[graft] def sharedClassCounts(spark: SparkSession, sfDir: String,
      name: String, keys: Seq[Column], standing: DataFrame): DataFrame =
    SharedFits.memo(spark, s"$name:$sfDir") {
      FitStore.frame(spark, name,
        SharedFits.memo(spark, s"fp:customer_even:$sfDir") {
          FitStore.fingerprint(
            Tables.customer(spark, sfDir).filter(col("c_custkey") % 2 === 0),
            Seq("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"))
        }) {
        classCounts(keys, standing)
      }.localCheckpoint()
    }

  // ── DuckDB oracles ─────────────────────────────────────────────────────

  val kAnonymitySql: String =
    s"""SELECT k, count(*) AS n_classes, k * count(*) AS n_rows,
       |       CASE WHEN k < $K_MIN THEN 1 ELSE 0 END AS at_risk
       |FROM (
       |  SELECT count(*) AS k FROM customer
       |  GROUP BY concat_ws('|', c_nationkey, c_mktsegment,
       |                     CAST(floor(c_acctbal / 1000) AS BIGINT)))
       |GROUP BY k""".stripMargin

  val lDiversitySql: String =
    s"""SELECT l, count(*) AS n_classes, CAST(sum(k) AS BIGINT) AS n_rows,
       |       CASE WHEN l < $L_MIN THEN 1 ELSE 0 END AS below_l
       |FROM (
       |  SELECT count(*) AS k, count(DISTINCT c_mktsegment) AS l
       |  FROM customer
       |  GROUP BY concat_ws('|', c_nationkey,
       |                     CAST(floor(c_acctbal / 1000) AS BIGINT)))
       |GROUP BY l""".stripMargin

  val generalizationLadderSql: String = {
    val levels = Seq(
      0 -> "concat_ws('|', c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT))",
      1 -> "concat_ws('|', c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 5000) AS BIGINT))",
      2 -> "concat_ws('|', c_nationkey, c_mktsegment)",
      3 -> "concat_ws('|', n_regionkey, c_mktsegment)",
      4 -> "concat_ws('|', n_regionkey)")
    val melted = levels.map { case (lvl, key) =>
      s"SELECT $lvl AS level, $key AS qi FROM customer JOIN nation ON c_nationkey = n_nationkey"
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS ($melted),
       |cls AS (SELECT level, qi, count(*) AS k FROM m GROUP BY 1, 2)
       |SELECT level, count(*) AS n_classes, min(k) AS min_k,
       |       CAST(sum(CASE WHEN k < $K_MIN THEN k ELSE 0 END) AS BIGINT) AS rows_below_k,
       |       CASE WHEN sum(CASE WHEN k < $K_MIN THEN k ELSE 0 END) = 0
       |            THEN 1 ELSE 0 END AS meets_k
       |FROM cls GROUP BY level""".stripMargin
  }
}
