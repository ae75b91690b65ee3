package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.ops.Privacy
import graft.pipeline.Tables

/** Privacy audits: planted QI classes prove the histograms count what they
  * claim (the fixture's own risk mass proves only that SOMETHING is
  * counted), plus the ladder's monotonicity law and the plan shapes that
  * keep the audits scan-shaped at 100 TB.
  */
class PrivacySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** A hand-built customer frame with EXACTLY known equivalence classes:
    * nation 1 / segment A / bucket 0 → 5 rows (safe class),
    * nation 1 / segment B / bucket 0 → 2 rows (at risk),
    * nation 2 / segment A / bucket 3 → 1 row  (singleton, at risk).
    */
  private def plantedCustomers: DataFrame = {
    import spark.implicits._
    val rows =
      (1 to 5).map(i => (100L + i, "c", 1, 500.0, "A")) ++
        Seq((201L, "c", 1, 600.0, "B"), (202L, "c", 1, 700.0, "B")) ++
        Seq((301L, "c", 2, 3500.0, "A"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  test("k-anonymity: planted classes land in the exact histogram buckets") {
    val hist = Privacy.kAnonymityOver(plantedCustomers).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(hist == Map(
      5L -> ((1L, 5L, 0)),   // the safe class: k=5, not at risk
      2L -> ((1L, 2L, 1)),   // segment-B pair: at risk
      1L -> ((1L, 1L, 1))),  // the singleton: at risk
      s"histogram was $hist")
  }

  test("l-diversity: a k-safe but homogeneous class is flagged below_l") {
    // QI for l-diversity is (nation, bucket): the 5 A's and 2 B's of
    // nation 1 / bucket 0 form ONE class with l=2 (< L_MIN=3) and k=7 —
    // k-anonymous mass can still leak its sensitive value
    val hist = Privacy.lDiversityOver(plantedCustomers).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(hist == Map(
      2L -> ((1L, 7L, 1)),   // the mixed class: only 2 segments → flagged
      1L -> ((1L, 1L, 1))),  // the singleton: l=1 → flagged
      s"histogram was $hist")
  }

  test("ladder: coarsening is monotone — min_k never falls, meets_k never reverts") {
    val rows = Privacy.generalizationLadder(spark, sf)
      .orderBy(col("level")).collect()
    assert(rows.length == 5, "five ladder levels")
    val minK = rows.map(_.getLong(rows.head.fieldIndex("min_k")))
    assert(minK.zip(minK.tail).forall { case (a, b) => b >= a },
      s"min_k must be non-decreasing up the ladder, got ${minK.toSeq}")
    val meets = rows.map(_.getInt(rows.head.fieldIndex("meets_k")))
    assert(meets.zip(meets.tail).forall { case (a, b) => b >= a },
      s"an adequate level cannot become inadequate when coarsened further")
    val below = rows.map(_.getLong(rows.head.fieldIndex("rows_below_k")))
    assert(below.zip(below.tail).forall { case (a, b) => b <= a },
      s"at-risk mass must shrink up the ladder, got ${below.toSeq}")
  }

  test("ladder accounting: every level's classes partition the corpus") {
    val n = Tables.customer(spark, sf).count()
    Privacy.generalizationLadder(spark, sf).collect().foreach { r =>
      val level = r.getInt(r.fieldIndex("level"))
      val below = r.getLong(r.fieldIndex("rows_below_k"))
      assert(below <= n, s"level $level at-risk mass exceeds the corpus")
    }
    // cross-check level-0 against the k-anonymity histogram's total mass
    val histMass = Privacy.kAnonymity(spark, sf)
      .agg(sum(col("n_rows"))).head.getLong(0)
    assert(histMass == n, "k histogram must account for every record")
  }

  test("streaming k-anonymity: drained class counts + standing merge ≡ the cold audit") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(rows(graft.streaming.StreamingPipeline.privacyKAnonReplay(spark, sf))
      == rows(Privacy.kAnonymity(spark, sf)))
  }

  test("streaming l-diversity: drained (qi, seg) cells + standing merge ≡ the cold audit") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(rows(graft.streaming.StreamingPipeline.privacyLDivReplay(spark, sf))
      == rows(Privacy.lDiversity(spark, sf)))
  }

  test("streaming ladder: drained level classes + standing merge ≡ the cold ladder") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Long, Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(rows(graft.streaming.StreamingPipeline.privacyLadderReplay(spark, sf))
      == rows(Privacy.generalizationLadder(spark, sf)))
  }

  test("plan: audits are scan-shaped — ladder reads customer once, nation broadcast") {
    val ladder = Privacy.generalizationLadder(spark, sf)
    val scans = ladder.queryExecution.optimizedPlan
      .collect { case l: LogicalRelation => l }
    assert(scans.size == 2,
      s"ladder must scan customer once + nation once, got ${scans.size}")
    val p = ladder.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), "nation dim must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "histograms are aggregates, never windows")
  }
}
