package graft

import java.sql.Timestamp

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest at-or-before value per key; ties match; no-predecessor is null") {
    val left = Seq(
      (1L, ts("2024-01-02 00:00:00"), 1L),  // between p@01 and p@03 -> 10
      (2L, ts("2024-01-03 00:00:00"), 1L),  // exactly at p@03 -> 20 (tie matches)
      (3L, ts("2024-01-04 00:00:00"), 1L),  // after last -> 20
      (4L, ts("2023-12-31 00:00:00"), 1L),  // before first -> null
      (5L, ts("2024-01-05 00:00:00"), 2L))  // other key -> 99
      .toDF("id", "t", "k")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-03 00:00:00"), 20.0),
      (2L, ts("2024-01-01 00:00:00"), 99.0))
      .toDF("k", "pt", "v")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(10.0), 2L -> Some(20.0), 3L -> Some(20.0),
      4L -> None, 5L -> Some(99.0)))
  }

  test("asof join preserves every left row exactly once") {
    val left = (1 to 100).map(i => (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"), i % 3L))
      .toDF("id", "t", "k")
    val right = Seq((0L, ts("2024-01-01 00:00:00"), 1.0), (1L, ts("2024-01-15 00:00:00"), 2.0))
      .toDF("k", "pt", "v")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v"))
    assert(out.count() == 100)
    assert(out.select("id").distinct().count() == 100)
  }

  test("bucketed asof join matches the plain variant row for row") {
    // gap days, multi-event days, coincident timestamps, pre-history rows —
    // the seed/carry logic must reproduce the key-window result exactly
    val left = (1 to 200).map { i =>
      (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:30:00"), i % 2L)
    }.toDF("id", "t", "k")
    // unique (k, pt) per right row — coincident right rows have undefined
    // tie-winners in ANY asof formulation
    val right = (0 to 27).filter(d => d % 3 != 1).map { d =>
      (d % 2L, ts(f"2024-01-${d + 1}%02d 00:00:00"), d * 1.5)
    }.toDF("k", "pt", "v")
    val plain = AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val bucketed = AsofJoin.asofJoinBucketed(left, right, Seq("k"), "t", "pt", Seq("v"),
        org.apache.spark.sql.functions.date_trunc("DAY", _))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(bucketed == plain)
  }

  test("duplicate right timestamps: deterministic greatest-value pick, plain == bucketed") {
    val left = Seq(
      (1L, ts("2024-01-02 12:00:00"), 1L), // after the duplicate pair -> greater value
      (2L, ts("2024-01-05 00:00:00"), 1L), // after a bucket-final duplicate pair
      (3L, ts("2024-01-02 00:00:00"), 1L)) // exactly AT the duplicate instant (tie matches)
      .toDF("id", "t", "k")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), 10.0), // duplicate instant, smaller value
      (1L, ts("2024-01-02 00:00:00"), 30.0), // duplicate instant, greater value — must win
      (1L, ts("2024-01-03 23:59:59"), 5.0),  // bucket-final duplicates: seed pass must
      (1L, ts("2024-01-03 23:59:59"), 7.0))  // agree with the row-level pass
      .toDF("k", "pt", "v")
    val expect = Map(1L -> Some(30.0), 2L -> Some(7.0), 3L -> Some(30.0))
    val plain = AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val bucketed = AsofJoin.asofJoinBucketed(left, right, Seq("k"), "t", "pt", Seq("v"),
        org.apache.spark.sql.functions.date_trunc("DAY", _))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(plain == expect)
    assert(bucketed == expect)
  }

  test("reserved internal column names are rejected with a clear error") {
    val left = Seq((1L, ts("2024-01-02 00:00:00"), 1L)).toDF("id", "_t", "k")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "pt", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("k"), "_t", "pt", Seq("v"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("native asof exec matches the composed variant on edge cases and random data") {
    // edge cases from the first test
    val left1 = Seq(
      (1L, ts("2024-01-02 00:00:00"), 1L), (2L, ts("2024-01-03 00:00:00"), 1L),
      (3L, ts("2024-01-04 00:00:00"), 1L), (4L, ts("2023-12-31 00:00:00"), 1L),
      (5L, ts("2024-01-05 00:00:00"), 2L),
      (6L, ts("2024-01-05 00:00:00"), 9L)).toDF("id", "t", "k") // key absent on right
    val right1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0), (1L, ts("2024-01-03 00:00:00"), 20.0),
      (2L, ts("2024-01-01 00:00:00"), 99.0)).toDF("k", "pt", "v")
    val got1 = AsofJoin.asofJoinNative(left1, right1, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got1 == Map(1L -> Some(10.0), 2L -> Some(20.0), 3L -> Some(20.0),
      4L -> None, 5L -> Some(99.0), 6L -> None))
    // randomized equivalence against the composed variant
    val left2 = (1 to 200).map { i =>
      (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:30:00"), i % 3L)
    }.toDF("id", "t", "k")
    val right2 = (0 to 27).filter(d => d % 4 != 1).map { d =>
      (d % 3L, ts(f"2024-01-${d + 1}%02d 00:00:00"), d * 1.5)
    }.toDF("k", "pt", "v")
    val plain = AsofJoin.asofJoin(left2, right2, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val native = AsofJoin.asofJoinNative(left2, right2, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(native == plain)
  }

  test("native asof exec plan contains the custom operator and sorted exchanges") {
    val left = Seq((1L, ts("2024-01-02 00:00:00"), 1L)).toDF("id", "t", "k")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 10.0)).toDF("k", "pt", "v")
    val df = AsofJoin.asofJoinNative(left, right, Seq("k"), "t", "pt", Seq("v"))
    assert(df.count() == 1)
    // AQE shows the final physical tree only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
  }

  test("range join: interval membership with exclusive end, no nested-loop plan") {
    val left = Seq(
      (1L, ts("2024-01-02 12:00:00"), 1L), // inside [01, 04)
      (2L, ts("2024-01-04 00:00:00"), 1L), // exactly at end -> next interval
      (3L, ts("2024-01-09 00:00:00"), 1L), // in no interval
      (4L, ts("2024-01-01 00:00:00"), 1L)) // exactly at start -> matches
      .toDF("id", "t", "k")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-04 00:00:00"), 10.0),
      (1L, ts("2024-01-04 00:00:00"), ts("2024-01-06 00:00:00"), 20.0))
      .toDF("k", "s", "e", "v")
    val df = AsofJoin.rangeJoinBucketed(left, right, Seq("k"), "t", "s", "e", 86400L)
    val got = df.select("id", "v").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 20.0, 4L -> 10.0)) // id 3 drops (inner)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("null-time right rows match nothing and never block the key (all variants)") {
    // the null-time right row heads its key group under Ascending order —
    // the native merge must DISCARD it, or every later right row of key 1
    // is blocked and all of key 1 enriches as null
    val left = Seq(
      (1L, ts("2024-01-02 00:00:00"), 1L),
      (2L, ts("2024-01-04 00:00:00"), 1L),
      (3L, ts("2023-12-31 00:00:00"), 1L))
      .toDF("id", "t", "k")
    val right = Seq(
      (1L, None, 666.0), // null time: matches nothing
      (1L, Some(ts("2024-01-01 00:00:00")), 10.0),
      (1L, Some(ts("2024-01-03 00:00:00")), 20.0))
      .toDF("k", "pt", "v")
    val want = Map(1L -> Some(10.0), 2L -> Some(20.0), 3L -> None)
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(res(AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v"))) == want)
    assert(res(AsofJoin.asofJoinBucketed(left, right, Seq("k"), "t", "pt", Seq("v"),
      org.apache.spark.sql.functions.date_trunc("DAY", _))) == want)
    assert(res(AsofJoin.asofJoinNative(left, right, Seq("k"), "t", "pt", Seq("v"))) == want)
    assert(res(AsofJoin.asofJoinNativeBucketed(left, right, Seq("k"), "t", "pt", Seq("v"),
      org.apache.spark.sql.functions.date_trunc("DAY", _))) == want)
  }

  test("matched right row is taken whole: nulls inside it are not backfilled (all variants)") {
    // left row at 01-04 matches the 01-03 right row whose v2 is null; the
    // old per-column carry would splice v2=1.5 from the 01-01 row — the
    // struct carry takes the matched row verbatim, like DuckDB ASOF
    val left = Seq((1L, ts("2024-01-04 00:00:00"), 1L)).toDF("id", "t", "k")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(10.0), Some(1.5)),
      (1L, ts("2024-01-03 00:00:00"), Some(20.0), Option.empty[Double]))
      .toDF("k", "pt", "v", "v2")
    val want = Map(1L -> ((Some(20.0), Option.empty[Double])))
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "v2").as[(Long, Option[Double], Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(res(AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v", "v2"))) == want)
    assert(res(AsofJoin.asofJoinBucketed(left, right, Seq("k"), "t", "pt", Seq("v", "v2"),
      org.apache.spark.sql.functions.date_trunc("DAY", _))) == want)
    assert(res(AsofJoin.asofJoinNative(left, right, Seq("k"), "t", "pt", Seq("v", "v2"))) == want)
    assert(res(AsofJoin.asofJoinNativeBucketed(left, right, Seq("k"), "t", "pt", Seq("v", "v2"),
      org.apache.spark.sql.functions.date_trunc("DAY", _))) == want)
  }

  test("bucketed native asof matches the composed variants; merge clusters on (key, bucket)") {
    // low-cardinality key (2 values) — the scenario the bucketed mode is
    // for. Gap days, multi-event days, coincident timestamps, pre-history.
    val left = (1 to 200).map { i =>
      (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:30:00"), i % 2L)
    }.toDF("id", "t", "k")
    val right = (0 to 27).filter(d => d % 3 != 1).map { d =>
      (d % 2L, ts(f"2024-01-${d + 1}%02d 00:00:00"), d * 1.5)
    }.toDF("k", "pt", "v")
    val plain = AsofJoin.asofJoin(left, right, Seq("k"), "t", "pt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    val df = AsofJoin.asofJoinNativeBucketed(left, right, Seq("k"), "t", "pt", Seq("v"),
      org.apache.spark.sql.functions.date_trunc("DAY", _))
    val native = df.select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(native == plain)
    // scale assertion: the merge exec's exchanges hash on BOTH key and
    // bucket with the full partition count — not 2 tasks for 2 keys.
    // (AdaptiveSparkPlanExec is a leaf — unwrap to the final plan.)
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val asof = p.collect { case e: graft.plans.AsofJoinExec => e }
    assert(asof.nonEmpty, p.toString)
    val exec = asof.head
    assert(exec.leftKeys.length == 2, exec.leftKeys)
    val parts = exec.children.map(_.outputPartitioning.numPartitions)
    assert(parts.forall(_ > 2), s"merge tasks per side: $parts")
  }

  test("range join covers sub-second interval ends exactly") {
    // end = boundary + 0.5s: the bucket holding [boundary, end) must be
    // generated — second-truncating bucket math missed it
    val left = Seq(
      (1L, Timestamp.valueOf("2024-01-04 00:00:00.2"), 1L), // in [s, e) tail
      (2L, Timestamp.valueOf("2024-01-04 00:00:00.5"), 1L)) // exactly at e -> no match
      .toDF("id", "t", "k")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), Timestamp.valueOf("2024-01-04 00:00:00.5"), 10.0))
      .toDF("k", "s", "e", "v")
    val got = AsofJoin.rangeJoinBucketed(left, right, Seq("k"), "t", "s", "e", 86400L)
      .select("id", "v").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0))
  }

  test("bucketed asof: seed carries across empty buckets; tie at bucket start matches in-bucket right") {
    val left = Seq(
      (1L, ts("2024-03-10 00:00:00"), 1L), // right row exactly at bucket start -> 7.0, not the seed
      (2L, ts("2024-03-09 12:00:00"), 1L), // empty-bucket gap since 03-01 -> 3.0
      (3L, ts("2024-02-28 00:00:00"), 1L)) // before any right -> null
      .toDF("id", "t", "k")
    val right = Seq(
      (1L, ts("2024-03-01 08:00:00"), 3.0),
      (1L, ts("2024-03-10 00:00:00"), 7.0))
      .toDF("k", "pt", "v")
    val got = AsofJoin.asofJoinBucketed(left, right, Seq("k"), "t", "pt", Seq("v"),
        org.apache.spark.sql.functions.date_trunc("DAY", _))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(7.0), 2L -> Some(3.0), 3L -> None))
  }
}
