package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.Relational

/** Property-based invariants of the round-10 event operators, over
  * randomized event streams with tiny key domains so every interesting
  * collision (same-user touch chains, organic purchases, split days)
  * actually occurs.
  */
object EventOpsProps extends Properties("EventOps") {

  // few, larger batches: every property evaluation runs real Spark jobs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val TYPES = Vector("view", "click", "signup", "purchase", "error")
  private val TOUCH = Set("view", "click", "signup")

  /** (user, type-index, minute-of-window, cents) rows; ids assigned by
    * position so (ts, event_id) ordering is total and reproducible.
    * Values span NEGATIVE cents too (refunds) so the rounding contract —
    * HALF_UP away from zero, what Spark's `round` and the streaming
    * twin's BigDecimal both do, and what `math.round` (half toward +inf)
    * gets wrong at negative .5 — is exercised on both signs.
    */
  private val genEvents: Gen[List[(Long, Long, String, Timestamp, Double)]] =
    Gen.listOfN(60, for {
      user <- Gen.choose(0L, 4L) // tiny domain -> long per-user chains
      t <- Gen.choose(0, TYPES.size - 1)
      minute <- Gen.choose(0, 3 * 24 * 60 - 1) // three days
      cents <- Gen.choose(-9999, 9999)
    } yield (user, t, minute, cents)).map { rows =>
      rows.zipWithIndex.map { case ((user, t, minute, cents), i) =>
        val ts = Timestamp.valueOf(
          f"2024-01-${minute / (24 * 60) + 1}%02d ${minute / 60 % 24}%02d:${minute % 60}%02d:00")
        (i.toLong, user, TYPES(t), ts, cents / 100.0)
      }
    }

  private def toDF(rows: List[(Long, Long, String, Timestamp, Double)]) =
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")

  /** Sequential reference implementation of last-touch attribution. */
  private def refAttribution(rows: List[(Long, Long, String, Timestamp, Double)])
      : Map[String, (Long, Long)] =
    rows.groupBy(_._2).toList.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._4.getTime, e._1))
      var touch: Option[String] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      ordered.foreach { e =>
        if (e._3 == "purchase")
          // HALF_UP (away from zero) — the product contract; math.round
          // would disagree at negative exact-.5 boundaries
          out += ((touch.getOrElse("none"),
            BigDecimal(e._5 * 100)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue))
        if (TOUCH(e._3)) touch = Some(e._3)
      }
      out
    }.groupBy(_._1).map { case (t, hits) =>
      t -> (hits.size.toLong, hits.map(_._2).sum)
    }

  property("attribution equals the sequential per-user replay") =
    forAll(genEvents) { rows =>
      val got = Relational.attribution(toDF(rows))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      got == refAttribution(rows)
    }

  /** Drives the PRODUCTION partial/merge path
    * ([[Relational.aggIncrementalMerge]]) at a RANDOMIZED watermark: the
    * merged pre/post split must equal a cold single-pass rollup (the
    * degenerate split with an empty delta) at every cut point — days
    * split mid-way genuinely produce two partials for one key.
    */
  property("incremental rollup merge is split-point invariant") =
    forAll(genEvents, Gen.choose(0, 3 * 24 * 60)) { (rows, splitMinute) =>
      import org.apache.spark.sql.functions._
      val df = toDF(rows)
      val wm = Timestamp.valueOf(
        f"2024-01-${splitMinute / (24 * 60) + 1}%02d ${splitMinute / 60 % 24}%02d:${splitMinute % 60}%02d:00")
      val merged = Relational
        .aggIncrementalMerge(df.filter(col("ts") <= lit(wm)), df.filter(col("ts") > lit(wm)))
        .as[(Long, java.sql.Date, Long, Long)].collect().toSet
      val cold = Relational.aggIncrementalMerge(df, df.limit(0))
        .as[(Long, java.sql.Date, Long, Long)].collect().toSet
      merged == cold
    }

  /** The keyed MERGE upsert contract at every random cut point: the
    * post-merge table equals the cold last-state ranking over all
    * events, and re-applying the SAME delta changes nothing
    * (idempotency — the property that makes an at-least-once replay of
    * the merge batch safe).
    */
  property("keyed merge upsert lands on cold state and re-merging is a no-op") =
    forAll(genEvents, Gen.choose(0, 3 * 24 * 60)) { (rows, splitMinute) =>
      import org.apache.spark.sql.functions._
      val df = toDF(rows)
      val wm = Timestamp.valueOf(
        f"2024-01-${splitMinute / (24 * 60) + 1}%02d ${splitMinute / 60 % 24}%02d:${splitMinute % 60}%02d:00")
      val standing = Relational.lastStatePerUser(df.filter(col("ts") <= lit(wm)))
      val delta = Relational.lastStatePerUser(df.filter(col("ts") > lit(wm)))
      val merged = Relational.keyedMergeUpsert(standing, delta, Seq("user_id"))
      def rowsOf(d: org.apache.spark.sql.DataFrame) =
        d.as[(Long, Timestamp, String, Long)].collect().toSet
      val cold = rowsOf(Relational.lastStatePerUser(df))
      val got = rowsOf(merged)
      val again = rowsOf(
        Relational.keyedMergeUpsert(merged, delta, Seq("user_id")))
      got == cold && again == got
    }
}
