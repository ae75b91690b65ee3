package graft

import graft.ops.SharedFits

/** Regression spec for the memo's re-entrancy: a producer that memoizes a
  * sub-artifact mid-compute (the cluster assignment memoizes the Jaccard
  * pair frame) must not crash. The old computeIfAbsent implementation
  * threw "IllegalStateException: Recursive update" whenever the nested
  * insert hashed into the same bin — hash-layout dependent, so it
  * surfaced only intermittently (first seen in a round-9 verify run,
  * green the whole round before).
  */
class SharedFitsSpec extends SparkSpec {

  test("memo is re-entrant: a producer may memo sub-artifacts mid-compute") {
    SharedFits.clear(spark)
    var computes = 0
    // enough nested keys that at least one collides with the outer bin
    // under any table layout — the old impl crashes here
    def nested(i: Int): String = SharedFits.memo(spark, s"sub_$i") { computes += 1; s"v$i" }
    val outer = SharedFits.memo(spark, "outer") {
      (0 until 64).map(nested).mkString(",")
    }
    assert(outer == (0 until 64).map(i => s"v$i").mkString(","))
    assert(computes == 64)
    // all nested artifacts are cached: re-access recomputes nothing
    (0 until 64).foreach(nested)
    assert(computes == 64)
    assert(SharedFits.memo(spark, "outer")("WRONG") == outer)
    SharedFits.clear(spark)
  }
}
