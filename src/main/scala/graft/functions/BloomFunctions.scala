package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registry aliases for Spark's OWN Bloom-filter expressions —
  * `BloomFilterAggregate` (the distributed build: one partial Bloom per
  * partition, OR-merged at the reduce, exactly how Spark's runtime
  * row-group filters are built) and `BloomFilterMightContain` (the
  * codegen'd probe). Spark uses the pair internally for
  * `InjectRuntimeFilter` but does not expose either in the public
  * function registry; aliasing them makes the semi-join-pushdown pattern
  * available to library users as `bloom_agg(h, n_items, n_bits)` /
  * `bloom_might_contain(bf, h)` with zero new expression code — and
  * keeps the probe inside WholeStageCodegen.
  */
object BloomFunctions {

  /** Optimal bit count for an expected item count at a false-positive
    * rate: ⌈−n·ln p / (ln 2)²⌉ (classic Bloom sizing).
    */
  def optimalNumBits(nItems: Long, fpp: Double): Long =
    math.max(64L,
      math.ceil(-(nItems.toDouble * math.log(fpp)) /
        (math.log(2) * math.log(2))).toLong)

  /** Register both aliases; idempotent (see VectorFunctions). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val probe = FunctionIdentifier("bloom_might_contain")
    if (!registry.functionExists(probe)) {
      registry.createOrReplaceTempFunction("bloom_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    }
    val agg = FunctionIdentifier("bloom_agg")
    if (!registry.functionExists(agg)) {
      registry.createOrReplaceTempFunction("bloom_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    }
  }
}
