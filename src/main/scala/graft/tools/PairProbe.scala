package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** SCALING.md probe for the AllPairs candidate generator
  * ([[graft.ops.Dedup.ngramJaccardPairs]]): counts, per rehearsal
  * corpus, the prefix-join CANDIDATE pairs (pre-verification), the
  * verified pairs, and the verification bytes in flight (candidates ×
  * both shingle-array widths) — the numbers that separate "the
  * generator went super-linear" from "the box ran out of memory doing
  * linearly more work".
  *
  * Usage: runMain graft.tools.PairProbe <sfDir>
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.ArrayFunctions.register(spark)
    graft.functions.TextFunctions.register(spark)
    val jt = graft.ops.Dedup.JACCARD_THRESHOLD
    val docs = Tables.documents(spark, sfDir)
    val sets = docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr("shingle_hashes(toks)").as("shs"))
      .withColumn("n", size(col("shs")).cast("long"))
      .localCheckpoint()
    val sh = sets.select(col("doc_id"), col("n"), explode(col("shs")).as("h"))
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfreq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ranked"))
      .select(col("doc_id"), explode(expr(
        s"slice(ranked, 1, CAST(size(ranked) - ceil($jt * size(ranked)) + 1 AS INT))")).as("r"))
      .select(col("doc_id"), col("r.h").as("h"))
      .localCheckpoint()
    val nDocs = sets.count()
    val nPrefixRows = prefix.count()
    val cands = prefix.select(col("h"), col("doc_id").as("d1"))
      .join(prefix.select(col("h"), col("doc_id").as("d2")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
      .localCheckpoint()
    val nCands = cands.count()
    val withLens = cands
      .join(sets.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .localCheckpoint()
    val verifyBytes = withLens
      .agg(sum((col("n1") + col("n2")) * 8L)).head.getLong(0)
    val banded = withLens
      .filter(col("n1") * jt <= col("n2") && col("n2") * jt <= col("n1"))
    val nBanded = banded.count()
    val bandedBytes = banded
      .agg(sum((col("n1") + col("n2")) * 8L)).head.getLong(0)
    println(s"""{"sfDir":"$sfDir","docs":$nDocs,"prefix_rows":$nPrefixRows,""" +
      s""""candidates":$nCands,"verify_bytes":$verifyBytes,""" +
      s""""length_band_survivors":$nBanded,"banded_bytes":$bandedBytes}""")
    // A/B of the verify stage: the candidate-join form (both arrays per
    // candidate through the shuffle) vs the prefix-grouped kernel (one
    // array per prefix row) — plus the output-identity check
    if (sys.env.contains("SPARK_GRAFT_PROBE_VERIFY")) {
      def time(tag: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $tag=$r wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      time("verify_join")(graft.ops.Dedup.jaccardVerifyJoin(sets, prefix).count())
      time("verify_grouped")(graft.ops.Dedup.jaccardVerifyGrouped(sets, prefix).count())
      val a = graft.ops.Dedup.jaccardVerifyJoin(sets, prefix)
      val b = graft.ops.Dedup.jaccardVerifyGrouped(sets, prefix)
      time("verify_diff")(a.exceptAll(b).count() + b.exceptAll(a).count())
    }
    spark.stop()
  }
}
