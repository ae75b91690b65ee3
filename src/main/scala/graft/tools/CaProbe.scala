package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis => TA}
import graft.pipeline.Tables

/** One-off decomposition probe for the corpus_rejections_incremental fit
  * chain: times each standing artifact independently (noop-sink
  * materialization, 2 reps each — rep 2 is the JIT-warmer number).
  */
object CaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    val docs = Tables.documents(spark, sfDir)
    val t = TA.caThreshold(docs)
    val standing = docs.filter(col("doc_id") < t)
    def time(name: String)(f: => DataFrame): Unit =
      (1 to 2).foreach { i =>
        System.gc()
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        println(f"[caprobe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("bench_h") {
      TA.caShingleSets(standing.filter(col("doc_id") % lit(TA.DECONTAM_MOD) === 0))
        .select(explode(col("shs")).as("h")).distinct()
    }
    time("fp_idx") {
      standing.select(Dedup.exactFp(col("text")).as("fp")).distinct()
    }
    time("sets") { TA.caShingleSets(standing) }
    time("postings") {
      TA.caShingleSets(standing).select(col("doc_id"), explode(col("shs")).as("h"))
    }
    time("doc_stats") { TA.caDocStats(standing, TA.caShingleSets(standing).localCheckpoint()) }
    time("ds_decontam") { TA.decontam(standing) }
    time("ds_exact_groups") { Dedup.exactGroups(standing) }
    time("ds_jaccard_pairs") { Dedup.ngramJaccardPairs(standing) }
    time("ds_quality") { TA.quality(standing) }
    time("doc_stats_again") { TA.caDocStats(standing, TA.caShingleSets(standing).localCheckpoint()) }
    spark.stop()
  }
}
