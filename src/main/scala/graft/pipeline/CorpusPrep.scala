package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Deployment entry point for the LLM-data side — the composed
  * corpus-preparation job a user runs before tokenizing a pretraining
  * shard, with a real partitioned sink (the reference side's analogue is
  * [[PipelineRunner]]/RunPipeline):
  *
  *  1. exact dedup — keep each group's representative
  *  2. near-dup removal — drop Jaccard losers (later doc of each pair)
  *  3. quality gate — heuristic score ≥ `minQuality`
  *  4. repetition gate — Gopher dup-3-gram keep flag
  *  5. PII scrub columns joined on (count + scrubbed fingerprint)
  *
  * Output: `docs/` parquet partitioned by `lang` (partition pruning for
  * per-language consumers) + a 1-row-per-(lang, source) `stats/` summary.
  * Deterministic, so rerunning overwrites byte-identical content —
  * idempotent by construction rather than by probe.
  */
object CorpusPrep {

  val MIN_QUALITY = 0.45

  /** The kept, scrubbed corpus — pure function of the input table. */
  def prepared(docs: DataFrame): DataFrame = {
    val keep = Dedup.exactGroups(docs).select(col("keep_id").as("doc_id"))
    val losers = Dedup.ngramJaccardPairs(docs).select(col("d2").as("doc_id")).distinct()
    val rep = TextAnalysis.repetitionStats(docs)
      .filter(col("keep")).select(col("doc_id"))
    val pii = TextAnalysis.piiScrub(docs)
      .select(col("doc_id"), col("n_emails"), col("n_long_numbers"), col("scrubbed_fp"))
    TextAnalysis.quality(docs)
      .filter(col("quality_score") >= MIN_QUALITY)
      .join(keep, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
      .join(rep, Seq("doc_id"), "left_semi")
      .join(pii, Seq("doc_id"))
  }

  /** Runs the job: writes `outDir/docs` (partitioned by lang) and
    * `outDir/stats`; returns (kept docs, kept tokens).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): (Long, Long) = {
    val out = prepared(Tables.documents(spark, sfDir)).localCheckpoint()
    out.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/docs")
    val stats = out.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tokens")).as("kept_tokens"))
    stats.write.mode("overwrite").parquet(s"$outDir/stats")
    val t = out.agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L)))
      .collect().head
    (t.getLong(0), t.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (docs, toks) = run(spark, sfDir, outDir)
    println(s"[corpusprep] kept $docs docs / $toks tokens -> $outDir")
    spark.stop()
  }
}
