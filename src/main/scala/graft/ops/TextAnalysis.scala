package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Tables

/** Text-analysis operators over `documents`: n-gram-profile language ID,
  * quality scoring, token accounting, and content fingerprinting. All
  * ratios are integer-count arithmetic (bit-exact across engines); all
  * shapes are explode → hash-agg — linear in corpus size, no driver-side
  * state.
  */
object TextAnalysis {

  /** Deterministic per-language marker-word profiles (the n-gram-profile
    * heuristic of langid, shrunk to word unigrams over the synthetic
    * vocabulary so every language has live evidence in the fixture data).
    */
  val LANG_PROFILES: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "table", "en" -> "row",
    "fr" -> "query", "fr" -> "scan", "fr" -> "fast", "fr" -> "line",
    "es" -> "value", "es" -> "part", "es" -> "slow", "es" -> "data",
    "de" -> "join", "de" -> "hash", "de" -> "order", "de" -> "batch",
    "zh" -> "spark", "zh" -> "key", "zh" -> "agg", "zh" -> "window")

  private val PROFILE_VALUES: String =
    LANG_PROFILES.map { case (l, w) => s"('$l', '$w')" }.mkString(", ")

  /** Language ID: count marker-word hits per candidate language (broadcast
    * join to the tiny profile table), pick the argmax (hit count desc, then
    * language asc), default 'unknown' when no marker fires.
    */
  def langid(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val profiles = broadcast(LANG_PROFILES.toDF("cand_lang", "word"))
    val hits = Tables.tokens(docs)
      .join(profiles, col("tok") === col("word"))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("cand_lang"))
    val best = hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    docs
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("cand_lang"), lit("unknown")).as("predicted_lang"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  def textLangid(spark: SparkSession, sfDir: String): DataFrame =
    langid(Tables.documents(spark, sfDir))

  val textLangidSql: String =
    s"""WITH ${Tables.TOK_CTE},
       |profiles(cand_lang, word) AS (VALUES $PROFILE_VALUES),
       |hits AS (
       |  SELECT t.doc_id, p.cand_lang, count(*) AS hits
       |  FROM tok t JOIN profiles p ON t.tok = p.word
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY hits DESC, cand_lang) AS rn
       |  FROM hits)
       |SELECT d.doc_id, d.lang,
       |       coalesce(b.cand_lang, 'unknown') AS predicted_lang,
       |       coalesce(b.hits, 0) AS hits
       |FROM documents d
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id""".stripMargin

  /** Quality scoring: token count, type-token ratio, mean token length,
    * short-token ratio, and a composite score — the length/ratio heuristics
    * a pretraining filter runs per document.
    */
  def quality(docs: DataFrame): DataFrame = {
    // All stats computed array-side (higher-order functions inside one
    // codegen'd projection): zero explode, zero shuffle, zero join — the
    // per-document scan cost and nothing else, at any corpus size.
    val stats = docs
      .withColumn("toks", split(col("text"), "\\s+"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_short",
        size(expr("filter(toks, t -> length(t) <= 2)")).cast("long"))
      .withColumn("sum_len",
        expr("aggregate(transform(toks, t -> length(t)), 0L, (acc, v) -> acc + v)"))
    val ttr = col("n_distinct").cast("double") / col("n_tokens").cast("double")
    val shortRatio = col("n_short").cast("double") / col("n_tokens").cast("double")
    stats
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        col("n_distinct"),
        round(ttr, 6).as("ttr"),
        round(col("sum_len").cast("double") / col("n_tokens").cast("double"), 6)
          .as("avg_token_len"),
        round(shortRatio, 6).as("short_ratio"),
        round(ttr * (lit(1.0) - shortRatio), 6).as("quality_score"))
  }

  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    quality(Tables.documents(spark, sfDir))

  val textQualitySql: String =
    s"""WITH ${Tables.TOK_CTE},
       |stats AS (
       |  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
       |         sum(CASE WHEN length(tok) <= 2 THEN 1 ELSE 0 END) AS n_short,
       |         sum(length(tok)) AS sum_len
       |  FROM tok GROUP BY 1)
       |SELECT d.doc_id, d.lang, d.source, s.n_tokens, s.n_distinct,
       |       round(CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE), 6) AS ttr,
       |       round(CAST(s.sum_len AS DOUBLE) / CAST(s.n_tokens AS DOUBLE), 6) AS avg_token_len,
       |       round(CAST(s.n_short AS DOUBLE) / CAST(s.n_tokens AS DOUBLE), 6) AS short_ratio,
       |       round((CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE))
       |             * (1.0 - CAST(s.n_short AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)), 6) AS quality_score
       |FROM documents d JOIN stats s ON d.doc_id = s.doc_id""".stripMargin

  /** Token accounting per (lang, source) corpus slice: documents, whitespace
    * tokens, and a BPE-ish estimate (ceil(chars/4) — the standard
    * chars-per-token approximation when no tokenizer ships with the engine).
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(
      col("lang"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("n_words"),
      ceil(length(col("text")).cast("double") / 4.0).cast("long").as("est_bpe_tokens"))
    perDoc.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        round(avg(col("n_words").cast("double")), 6).as("avg_words"),
        sum(col("est_bpe_tokens")).as("total_est_bpe"))
  }

  def textTokens(spark: SparkSession, sfDir: String): DataFrame =
    tokenStats(Tables.documents(spark, sfDir))

  val textTokensSql: String =
    """WITH per_doc AS (
      |  SELECT lang, source,
      |         len(string_split_regex(text, '\s+')) AS n_words,
      |         CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens
      |  FROM documents)
      |SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_words) AS BIGINT) AS total_words,
      |       round(avg(CAST(n_words AS DOUBLE)), 6) AS avg_words,
      |       CAST(sum(est_bpe_tokens) AS BIGINT) AS total_est_bpe
      |FROM per_doc GROUP BY 1, 2""".stripMargin

  /** Document fingerprinting: (a) a canonical content fingerprint — md5 of
    * the sorted distinct token set (catches shuffled/reordered copies that
    * exact dedup misses); (b) a winnowing-style min-shingle fingerprint —
    * the minimum rolling 3-gram hash, the classic MOSS/rolling-hash sketch.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val content = Tables.tokens(docs)
      .select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("doc_id"))
      .agg(md5(concat_ws(" ", array_sort(collect_list(col("tok"))))).as("content_fp"))
    val minShingle = Tables.shingles(docs)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("shingle"))).as("min_shingle_fp"))
    content.join(minShingle, Seq("doc_id"))
  }

  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    fingerprints(Tables.documents(spark, sfDir))

  /** The full corpus-preparation pipeline, composed from the engine's own
    * operators: exact-dedup survivors (LEFT SEMI on keep ids) minus
    * near-duplicates (LEFT ANTI on the Jaccard pairs' later doc) minus
    * low-quality documents, rolled up per (lang, source). What a user runs
    * before tokenizing a pretraining shard.
    */
  def corpusFilter(docs: DataFrame): DataFrame = {
    val keep = Dedup.exactGroups(docs).select(col("keep_id").as("doc_id"))
    val nearDupLosers = Dedup.ngramJaccardPairs(docs).select(col("d2").as("doc_id")).distinct()
    val q = quality(docs)
    q.join(keep, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .filter(col("quality_score") >= 0.45)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tokens")).as("kept_tokens"))
  }

  def textCorpusFilter(spark: SparkSession, sfDir: String): DataFrame =
    corpusFilter(Tables.documents(spark, sfDir))

  val textCorpusFilterSql: String =
    s"""WITH ${Tables.TOK_CTE},
       |${Tables.SHINGLE_CTE},
       |keep AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |        FROM documents) GROUP BY fp),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS c
       |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |losers AS (
       |  SELECT DISTINCT i.d2 AS doc_id
       |  FROM inter i JOIN sz s1 ON i.d1 = s1.doc_id JOIN sz s2 ON i.d2 = s2.doc_id
       |  WHERE CAST(i.c AS DOUBLE) / CAST(s1.n + s2.n - i.c AS DOUBLE) >= ${Dedup.JACCARD_THRESHOLD}),
       |stats AS (
       |  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
       |         sum(CASE WHEN length(tok) <= 2 THEN 1 ELSE 0 END) AS n_short
       |  FROM tok GROUP BY 1),
       |scored AS (
       |  SELECT d.doc_id, d.lang, d.source, s.n_tokens,
       |         round((CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE))
       |           * (1.0 - CAST(s.n_short AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)), 6) AS score
       |  FROM documents d JOIN stats s ON d.doc_id = s.doc_id)
       |SELECT sc.lang, sc.source, count(*) AS kept_docs, CAST(sum(sc.n_tokens) AS BIGINT) AS kept_tokens
       |FROM scored sc
       |WHERE sc.doc_id IN (SELECT doc_id FROM keep)
       |  AND sc.doc_id NOT IN (SELECT doc_id FROM losers)
       |  AND sc.score >= 0.45
       |GROUP BY 1, 2""".stripMargin

  val textFingerprintSql: String =
    s"""WITH ${Tables.TOK_CTE},
       |${Tables.SHINGLE_CTE},
       |content AS (
       |  SELECT doc_id, md5(string_agg(DISTINCT tok, ' ' ORDER BY tok)) AS content_fp
       |  FROM tok GROUP BY 1),
       |ms AS (
       |  SELECT doc_id, min(md5(shingle)) AS min_shingle_fp
       |  FROM sh GROUP BY 1)
       |SELECT c.doc_id, c.content_fp, ms.min_shingle_fp
       |FROM content c JOIN ms ON c.doc_id = ms.doc_id""".stripMargin
}
