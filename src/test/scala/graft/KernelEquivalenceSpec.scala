package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.pipeline.Tables

/** The single-pass kernels (simhash56, minhash_sig, ngram_stats,
  * shingle_hashes) replaced exploded/aggregated formulations for speed —
  * these tests pin the REPLACEMENT EQUIVALENCE on randomized corpora
  * (seeded, deterministic) that include the edge shapes the fixture never
  * hits: sub-3-token docs, heavy repetition, unicode tokens, long docs.
  * Each test runs the kernel query against the original declarative
  * formulation rebuilt inline and asserts identical results.
  */
class KernelEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "table", "scan", "join", "straße",
    "héllo", "merge", "window", "agg", "κόσμος", "stream", "filter")

  /** Deterministic pseudo-random corpus: lengths 0..39 tokens, words drawn
    * from a 12-word vocabulary (dense shingle collisions), seeded.
    */
  private def randDocs(seed: Long, n: Int = 60): DataFrame = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      val len = rng.nextInt(40)
      (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("simhash56 kernel == exploded 56-column vote aggregation") {
    val docs = randDocs(11)
    val kernel = Dedup.simhashSignatures(docs)
      .as[(Long, Long)].collect().toMap
    val hashed = Tables.shingles(docs).select(
      col("doc_id"),
      conv(substring(md5(col("shingle")), 1, Dedup.SIMHASH_BITS / 4), 16, 10)
        .cast("long").as("h"))
    val votes = hashed.groupBy(col("doc_id")).agg(
      count(lit(1)).as("cnt"),
      (0 until Dedup.SIMHASH_BITS).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"c$b")): _*)
    val sig = (0 until Dedup.SIMHASH_BITS)
      .map(b => when(col(s"c$b") * 2 > col("cnt"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val exploded = votes.select(col("doc_id"), sig.cast("long").as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(kernel == exploded)
  }

  test("minhash_sig kernel == exploded K-M min aggregation") {
    val docs = randDocs(22)
    val kernel = Dedup.signatures(docs)
      .collect().map(r => r.getLong(0) -> (1 to Dedup.NUM_HASHES).map(r.getLong).toSeq)
      .toMap
    val hashed = Tables.shingles(docs).select(
      col("doc_id"),
      conv(substring(md5(col("shingle")), 1, 14), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("shingle")), 15, 14), 16, 10).cast("long").as("h2"))
    val exploded = hashed.groupBy(col("doc_id")).agg(
      min(expr(s"(h1 + 0 * h2) & ${Dedup.MINHASH_MASK}")).as("mh0"),
      (1 until Dedup.NUM_HASHES).map(h =>
        min(expr(s"(h1 + $h * h2) & ${Dedup.MINHASH_MASK}")).as(s"mh$h")): _*)
      .collect().map(r => r.getLong(0) -> (1 to Dedup.NUM_HASHES).map(r.getLong).toSeq)
      .toMap
    assert(kernel == exploded)
  }

  test("ngram_stats kernel == exploded multiset count aggregation") {
    val docs = randDocs(33)
    val kernel = graft.ops.TextAnalysis.repetitionStats(docs)
      .select("doc_id", "total_3grams", "distinct_3grams", "top_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    val exploded = Tables.rawShingles(docs)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total_3grams"), count(lit(1)).as("distinct_3grams"),
        max(col("c")).as("top_count"))
      .select(col("doc_id"), col("total_3grams"), col("distinct_3grams"),
        round(col("top_count").cast("double") / col("total_3grams").cast("double"), 6)
          .as("top_ratio"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(kernel == exploded)
  }

  test("tok_entropy kernel == exploded term-frequency aggregation") {
    val docs = randDocs(33).filter(length(col("text")) > 0)
    val kernel = graft.ops.TextAnalysis.lexicalEntropy(docs)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    val exploded = Tables.tokens(docs)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("sum_clnc"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6).as("ttr"),
        round(log(col("n_tokens").cast("double")) -
          col("sum_clnc") / col("n_tokens").cast("double"), 6).as("entropy_nats"))
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(kernel == exploded)
  }

  test("jaccard pairs over shingle_hashes sets == naive string inverted-index join") {
    val docs = randDocs(44, n = 40)
    val kernel = Dedup.ngramJaccardPairs(docs)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val sh = Tables.shingles(docs)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    val jacc = col("c").cast("double") / (col("n1") + col("n2") - col("c")).cast("double")
    val naive = inter
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .filter(jacc >= Dedup.JACCARD_THRESHOLD)
      .select(col("d1"), col("d2"), round(jacc, 6).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(kernel == naive)
  }
}
