package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ops.TextAnalysis

/** Property-based invariants of the curation operators over randomized
  * corpora: packing offsets are exactly the running sum in doc order at
  * any shard boundary alignment, and mixture sampling never exceeds its
  * rate cap or its stratum.
  */
object CurationProps extends Properties("Curation") {

  // few, larger batches: every property evaluation runs real Spark jobs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genDoc: Gen[(Int, String)] = for {
    words <- Gen.choose(1, 12)
    lang <- Gen.oneOf("en", "de", "es", "fr", "zh")
  } yield (words, lang)

  // sparse, shuffled doc ids spanning several 64-doc shards
  private val genCorpus = for {
    n <- Gen.choose(5, 120)
    docs <- Gen.listOfN(n, genDoc)
    ids <- Gen.pick(n, 0 until 1000)
  } yield ids.toSeq.zip(docs).map { case (id, (words, lang)) =>
    (id.toLong, Seq.fill(words)("w").mkString(" "), lang, "s0")
  }

  property("packing offsets are the exact running sum over sparse ids") =
    forAll(genCorpus) { rows =>
      val df = rows.toDF("doc_id", "text", "lang", "source")
      val got = TextAnalysis.packSequences(df)
        .select("doc_id", "n_tokens", "start_off")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      var expect = 0L
      got.forall { case (_, n, off) =>
        val ok = off == expect
        expect += n
        ok
      }
    }

  property("mix sampling: rate capped at 1.0, sample within its stratum, capped strata fully kept") =
    forAll(genCorpus) { rows =>
      val df = rows.toDF("doc_id", "text", "lang", "source")
      val got = TextAnalysis.mixSample(df)
        .select("lang", "n_docs", "lang_tokens", "rate", "sampled_docs", "sampled_tokens")
        .as[(String, Long, Long, Double, Long, Long)].collect()
      got.forall { case (_, nDocs, langToks, rate, sDocs, sToks) =>
        rate <= 1.0 && sDocs <= nDocs && sToks <= langToks &&
          (rate < 1.0 || (sDocs == nDocs && sToks == langToks))
      }
    }

  property("sharding: token totals conserved, shard ids in range, doc ranges contiguous") =
    forAll(genCorpus) { rows =>
      val df = rows.toDF("doc_id", "text", "lang", "source")
      val shards = TextAnalysis.shardAssignment(df)
        .select("shard_id", "n_docs", "shard_tokens", "min_doc", "max_doc")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      val totalTokens = rows.map(_._2.split("\\s+").length.toLong).sum
      val conserved = shards.map(_._3).sum == totalTokens &&
        shards.map(_._2).sum == rows.length.toLong
      val inRange = shards.forall(s =>
        s._1 >= 0 && s._1 < TextAnalysis.SHARD_COUNT)
      val contiguous = shards.sliding(2).forall {
        case Array(a, b) => a._5 < b._4
        case _ => true
      }
      conserved && inRange && contiguous
    }

  property("entropy: 0 <= H <= ln(n_tokens) + eps, TTR = types/tokens, kernel totals exact") =
    forAll(genCorpus) { rows =>
      // varied tokens so entropy is non-trivial: replace the uniform 'w'
      // filler with a cycling vocabulary, lengths preserved
      val varied = rows.zipWithIndex.map { case ((id, text, lang, src), i) =>
        val n = text.split("\\s+").length
        (id, (0 until n).map(j => s"t${(i + j) % 5}").mkString(" "), lang, src)
      }
      val df = varied.toDF("doc_id", "text", "lang", "source")
      val got = TextAnalysis.lexicalEntropy(df)
        .select("doc_id", "n_tokens", "n_types", "ttr", "entropy_nats")
        .as[(Long, Long, Long, Double, Double)].collect()
      val expected = varied.map { case (id, text, _, _) =>
        id -> text.split("\\s+").length.toLong
      }.toMap
      got.forall { case (id, n, types, ttr, h) =>
        n == expected(id) && types <= n &&
          math.abs(ttr - types.toDouble / n) < 1e-6 &&
          h >= 0.0 && h <= math.log(n.toDouble) + 1e-6
      }
    }
}
