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
}
