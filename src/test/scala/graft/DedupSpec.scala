package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "spark table scan hash join sort merge window agg batch " +
    "stream filter group key value row column line part query"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  test("exact dedup groups normalized copies and keeps min doc_id") {
    val d = docs(
      1L -> "spark table scan",
      2L -> "  SPARK   table SCAN ", // same after normalization
      3L -> "spark table sort")
    val groups = Dedup.exactGroups(d)
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH surfaces a planted near-duplicate and not unrelated docs") {
    val nearDup = base.replaceFirst("window", "vector") // 1-word edit
    val d = docs(
      1L -> base,
      2L -> nearDup,
      3L -> "dup big small fast slow the a customer data order sort key line")
    val pairs = Dedup.minhashPairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("signature is text-determined; exact copies collapse to one rep before pair-gen") {
    val d = docs(1L -> base, 2L -> base)
    // identical text -> identical signature (asserted on the signature table)
    assert(Dedup.signatures(d).drop("doc_id").distinct().count() == 1L)
    // the (1,2) pair is exact dedup's catch, not LSH's: the representative
    // guard leaves nothing for the band join to pair
    assert(Dedup.minhashPairs(d).count() == 0L)
  }

  test("planted 50-copy exact cluster: LSH pair count linear, no quadratic bucket blowup") {
    val nearDup = base.replaceFirst("window", "vector")
    val copies = (10L until 60L).map(i => i -> base)
    val d = docs(Seq(1L -> base, 2L -> nearDup) ++ copies: _*)
    // 51 byte-identical copies collapse to representative doc 1; the band
    // buckets see ONE row per distinct content, so the only candidate pair
    // is (rep, near-dup) — not the 51·50/2 intra-cluster pairs
    val pairs = Dedup.minhashPairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    val spairs = Dedup.simhashPairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(spairs == Set((1L, 2L)))
  }

  test("simhash: identical text -> identical signature; near-dup within small hamming distance") {
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(1L -> base, 2L -> base, 3L -> nearDup)
    val sig = Dedup.simhashSignatures(d)
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(2L))
    val hamming = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    // 1-token edit on a 56-bit sketch (measured 7); an unrelated doc sits ~28
    assert(hamming <= Dedup.SIMHASH_MAX_HAMMING, s"hamming=$hamming")
  }

  test("simhash banded pairs find the near-dup and nothing involving the unrelated doc") {
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(
      1L -> base,
      2L -> nearDup,
      3L -> "dup big small fast slow the a customer data order sort key line")
    val pairs = Dedup.simhashPairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash rung-1 geometry (4x14 + radius-1 probe) returns the exact rung-0 pair set") {
    // the occupancy rung changes candidate GENERATION only — the in-bucket
    // hamming filter makes every rung return the identical pair set, which
    // is what keeps the static DuckDB oracle safe at any corpus size. Run
    // both geometries over the real fixture and demand set equality.
    val d = graft.pipeline.Tables.documents(spark, "/root/testdata/sf0.001")
    val sigs = Dedup.simhashSignatures(Dedup.exactReps(d)).localCheckpoint()
    def pairsAt(blocks: Int, radius: Int) =
      Dedup.bandedHammingPairs(sigs, "doc_id", "simhash",
          Dedup.SIMHASH_BITS, Dedup.SIMHASH_MAX_HAMMING, blocks, radius, ("d1", "d2"))
        .as[(Long, Long, Long)].collect().toSet
    val rung0 = pairsAt(Dedup.SIMHASH_BANDS, 0)
    val rung1 = pairsAt(Dedup.SIMHASH_BANDS / 2, 1)
    assert(rung0.nonEmpty, "fixture must contain at least one simhash near-dup pair")
    assert(rung1 == rung0,
      s"rung-1 must be candidate-complete: missing=${(rung0 -- rung1).take(5)} " +
        s"extra=${(rung1 -- rung0).take(5)}")
  }

  test("rung-2 MIH (2x28, radius-3 cogroup) returns the exact rung-0 pair set") {
    val d = graft.pipeline.Tables.documents(spark, "/root/testdata/sf0.001")
    val sigs = Dedup.simhashSignatures(Dedup.exactReps(d)).localCheckpoint()
    val rung0 = Dedup.bandedHammingPairs(sigs, "doc_id", "simhash",
        Dedup.SIMHASH_BITS, Dedup.SIMHASH_MAX_HAMMING, Dedup.SIMHASH_BANDS, 0,
        ("d1", "d2"))
      .as[(Long, Long, Long)].collect().toSet
    val rung2 = Dedup.mihPairsRung2(sigs, "doc_id", "simhash",
        Dedup.SIMHASH_BITS, Dedup.SIMHASH_MAX_HAMMING, ("d1", "d2"))
      .as[(Long, Long, Long)].collect().toSet
    assert(rung0.nonEmpty)
    assert(rung2 == rung0,
      s"missing=${(rung0 -- rung2).take(5)} extra=${(rung2 -- rung0).take(5)}")
  }

  test("hamming ball: sizes are the binomial sums and members are within radius") {
    for ((bits, r) <- Seq((6, 3), (22, 3), (28, 1), (14, 0))) {
      val v = 0x2AAAAAAL & ((1L << bits) - 1)
      val ball = graft.ops.MihExpansion.ball(v, bits, r)
      val expected = (0 to r).map { i =>
        (0 until i).map(k => (bits - k).toLong).product /
          (1L to math.max(1, i)).product
      }.sum
      assert(ball.length == expected, s"bits=$bits r=$r: ${ball.length} != $expected")
      assert(ball.distinct.length == ball.length, "no duplicate members")
      assert(ball.forall(m => java.lang.Long.bitCount(m ^ v) <= r))
      assert(ball.head == v, "the center comes first")
    }
  }

  test("mihGeometry: pigeonhole-violating rungs are rejected; rung switch at the pin") {
    assert(Dedup.mihGeometry(100L, 8, 7, 1000L) == ((8, 0)))
    assert(Dedup.mihGeometry(1000L, 8, 7, 1000L) == ((4, 1)))
    val sigs = graft.pipeline.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(1).select(col("doc_id"), col("doc_id").as("simhash"))
    intercept[IllegalArgumentException] {
      // 2 blocks at radius 1 only cover hamming <= 3, not 7
      Dedup.bandedHammingPairs(sigs, "doc_id", "simhash", 56, 7, 2, 1, ("d1", "d2"))
    }
  }

  test("ngram jaccard: planted pair above threshold with exact score") {
    // 20 distinct tokens -> 18 shingles; the 1-word edit sits in 3 of them:
    // intersection 15, union 21 -> jaccard = 15/21 ≈ 0.714
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(1L -> base, 2L -> nearDup,
      3L -> "dup big small fast slow the a customer data order sort key line")
    val got = Dedup.ngramJaccardPairs(d)
      .select("d1", "d2", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(math.abs(got.head._3 - 15.0 / 21.0) < 1e-4)
  }

  test("jaccard grouped kernel ≡ the declarative join form, fixture and planted") {
    // the serving construction verifies candidates inside prefix-shingle
    // groups (duplicate co-memberships collapsed by the output distinct);
    // the oracle states the join form — the two must be row-identical
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    val fixture = graft.pipeline.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(diff(Dedup.ngramJaccardPairs(fixture),
      Dedup.ngramJaccardPairsJoin(fixture)) == 0)
    // planted: a near-dup pair whose prefixes share SEVERAL shingles (the
    // multi-group emission the distinct must collapse), plus a length-
    // filtered pair and an unrelated doc
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> base, // 1-2 near, 1-3 exact
      4L -> "dup big small fast slow the a customer data order sort key line",
      5L -> (base + " " + base)) // double-length: length filter territory
    assert(diff(Dedup.ngramJaccardPairs(d), Dedup.ngramJaccardPairsJoin(d)) == 0)
    // and the grouped output has no duplicate (d1, d2) rows
    val g = Dedup.ngramJaccardPairs(d)
    assert(g.count() == g.select("d1", "d2").distinct().count())
  }

  test("jaccard grouped kernel: forced block split ≡ join form (residency cap path)") {
    // split = 1 forces EVERY multi-member prefix group through the
    // block-pair decomposition (the degenerate-prefix residency cap,
    // round-14) at maximum fan-out — the pair set must be bit-identical
    // to the declarative join form, duplicates collapsed
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    def grouped(d: org.apache.spark.sql.DataFrame, split: Int) = {
      val sets = Dedup.jaccardSets(d)
      Dedup.jaccardVerifyGrouped(sets, Dedup.jaccardPrefix(sets), split)
    }
    val fixture = graft.pipeline.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(diff(grouped(fixture, 1), Dedup.ngramJaccardPairsJoin(fixture)) == 0)
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> base,
      4L -> "dup big small fast slow the a customer data order sort key line",
      5L -> (base + " " + base))
    assert(diff(grouped(d, 1), Dedup.ngramJaccardPairsJoin(d)) == 0)
    val g = grouped(d, 1)
    assert(g.count() == g.select("d1", "d2").distinct().count())
  }

  test("substring spans: docs sharing a 10-word run pair up; shorter overlap does not") {
    val run = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"$run alpha beta",
      2L -> s"gamma $run delta",            // shares the 10-word run
      3L -> "one two three four five x y z w q") // only a 5-word overlap
    val pairs = Dedup.substringSpanPairs(d)
      .select("d1", "d2", "n_shared_spans").as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 1L)))
  }

  test("passage scrub: the shared run survives only in its minimum-id holder") {
    val run = "one two three four five six seven eight nine ten"
    val d = docs(
      1L -> s"$run alpha beta",                   // canonical holder: kept whole
      2L -> s"gamma $run delta",                  // copy: the run is redacted
      3L -> "one two three four five x y z w q")  // sub-span overlap only: untouched
    val got = Dedup.passageScrub(d)
      .select("doc_id", "n_tokens", "n_dup_spans", "n_redacted", "clean_fp")
      .as[(Long, Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    def fp(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((1L, 12L, 0L, 0L, fp(s"$run alpha beta"))),
      "the canonical (min-id) holder keeps its copy")
    assert(got(2L) == ((2L, 12L, 1L, 10L, fp("gamma delta"))),
      "the duplicate holder loses exactly the 10-token passage")
    assert(got(3L) == ((3L, 10L, 0L, 0L, fp("one two three four five x y z w q"))),
      "a sub-span-width overlap is not a shared passage")
  }

  test("incremental minhash probes new docs against the prior corpus only") {
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(
      2L -> base, // prior side (even ids)
      4L -> "dup big small fast slow the a customer data order sort key line",
      3L -> nearDup, // new side (odd ids) — near-dup of prior doc 2
      5L -> "completely disjoint vocabulary tokens everywhere nothing shared at all")
    val m = Dedup.incrementalMinhashMatches(
        d.filter($"doc_id" % 2 === 1), d.filter($"doc_id" % 2 === 0))
      .select("new_id", "prior_id").as[(Long, Long)].collect().toSet
    assert(m.contains((3L, 2L)))
    assert(!m.exists(_._1 == 5L), "unrelated new doc must not match")
    assert(m.forall { case (n, p) => n % 2 == 1 && p % 2 == 0 },
      "pairs must be new-side x prior-side only")
  }

  test("containment: a document embedded in a longer one is caught; jaccard misses it") {
    val inner = base.split(" ").slice(4, 12).mkString(" ") // 8 tokens of base
    val d = docs(1L -> base, 2L -> inner,
      3L -> "totally different content with no overlap at all whatsoever in any way")
    val cpairs = Dedup.containmentPairs(d)
      .select("d1", "d2", "containment").as[(Long, Long, Double)].collect().toSet
    // all 6 of doc 2's shingles live in doc 1 -> containment 1.0, one direction
    assert(cpairs == Set((2L, 1L, 1.0)))
    // symmetric jaccard = 6/18 = 0.33 — below threshold, pair invisible
    assert(Dedup.ngramJaccardPairs(d).count() == 0L)
  }

  test("duplicate clusters: transitive near-dups collapse to one component") {
    // 1~2 (one edit, J≈0.714) and 2~3 (two more edits, J=0.5) pair up;
    // 1~3 (three edits, J=0.333) does NOT — doc 3 joins doc 1's cluster
    // only through transitivity
    val d2 = base.replaceFirst("window", "vector")
    val d3 = d2.replaceFirst("scan", "probe").replaceFirst("value", "weight")
    val d = docs(1L -> base, 2L -> d2, 3L -> d3,
      4L -> "totally different content with no overlap at all whatsoever in any way")
    val direct = Dedup.ngramJaccardPairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(direct == Set((1L, 2L), (2L, 3L)), s"pair sanity failed: $direct")
    val m = Dedup.duplicateClusters(d)
      .select("doc_id", "rep_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(m == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 4L, 1L)))
  }

  test("snapshot diff classifies added, removed, changed, and unchanged exactly") {
    val prev = Seq(
      (1L, "alpha text", "s1"), (2L, "beta text", "s1"),
      (3L, "gamma text", "s2")) // 4 missing -> added; 3 dropped -> removed
      .toDF("doc_id", "text", "source")
    val curr = Seq(
      (1L, "alpha text", "s1"),      // unchanged
      (2L, "beta text revised", "s1"), // changed
      (4L, "delta text", "s2"))      // added
      .toDF("doc_id", "text", "source")
    val got = Dedup.snapshotDiff(prev, curr)
      .select("source", "status", "n_docs")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("s1", "unchanged", 1L), ("s1", "changed", 1L),
      ("s2", "added", 1L), ("s2", "removed", 1L)))
  }

  test("connected components: empty pair graph leaves every node a singleton") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    val got = Dedup.connectedComponents(nodes, pairs)
      .select("id", "rep_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)))
  }

  test("connected components: a diameter-7 chain converges to one min-label component") {
    // exercises the multi-round path (seed collapses only diameter 1;
    // path halving + the monotone-sum convergence test do the rest)
    val nodes = (1L to 9L).toDF("id")
    val pairs = (1L to 7L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(nodes, pairs)
      .select("id", "rep_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val expected = (1L to 8L).map(i => (i, 1L, 8L)).toSet + ((9L, 9L, 1L))
    assert(got == expected)
  }

  test("maximal span: longest shared passage length is recovered exactly") {
    val shared = (1 to 20).map(i => s"w$i").mkString(" ") // 20-word passage
    val d = docs(
      1L -> s"alpha beta gamma $shared delta epsilon",
      2L -> s"one two three four five $shared six seven",
      // shares only the 10-word prefix w1..w10 of the passage
      3L -> ((1 to 10).map(i => s"w$i").mkString(" ") +
        " unrelated tail words here again now"),
      4L -> "totally different content with no overlap at all whatsoever in any way")
    val m = Dedup.substringMaximalSpans(d)
      .select("d1", "d2", "max_span_words").as[(Long, Long, Long)]
      .collect().map { case (a, b, l) => (a, b) -> l }.toMap
    assert(m == Map((1L, 2L) -> 20L, (1L, 3L) -> 10L, (2L, 3L) -> 10L))
  }

  test("winnowing: long shared passage guaranteed caught with far fewer fingerprints") {
    val shared = (1 to 20).map(i => s"w$i").mkString(" ") // ≥ SPAN+W−1 = 13 words
    val d = docs(
      1L -> s"alpha beta gamma $shared delta epsilon",
      2L -> s"one two three four five $shared six seven",
      3L -> "totally different content with no overlap at all whatsoever in any way here")
    val pairs = Dedup.winnowPairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // storage guarantee: winnowing keeps a strict subset of the span index
    val nFps = Dedup.winnowFingerprints(d).count()
    val nSpans = d.select(org.apache.spark.sql.functions.expr(
      s"sum(greatest(0, size(split(text, '\\\\s+')) - ${Dedup.SPAN_WORDS - 1}))"))
      .as[Long].collect().head
    assert(nFps < nSpans, s"fingerprints $nFps must undercut spans $nSpans")
  }

  test("embedding near-dup: planted duplicate vector is mutual nearest neighbor with cosine 1") {
    val v1 = Array.tabulate(8)(i => (i + 1).toFloat)
    val v2 = v1.map(_ * 2.0f) // same direction -> cosine 1
    val v3 = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = Seq((1L, v1, 0), (2L, v2, 0), (3L, v3, 0))
      .toDF("vec_id", "embedding", "label")
    val nn = Dedup.embeddingNearDup(emb, dim = 8)
      .select("vec_id", "nn_id", "cosine", "is_near_dup")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(nn(1L)._2 == 2L && nn(1L)._3 == 1.0 && nn(1L)._4)
    assert(nn(2L)._2 == 1L && nn(2L)._4)
    // the unrelated vector either shares no LSH bucket (absent) or is unflagged
    assert(nn.get(3L).forall(!_._4))
  }

  test("cluster-best picks the highest-quality member, not the min-id representative") {
    import spark.implicits._
    val clean = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val docs = Seq(
      (0L, clean + " alpha10 alpha10", "en", "s0"), // repetitive copy: ttr 10/12
      (1L, clean, "en", "s0"),                      // clean copy: ttr 1.0
      (2L, (1 to 5).map(i => s"beta$i").mkString(" "), "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Dedup.clusterBest(docs)
      .as[(Long, Long, Double, Long)].collect().map(t => t._1 -> t).toMap
    // docs 0 and 1 share 8 of 10 shingles (jaccard 0.8) -> one cluster,
    // rep = 0 but best member = 1 (quality 1.0 beats 10/12)
    assert(got(0L) == ((0L, 1L, 1.0, 2L)))
    assert(got(2L)._2 == 2L && got(2L)._4 == 1L)
  }

  test("lsh quality: planted near-dup lands in candidates, truth, and hits") {
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(
      1L -> base,
      2L -> nearDup,
      3L -> "dup big small fast slow the a customer data order sort key line")
    val row = Dedup.lshQuality(d).collect().head
    val (nc, nt, nh) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // only (1,2) clears the exact-jaccard bar, the LSH bands retrieve it,
    // and the unrelated doc contributes no false candidate
    assert(nt == 1L && nc == 1L && nh == 1L)
    assert(row.getDouble(3) == 1.0 && row.getDouble(4) == 1.0)
  }

  test("emb lsh quality: accounting holds and recall is monotone in the threshold") {
    val rows = Dedup.embLshQuality(spark, "/root/testdata/sf0.001")
      .orderBy(org.apache.spark.sql.functions.col("tau_pct")).collect()
    assert(rows.length == 2)
    val byTau = rows.map(r => r.getLong(r.fieldIndex("tau_pct")) ->
      ((r.getLong(r.fieldIndex("n_truth")), r.getLong(r.fieldIndex("n_hits")),
        r.getDouble(r.fieldIndex("recall"))))).toMap
    byTau.foreach { case (tau, (nt, nh, rec)) =>
      assert(nt > 0, s"threshold $tau must gate a populated regime, not a vacuous zero")
      assert(nh <= nt, "hits are a subset of truth")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // closer pairs agree on more sign planes — recall must not fall with tau
    assert(byTau(40L)._3 >= byTau(30L)._3,
      s"recall at the tighter threshold must dominate: $byTau")
  }

  test("minhash estimate: per-pair agreement fraction tracks the exact jaccard") {
    val nearDup = base.replaceFirst("window", "vector")
    val d = docs(1L -> base, 2L -> nearDup)
    val rows = Dedup.minhashEstimates(d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    val nAgree = r.getLong(3)
    val est = r.getDouble(4)
    val j = r.getDouble(5)
    val err = r.getDouble(6)
    // 20 words, 1 edit: 15 of 21 distinct shingles shared
    assert(j == 0.714286)
    assert(math.abs(est - nAgree.toDouble / Dedup.NUM_HASHES) < 1e-6)
    assert(math.abs(err - math.abs(est - j)) < 1.1e-6)
    assert(nAgree >= 1 && nAgree <= Dedup.NUM_HASHES)
  }

  test("knn graph: planted twin ranks first; ranks dense from 1; k bounds each list") {
    val v1 = Array.tabulate(8)(i => (i + 1).toFloat)
    val emb = Seq(
      (1L, v1, 0), (2L, v1.map(_ * 2.0f), 0), // twins, cosine 1
      (3L, v1.map(_ + 0.5f), 0),              // close
      (4L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val g = Dedup.knnGraph(emb, k = 2, dim = 8)
      .select("vec_id", "nn_id", "cosine", "rn")
      .as[(Long, Long, Double, Int)].collect()
    val byVec = g.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // each twin's rank-1 neighbor is the other twin at cosine 1
    assert(byVec(1L).head._2 == 2L && byVec(1L).head._3 == 1.0)
    assert(byVec(2L).head._2 == 1L && byVec(2L).head._3 == 1.0)
    // list length <= k, ranks dense from 1, cosine non-increasing
    byVec.values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_._4).toSeq == (1 to rows.length))
      assert(rows.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      })
    }
  }

  test("knn grouped kernel ≡ the declarative join form, fixture and planted") {
    // the serving construction computes candidates in the bucket-grouped
    // primitive kernel with the per-bucket top-k cut; the oracle states
    // the join form — the two must be row-identical
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    val emb = graft.pipeline.Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(diff(Dedup.knnGraph(emb), Dedup.knnGraphJoin(emb)) == 0)
    // and at the NN-descent serving degree (a different k cut)
    assert(diff(Dedup.knnGraph(emb, k = 12), Dedup.knnGraphJoin(emb, k = 12)) == 0)
  }

  test("cluster entry points share one memoized assignment per (session, dir)") {
    val dir = "/root/testdata/sf0.001"
    // the memo returns the SAME checkpointed frame on every hit…
    assert(Dedup.dedupClusters(spark, dir) eq Dedup.dedupClusters(spark, dir))
    // …and it is value-identical to an unshared end-to-end recomputation
    val shared = Dedup.dedupClusters(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val fresh = Dedup.duplicateClusters(
      graft.pipeline.Tables.documents(spark, dir))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(shared.sameElements(fresh))
  }

  test("incremental clusters: batch-append equals full recompute when nothing bridges") {
    val textX = base
    val textY = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textZ = "one two three four five six seven eight nine ten"
    val textW = "red green blue cyan magenta yellow black white grey pink"
    val d = docs(2L -> textX, 4L -> textX, 6L -> textY, // standing (even)
      3L -> textX, 5L -> textZ, 7L -> textW, 9L -> textW) // arriving (odd)
    val prior = d.filter("doc_id % 2 = 0")
    val inc = Dedup.incrementalClusters(d.filter("doc_id % 2 = 1"), prior,
      Dedup.duplicateClusters(prior))
    // identical copies make every qualifying pair a certain band candidate,
    // so the incremental assignment coincides with the batch fixpoint
    val got = inc.select("doc_id", "rep_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    val full = Dedup.duplicateClusters(d)
      .select("doc_id", "rep_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == full)
    val origins = inc.select("doc_id", "origin").as[(Long, String)].collect().toMap
    assert(origins == Map(2L -> "standing", 4L -> "standing", 6L -> "standing",
      3L -> "joined", 5L -> "new", 7L -> "new", 9L -> "new"))
  }

  test("incremental clusters: a bridging arrival joins the min rep, never merges standing") {
    // offline-tuned fixture (deterministic md5 signatures): A and B are two
    // standing clusters with J(A,B)=0.318 < t — band candidates, rejected by
    // exact verification; the bridge doc is a verified near-dup of BOTH
    // (J=0.589 / 0.547) and band-matches both
    val aTail = (0 until 30).map(k => s"aa1x$k").mkString(" ")
    val zTail = (0 until 30).map(k => s"zz1w$k").mkString(" ")
    val zHalf = (15 until 30).map(k => s"zz1w$k").mkString(" ")
    val a30 = base + " index plan stage task node core disk memory cache block"
    val textA = s"$a30 $aTail"
    val textB = s"$a30 $zTail"
    val bridge = s"$a30 " + (0 until 15).map(k => s"aa1x$k").mkString(" ") + s" $zHalf"
    val d = docs(2L -> textA, 4L -> textA, 8L -> textB, 10L -> textB,
      11L -> bridge)
    val prior = d.filter("doc_id % 2 = 0")
    val priorClusters = Dedup.duplicateClusters(prior)
    // premise: two distinct standing clusters
    assert(priorClusters.select("rep_id").distinct().count() == 2L)
    val inc = Dedup.incrementalClusters(d.filter("doc_id % 2 = 1"), prior, priorClusters)
      .select("doc_id", "rep_id", "cluster_size", "origin")
      .as[(Long, Long, Long, String)].collect().toSet
    // the bridge joins the MIN matched rep (2); cluster B keeps rep 8 and
    // its size — standing clusters are never merged incrementally (the
    // merge belongs to the next full recompute, asserted below)
    assert(inc == Set(
      (2L, 2L, 3L, "standing"), (4L, 2L, 3L, "standing"),
      (8L, 8L, 2L, "standing"), (10L, 8L, 2L, "standing"),
      (11L, 2L, 3L, "joined")))
    val full = Dedup.duplicateClusters(d).select("rep_id").distinct()
    assert(full.count() == 1L, "batch CC would merge everything through the bridge")
  }

  test("source dup stats: near-dup pair counts against its source, clean source reports 0") {
    val nearDup = base.replaceFirst("window", "vector")
    val d = Seq(
      (1L, base, "sA"),
      (2L, nearDup, "sA"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "sA"),
      (4L, "one two three four five six seven eight nine ten", "sB"),
      (5L, "red green blue cyan magenta yellow black white grey pink", "sB"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceDupStats(d)
      .select("source", "n_docs", "n_clusters", "n_dup_docs", "dup_rate")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("sA") == (("sA", 3L, 2L, 1L, 0.333333)))
    assert(got("sB") == (("sB", 2L, 2L, 0L, 0.0)))
  }
}
