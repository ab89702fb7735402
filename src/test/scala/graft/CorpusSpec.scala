package graft

import graft.ops.{Corpus, Text}
import org.apache.spark.sql.functions._

/** Round-4 corpus-curation operators: Gopher-style repetition
  * filters, benchmark decontamination, vocabulary truncation,
  * temperature mixing, inverted index. Fixtures are hand-computed;
  * the harness corpus paths are oracle-checked by the driver. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))

  test("dsir weights: target-vocab docs score positive, off-target negative, smoothing exact") {
    // target source "src0" speaks {qa qb qc}; the raw majority speaks
    // {ra rb rc}. A doc written in target vocabulary must get
    // logw > 0 (resembles the target more than the raw mix), an
    // off-target doc logw < 0, regardless of which source it sits in.
    // docs must be big enough that the +1/+B smoothing doesn't drown
    // the signal (B=256 sits in every denominator)
    // vocab chosen collision-free under charHash mod 256: qa/qb/qc →
    // buckets 16/17/18, ra/rb/rc → 47/48/49 (aa vs yy would collide!)
    val tgt = Seq.fill(10)("qa qb qc").mkString(" ")
    val raw = Seq.fill(10)("ra rb rc").mkString(" ")
    val corpus = Seq(
      (1L, tgt, "src0"),
      (2L, tgt, "src0"),
      (3L, raw, "src1"),
      (4L, raw, "src1"),
      (5L, raw, "src1"),
      (6L, "qa qb qc", "src1"), // target-like text in a raw source
      (7L, "ra rb rc", "src0")  // raw-like text in the target source
    ).toDF("doc_id", "text", "source")
    val got = Corpus.dsirWeights(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(6)._1 == 3)
    assert(got(6)._2 > 0 && got(6)._3, s"target-vocab doc must keep: ${got(6)}")
    assert(got(7)._2 < 0 && !got(7)._3, s"raw-vocab doc must drop: ${got(7)}")
    // weights depend only on text, not on the doc's own source
    assert(got(1)._2 > 0 && got(3)._2 < 0)
    assert(math.abs(got(1)._2 - 10 * got(6)._2) < 1e-2,
      s"log-weights are additive per token: 10x the tokens, 10x the weight: ${got(1)} vs ${got(6)}")
  }

  test("curriculum: batches cut at 32, difficulty monotone within each source") {
    val cur = Corpus.curriculum(Tables.documents(spark, sf0001)).collect()
    assert(cur.nonEmpty)
    cur.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // all batches full except possibly the last
      sorted.init.foreach(r => assert(r.getLong(2) == 32L, s"$src: $r"))
      assert(sorted.last.getLong(2) <= 32L)
      // easy → hard: batch b's max difficulty ≤ batch b+1's min
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) <= b.getLong(3), s"$src: $a then $b")
        case _ =>
      }
    }
  }

  test("curriculum difficulty proxy is exact integer millis") {
    val d = docs(1L -> "abc de", 2L -> "a b c d")
    // doc 1: 6 chars, 2 tokens → 3000; doc 2: 7 chars, 4 tokens → 1750
    val got = Corpus.curriculum(
        d.withColumn("n_chars", length(col("text"))), batchSize = 1)
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(5)))).toMap
    assert(got(0L) == ((1750L, 4L)), got.toString) // easier doc batches first
    assert(got(1L) == ((3000L, 2L)), got.toString)
  }

  test("repetition profile matches hand computation") {
    // "a a a b": 4 words, 2 distinct -> dup 0.5; top word a=3/4;
    // bigrams [a a, a a, a b]: top 2/3
    val got = Corpus.repetitionProfile(docs(1L -> "a a a b")).collect().head
    assert(got.getInt(1) == 4)
    assert(got.getDouble(2) == 0.5)
    assert(got.getDouble(3) == 0.75)
    assert(got.getDouble(4) == 0.666667)
    assert(got.getBoolean(5)) // top_word_frac 0.75 > 0.2
  }

  test("native array_top_count is bit-identical to the HOF rendering") {
    // same contract class as portable_hash vs charHashHof: the codegen
    // expression must agree with the interpreted HOF specification on
    // arbitrary token arrays, including empty (both NULL)
    import graft.functions.ArrayTopCount.arrayTopCount
    val rnd = new scala.util.Random(14)
    val rows = (1 to 200).map { _ =>
      val n = rnd.nextInt(30)
      Tuple1((1 to n).map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    } :+ Tuple1("")
    val ws = split(col("_1"), " ")
    val got = rows.toDF("_1")
      .select(arrayTopCount(ws).as("native"), Corpus.topCountHof(ws).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), r.toString)
    }
  }

  test("single-word doc yields empty bigram stats, no runtime error") {
    val got = Corpus.repetitionProfile(docs(1L -> "solo")).collect().head
    assert(got.getInt(1) == 1 && got.isNullAt(4))
    assert(got.getBoolean(5)) // top_word_frac = 1.0 flags it
  }

  test("decontamination finds planted benchmark overlap, skips disjoint docs") {
    val bench = "q w e r t y u i"          // doc_id 7 -> benchmark slice
    val copy = "z x " + bench              // shares 5-grams with bench
    val clean = "k l m n o p a b c"        // disjoint vocabulary
    val got = Corpus.decontaminate(docs(7L -> bench, 8L -> copy, 9L -> clean))
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(3))).toMap
    assert(got(8L)._1 == 4 && got(8L)._2, s"copy shares 4 of bench's 5-grams: $got")
    assert(got(9L)._1 == 0 && !got(9L)._2)
    assert(!got.contains(7L)) // benchmark docs are not scored
  }

  test("vocab mask: in-vocab words survive, OOV become <unk>, order kept") {
    // 21 distinct words: w1..w20 appear twice (in vocab), 'rare' once
    val common = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> s"$common rare $common")
    val got = Corpus.vocabMask(d).collect().head
    assert(got.getInt(1) == 41 && got.getInt(2) == 1)
    assert(got.getString(4) == s"$common <unk> $common")
  }

  test("vocab mask unk positions reconstruct against the original") {
    val d = Tables.documents(spark, sf0001).limit(50)
    val masked = Corpus.vocabMask(d).select("doc_id", "masked_text")
    val joined = d.join(masked, "doc_id")
      .select(split(col("text"), " ").as("ws"), split(col("masked_text"), " ").as("ms"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val ws = r.getSeq[String](0); val ms = r.getSeq[String](1)
      assert(ws.length == ms.length)
      ws.zip(ms).foreach { case (w, m) => assert(m == w || m == "<unk>") }
    }
  }

  test("temperature mixing keeps the whole smallest language; rates derive from counts") {
    val d = Tables.documents(spark, sf0001)
    val kept = Corpus.sampleTemperature(d)
    val rates = kept.select("lang", "keep_permille").distinct()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val counts = d.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy { case (l, n) => (n, l) }._1
    assert(rates(minLang) == 1000, s"smallest language keeps everything: $rates")
    val nMin = counts(counts.keys.minBy(counts)).toDouble
    counts.foreach { case (l, n) =>
      val expect = math.floor(math.sqrt(nMin / n) * 1000).toInt
      assert(!rates.contains(l) || rates(l) == expect, s"$l: ${rates.get(l)} vs $expect")
    }
  }

  test("temperature mixing draw is partition-count invariant") {
    val d = Tables.documents(spark, sf0001)
    val a = Corpus.sampleTemperature(d).select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = Corpus.sampleTemperature(d.repartition(13)).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("epoch mixing: majority lang keeps exactly 1 epoch, minorities equalize") {
    val docs = Tables.documents(spark, sf0001)
    val mixed = Corpus.mixEpochs(docs)
    val perLang = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMax = orig.values.max
    // the majority language's permille is exactly 1000 → one copy each
    val majority = orig.maxBy(_._2)._1
    assert(perLang(majority) == nMax)
    // every minority upsamples to within 5% of the majority (integer
    // permille truncation + the Bernoulli draw's key-hash realization)
    perLang.foreach { case (l, n) =>
      assert(math.abs(n.toDouble / nMax - 1.0) < 0.05, s"$l: $n vs $nMax")
    }
    // replication is per-doc contiguous epochs starting at 1
    val bad = mixed.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("epoch").as("lo"), max("epoch").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(bad == 0, "epochs must be 1..copies per doc")
  }

  test("incremental dedup: exact delta copy hits all bands, novel doc hits none") {
    // ids: 1 -> history (1 % 10 < 8), 18/19 -> delta batch
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val novel = (1 to 12).map(i => s"x$i").mkString(" ")
    val got = Corpus.dedupIncremental(docs(1L -> base, 18L -> base, 19L -> novel))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((18L, 8, true, true), (19L, 0, false, false)), got.toSeq)
  }

  test("incremental dedup on the harness corpus: planted near-dups straddle the split") {
    val got = Corpus.dedupIncremental(Tables.documents(spark, sf0001)).collect()
    assert(got.exists(_.getInt(1) > 0), "some delta doc must collide with history bands")
    // identical text implies identical minhash bands: exact => all 8 bands hit
    got.filter(_.getBoolean(2)).foreach(r => assert(r.getInt(1) == 8, r))
  }

  test("sequence packing: contiguous bins per source, capacity-aligned, exhaustive") {
    val got = Corpus.packSequences(Tables.documents(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      // bins are non-decreasing in doc order and start at 0
      assert(ordered.head._4 == 0)
      assert(ordered.sliding(2).forall { case Array(a, b) => b._4 >= a._4; case _ => true })
      // bin = exclusive running total / capacity, recomputed independently
      var cum = 0L
      ordered.foreach { case (_, _, n, bin) =>
        assert(bin == (cum / 128).toInt, s"doc at cum=$cum tokens -> bin $bin")
        cum += n
      }
    }
  }

  test("split: fractions sum to 1 per source, buckets re-derive, no split is empty") {
    val docs = Tables.documents(spark, sf0001)
    val rows = Corpus.splitAssign(docs).collect()
    assert(rows.map(_.getString(0)).distinct.sorted.sameElements(Array("test", "train", "val")),
      "the mod-prime mix must land every source across all three splits " +
        "(a straight LCG mod 100 aliases against source = doc_id mod 20)")
    // per-source fractions sum to 1 (within the 1e-6 rounding grain)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val tot = rs.map(_.getDouble(5)).sum
      assert(math.abs(tot - 1.0) < 3e-6, s"$src fractions sum to $tot")
    }
    // the checksum column re-derives from membership alone: recompute
    // the train checksum for one source by hand from the raw table
    val ids = docs.select("doc_id", "source").collect()
      .filter(_.getString(1) == "src0").map(_.getLong(0))
    val buckets = ids.map(id => ((id * 2654435761L + 12345L) % 1000003L) % 100)
    val want = buckets.filter(_ < 80).sum
    val got = rows.find(r => r.getString(0) == "train" && r.getString(1) == "src0")
      .get.getLong(4)
    assert(got == want, s"train/src0 checksum $got != re-derived $want")
  }

  test("inverted index agrees with wordcount and its own postings") {
    val idx = Corpus.invertedIndex(Tables.documents(spark, sf0001)).collect()
    val wc = Text.wordcount(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(idx.nonEmpty && idx.length == wc.size)
    idx.foreach { r =>
      val word = r.getString(0); val df = r.getLong(1)
      val postings = r.getString(2).split(",").map(_.toLong)
      assert(df == wc(word), s"$word df != wordcount n_docs")
      assert(postings.length == df && postings.sameElements(postings.sorted))
      assert(postings.distinct.length == postings.length)
    }
  }

  test("per-group sample: exactly k per source, hash-ranked, stable across runs") {
    val a = Corpus.samplePerGroup(Tables.documents(spark, sf0001), k = 10).collect()
    val bySource = a.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length == 10), "every source draws exactly k")
    bySource.values.foreach { rows =>
      val ranked = rows.sortBy(_.getInt(4))
      assert(ranked.map(_.getInt(4)).toSeq == (1 to 10), "ranks dense 1..k")
      // ranks follow the (hkey, doc_id) total order
      val keys = ranked.map(r => (r.getLong(3), r.getLong(0))).toSeq
      assert(keys == keys.sorted, s"rank order must follow (hkey, doc_id): $keys")
    }
    // deterministic: an independent second run draws the identical slice
    val b = Corpus.samplePerGroup(Tables.documents(spark, sf0001), k = 10).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    // spot-check the mixed-hash arithmetic on one row
    val r0 = a.head
    assert(r0.getLong(3) == (r0.getLong(0) * 2654435761L + 54321L) % 1000003L)
  }

  test("BPE merges: hand-solved rounds, greedy leftmost merge, exhaustion yields no phantom rules") {
    import spark.implicits._
    def rules(text: String, rounds: Int): Seq[(Int, String, String, Long)] =
      Corpus.bpeMerges(Seq((1L, text)).toDF("doc_id", "text"), rounds)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

    // "abab abab abab cd": (a,b) fires 6 times (2/word × 3), then the
    // merged (ab,ab) 3, then (c,d) 1; round 4 finds NO pairs left and
    // must emit nothing rather than a phantom rule
    assert(rules("abab abab abab cd", 4) ==
      Seq((1, "a", "b", 6L), (2, "ab", "ab", 3L), (3, "c", "d", 1L)))

    // greedy leftmost: "aaa" + merge (a,a) folds to [aa, a], so round
    // 2's top pair is (aa, a) — never (a, aa)
    assert(rules("aaa aaa", 2) ==
      Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))

    // tie-break is (freq desc, left, right): "ba ba ab ab" has (b,a)
    // and (a,b) at freq 2 each — the lexicographically smaller pair wins
    assert(rules("ba ba ab ab", 1) == Seq((1, "a", "b", 2L)))

    // non-[a-z] tokens never enter the training table
    assert(rules("ab ab A1 $$", 1) == Seq((1, "a", "b", 2L)))
  }

  test("weighted reservoir: overwhelming weight always draws first, equal weights reduce to the u-order") {
    import spark.implicits._
    // ln(u)/1e9 ≈ 0 beats every ln(u)/1 regardless of u — the heavy
    // doc must take rank 1 in every draw
    val docs = (0L until 30L).map(i =>
      (i, "s0", if (i == 17L) 1000000000L else 1L)).toDF("doc_id", "source", "n_chars")
    val drawn = Corpus.sampleWeighted(docs, k = 5).collect()
    assert(drawn.length == 5)
    assert(drawn.head.getLong(0) == 17L && drawn.head.getInt(3) == 1,
      s"heavy doc must rank first: ${drawn.toSeq}")
    val again = Corpus.sampleWeighted(docs, k = 5).collect()
    assert(drawn.map(_.toString).toSeq == again.map(_.toString).toSeq, "draw must be deterministic")

    // equal weights: ln(u)/w orders exactly as u descending — the
    // A-Res key collapses to the uniform hash draw (modulo direction)
    val eq = (0L until 30L).map(i => (i, "s0", 7L)).toDF("doc_id", "source", "n_chars")
    val got = Corpus.sampleWeighted(eq, k = 30).collect()
      .map(r => (r.getInt(3), r.getLong(0))).sortBy(_._1).toSeq
    val u = (i: Long) => ((i * 2654435761L + 99991L) % 1000003L) + 1L
    val expected = (0L until 30L).sortBy(i => (-u(i), i)).zipWithIndex
      .map { case (id, ix) => (ix + 1, id) }.toSeq
    assert(got == expected, s"equal-weight draw must rank by u desc: $got")
  }

  test("BPE encode: hand-solved segmentation, and more merges never add tokens") {
    import spark.implicits._
    def encode(rounds: Int, docs: (Long, String, String)*): Map[String, (Long, Long, Long, Long)] =
      Corpus.bpeEncode(docs.toDF("doc_id", "source", "text"), rounds)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // one merge learned on "abab abab cd": (a,b) at freq 4. Encoding:
    // abab → [ab, ab] (2 tokens, ×2 words), cd stays [c, d]
    val one = encode(1, (1L, "s0", "abab abab cd"))
    assert(one("s0") == ((2L, 3L, 6L, 10L)), // vocab {abab, cd}; 3 word occurrences
      s"(n_vocab, n_words, n_tokens, n_chars) mismatch: ${one("s0")}")

    // merges train on the UNION of sources but segment each source's
    // own words; a source never containing the merged pair is untouched
    val two = encode(1, (1L, "s0", "abab abab"), (2L, "s1", "cd cd cd"))
    assert(two("s0") == ((1L, 2L, 4L, 8L)))
    assert(two("s1") == ((1L, 3L, 6L, 6L))) // (a,b) merge can't fire in "cd"

    // token count is monotone non-increasing in merge rounds, floored
    // at one token per word; chars are invariant
    val text = "banana bandana ban banana cab"
    val byRounds = (1 to 6).map(k => encode(k, (1L, "s0", text))("s0"))
    byRounds.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3, s"tokens grew with an extra merge: $a -> $b")
    }
    assert(byRounds.map(_._4).distinct.size == 1, "n_chars must not depend on merges")
    assert(byRounds.last._3 >= byRounds.last._2, "at least one token per word")

    // EXHAUSTION (r6 ADVICE): "ab ab" exhausts after one merge —
    // rounds 2..8 learn nothing. The apply loop must treat the empty
    // rule as identity (it used to cross-join-annihilate the vocab and
    // return ZERO rows); stats must equal the 1-round encode exactly.
    val exhausted = encode(8, (1L, "s0", "ab ab"))
    assert(exhausted.nonEmpty, "exhausted corpus must still produce per-source stats")
    assert(exhausted("s0") == encode(1, (1L, "s0", "ab ab"))("s0"),
      "encode under exhausted merges must equal the encode under the merges actually learned")
    assert(exhausted("s0") == ((1L, 2L, 2L, 4L))) // vocab {ab}; 2 words, 1 token each
  }

  test("k-anonymity: hand-built equivalence classes hit all four flag combinations") {
    import spark.implicits._
    val docs = (Seq(
      // (s1, bucket 1): 5 docs, 2 langs -> k-anonymous AND l-diverse
      (1L, "en", "s1", 150L), (2L, "de", "s1", 160L), (3L, "en", "s1", 170L),
      (4L, "en", "s1", 180L), (5L, "de", "s1", 190L),
      // (s2, bucket 0): 1 doc -> neither
      (6L, "en", "s2", 50L),
      // (s3, bucket 2): 5 docs, 1 lang -> k-anonymous, NOT l-diverse
      (7L, "en", "s3", 250L), (8L, "en", "s3", 260L), (9L, "en", "s3", 270L),
      (10L, "en", "s3", 280L), (11L, "en", "s3", 290L),
      // (s4, bucket 3): 2 docs, 2 langs -> l-diverse, NOT k-anonymous
      (12L, "en", "s4", 350L), (13L, "zh", "s4", 360L),
    )).toDF("doc_id", "lang", "source", "n_chars")
    val rows = Corpus.kAnonymity(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(rows.size == 4)
    assert(rows(("s1", 1L)) == ((5L, 2L, true, true)))
    assert(rows(("s2", 0L)) == ((1L, 1L, false, false)))
    assert(rows(("s3", 2L)) == ((5L, 1L, true, false)))
    assert(rows(("s4", 3L)) == ((2L, 2L, false, true)))
  }

  test("dp counts: hand-folded hash uniform through the inverse-CDF Laplace draw") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "s1"), (2L, "en", "s1"), (3L, "en", "s1"),
      (4L, "de", "s2"),
    ).toDF("doc_id", "lang", "source")
    val rows = Corpus.dpCounts(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def noisy(key: String, n: Long): Double = {
      val h = key.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + b) % 1000003L)
      val u = (h + 1).toDouble / 1000004.0
      val noise = if (u < 0.5) math.log(2.0 * u) else -math.log(2.0 * (1.0 - u))
      BigDecimal(n + noise).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows(("en", "s1"))._1 == 3L)
    assert(rows(("en", "s1"))._2 == noisy("dp#en#s1", 3L))
    assert(rows(("de", "s2"))._1 == 1L)
    assert(rows(("de", "s2"))._2 == noisy("dp#de#s2", 1L))
    // the mechanism must actually perturb (a zero draw needs u = 0.5
    // exactly — measure-zero on the hash family)
    rows.foreach { case (_, (n, nz)) => assert(math.abs(nz - n) > 0) }
  }

  test("dataset card: every field hand-computed on a five-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "s1", 5L), (2L, "a b c", "en", "s1", 5L), // dup pair
      (3L, "x y", "de", "s1", 3L),
      (4L, "p q r s", "en", "s2", 7L),
      (5L, "z", "de", "s2", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Corpus.datasetCard(docs).collect()
    assert(r.length == 1)
    val c = r.head
    assert(c.getLong(0) == 5 && c.getLong(1) == 2 && c.getLong(2) == 2)
    assert(c.getLong(3) == 13, s"tokens: $c")          // 3+3+2+4+1
    assert(c.getLong(4) == 21)                          // chars
    assert(c.getLong(5) == 2, "mean 13 div 5")
    assert(c.getLong(6) == 5, "discrete median of 1,3,5,5,7")
    assert(c.getLong(7) == 1 && c.getLong(8) == 200, "one dup of five docs")
    assert(c.getString(9) == "s1" && c.getLong(10) == 3)
  }

  test("split leakage: planted cross-split clone flagged, same-split clone pair stays silent") {
    import spark.implicits._
    // derive each id's split with the engine's own hash so the test
    // can PLACE clones deliberately
    def splitOf(id: Long): String = {
      val b = ((id * 2654435761L + 12345L) % 1000003L) % 100L
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val ids = (1L to 300L)
    val trainIds = ids.filter(splitOf(_) == "train")
    val valIds = ids.filter(splitOf(_) == "val")
    val testIds = ids.filter(splitOf(_) == "test")
    assert(trainIds.size >= 2 && valIds.nonEmpty && testIds.nonEmpty)
    val clone = "the quick brown fox jumps over the lazy dog again tonight"
    val trainClone = "pack my box with five dozen liquor jugs every single day"
    val docs = Seq(
      (trainIds(0), clone),                     // leaks into val
      (valIds(0), clone),
      (trainIds(1), trainClone),                // same-split pair: silent
      (trainIds(2), trainClone),
      (testIds(0), "unique zebra walrus text nothing shares these words"),
    ).toDF("doc_id", "text")
    val rows = Corpus.splitLeakage(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.size == 3)
    val (np, nl, nb, pm) = rows(("train", "val"))
    assert(np >= 1 && nl == 1 && nb == 1 && pm == 1000,
      s"planted train-val clone must contaminate the whole 1-doc val split: ${rows(("train", "val"))}")
    assert(rows(("train", "test"))._2 == 0, "test split must stay clean")
    assert(rows(("val", "test"))._2 == 0)
  }

  test("filter funnel: each stage cuts exactly its planted victim, cumulatively") {
    import spark.implicits._
    val ok = (1 to 30).map(i => f"w$i%03d").mkString(" ")           // 30 x 4-char distinct
    val short = (1 to 10).map(i => f"w$i%03d").mkString(" ")        // cut: length
    val repeat = (Seq.fill(10)("xxxx") ++ (1 to 20).map(i => f"y$i%03d")).mkString(" ") // cut: repetition
    val thin = (1 to 30).map(i => ('a' + (i - 1) % 26).toChar.toString + (i / 26)).mkString(" ") // 2-char words, cut: quality
    val docs = Seq(
      (1L, ok), (2L, short), (3L, repeat), (4L, thin), (5L, ok),    // 5 clones 1
    ).toDF("doc_id", "text")
    val rows = Corpus.filterFunnel(docs).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows(0) == (("all", 5L, 5L, 1000L)))
    assert(rows(1) == (("length", 5L, 4L, 800L)))
    assert(rows(2) == (("repetition", 4L, 3L, 750L)))
    assert(rows(3) == (("quality", 3L, 2L, 666L)))
    assert(rows(4) == (("dedup", 2L, 1L, 500L)))
  }

  test("release pipeline: a planted k<5 class is suppressed end-to-end, funnel losses excluded from release") {
    import spark.implicits._
    // distinct funnel-passing texts: 30 distinct 5-char words each
    def okText(seed: Int) = (1 to 30).map(i => f"w$seed%02dx$i%02d").mkString(" ")
    val rows =
      // source "big": 6 funnel-passing docs in one quasi-id class
      // (len_bucket 1) → class_size 6 >= k=5 → released
      (1 to 6).map(i => (i.toLong, "en", "big", okText(i), 100L)) ++
        // a 7th "big" doc that FAILS the funnel (too short) — counts in
        // n_raw but never reaches the k-gate or the release
        Seq((7L, "en", "big", "too short", 100L)) ++
        // source "tiny": 2 funnel-passing docs, class_size 2 < 5 →
        // suppressed; its lang is unique so suppression is visible
        Seq((8L, "xx", "tiny", okText(8), 100L),
          (9L, "xx", "tiny", okText(9), 100L))
    val docs = rows.toDF("doc_id", "lang", "source", "text", "n_chars")
    val got = Corpus.releasePipeline(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 2)
    assert(got(("en", "big")) == ((7L, 6L, 857L)),
      s"big class must release its 6 funnel survivors of 7 raw docs: ${got(("en", "big"))}")
    assert(got(("xx", "tiny")) == ((2L, 0L, 0L)),
      s"k<5 class must be suppressed to zero but still emit its row: ${got(("xx", "tiny"))}")
  }

  test("span corruption: splicing targets back into inputs reconstructs every document") {
    import spark.implicits._
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "one"),
      (3L, (1 to 40).map(i => s"w$i").mkString(" ")))
    val got = Corpus.spanCorrupt(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == texts.map(_._1).toSet)
    val sentinel = "<X(\\d+)>".r
    texts.foreach { case (id, text) =>
      val r = got(id)
      val (nWords, nSpans) = (r.getLong(1), r.getLong(2))
      assert(nWords == text.split(" ").length.toLong, s"doc $id n_words")
      val input = r.getString(3).split(" ").filter(_.nonEmpty)
      val target = r.getString(4)
      // sentinels appear in order <X0>, <X1>, … in BOTH renditions
      val inSent = sentinel.findAllMatchIn(r.getString(3)).map(_.group(1).toInt).toSeq
      val tgSent = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(inSent == (0 until nSpans.toInt) && tgSent == inSent,
        s"doc $id sentinels: input $inSent target $tgSent spans $nSpans")
      // splice each sentinel's target words back → the original text
      val spans: Map[Int, Seq[String]] =
        if (nSpans == 0) Map.empty
        else {
          val parts = sentinel.split(target).toSeq // "" head, then span bodies in order
          tgSent.zip(parts.drop(1).map(_.trim.split(" ").filter(_.nonEmpty).toSeq)).toMap
        }
      val rebuilt = input.flatMap {
        case sentinel(k) => spans(k.toInt)
        case w => Seq(w)
      }.mkString(" ")
      assert(rebuilt == text, s"doc $id round-trip: '$rebuilt' != '$text'")
    }
    // determinism: a second run is bit-identical
    val again = Corpus.spanCorrupt(texts.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    got.foreach { case (id, r) => assert(again(id) == r.getString(3)) }
  }
}
