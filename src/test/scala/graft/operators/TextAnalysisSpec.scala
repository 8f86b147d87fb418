package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("goodTuring computes the hand-worked freq-of-freqs and adjusted counts") {
    import org.apache.spark.sql.functions._
    // trigrams: "a b c" twice (from both docs), "b c d" and "b c e"
    // once each -> N1=2, N2=1, total mass 4, p0 = 2/4 = 0.5.
    // r*=1: 2*N2/N1 = 1.0; r*=2: needs N3 -> NULL.
    val d = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val got = TextAnalysis.goodTuring(d).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1.0, 0.5), (2L, 1L, null, 0.5)), s"got ${got.toSeq}")
  }

  test("logOddsTokens: symmetric usage scores zero; one-sided usage scores positive") {
    import org.apache.spark.sql.functions._
    def mk(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
    // fully symmetric corpora -> identical operands on both sides of
    // the difference -> exactly 0.0
    val sym = TextAnalysis.logOddsTokens(mk(Seq(
      (1L, "en", "alpha beta alpha beta"), (2L, "de", "alpha beta alpha beta"))),
      minTotal = 1L).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(sym("alpha") == ((0.0, 0.0)), s"symmetric token must be 0: ${sym("alpha")}")
    assert(sym("beta") == ((0.0, 0.0)))
    val dir = TextAnalysis.logOddsTokens(mk(Seq(
      (1L, "en", "alpha beta alpha beta"), (2L, "de", "alpha beta alpha beta"),
      (3L, "en", "onlyen onlyen onlyen"))), minTotal = 1L).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(dir("onlyen")._1 > 0 && dir("onlyen")._2 > 0, s"one-sided: ${dir("onlyen")}")
  }

  test("redactPii scrubs every email/phone occurrence and counts pre-redaction") {
    val rows = Seq(
      (1L, "write a@b.io and c.d+x@e.org or call +1-555-0100 and +44-555-0199 now"),
      (2L, "no pii here at all")).toDF("id", "note")
    val got = TextAnalysis.redactPii(rows, "note")
      .select("id", "note", "n_emails", "n_phones")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0)._2 == "write <EMAIL> and <EMAIL> or call <PHONE> and <PHONE> now")
    assert(got(0)._3 == 2L && got(0)._4 == 2L)
    assert(got(1)._2 == "no pii here at all" && got(1)._3 == 0L && got(1)._4 == 0L)
    // mixed-case emails are still PII; a phone-shaped span consumed by an
    // email match is neither counted nor double-redacted
    val tricky = Seq(
      (1L, "mail John.Doe@Gmail.com or +1-555-0100@relay.io today")).toDF("id", "note")
    val t = TextAnalysis.redactPii(tricky, "note")
      .select("note", "n_emails", "n_phones").as[(String, Long, Long)].head()
    assert(t._1 == "mail <EMAIL> or <EMAIL> today")
    assert(t._2 == 2L && t._3 == 0L)
  }

  test("repetition kernel matches the relational explode formulation") {
    val docs = Seq(
      (1L, "a a a a"),            // one token dominates; all bigrams identical
      (2L, "a b c d e"),          // all distinct
      (3L, "x y x y x y"),        // alternating: 2 distinct bigrams of 5
      (4L, "solo"),               // no bigrams
      (5L, "p q p q r r r p q")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionGates(docs)
      .select("doc_id", "n_words", "top_word_frac", "dup_bigram_frac")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (id, n, t, d) => id -> ((n, t, d)) }.toMap
    // relational oracle: explode words / bigrams
    import org.apache.spark.sql.functions.{col, explode, split, count, max, round => rnd}
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val wc = words.groupBy("doc_id", "w").agg(count("*").as("c"))
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.sum("c").as("n"), max("c").as("top"))
      .as[(Long, Long, Long)].collect().map { case (id, n, top) => id -> ((n, top)) }.toMap
    wc.foreach { case (id, (n, top)) =>
      val (gn, gt, _) = got(id)
      assert(gn == n, s"doc $id n_words")
      val expectFrac = math.rint(top.toDouble / n * 10000) / 10000
      assert(math.abs(gt - expectFrac) < 1e-9, s"doc $id top frac")
    }
    assert(got(1L) == ((4L, 1.0, 2.0 / 3)) || got(1L)._3 == 0.6667)
    assert(got(2L)._3 == 0.0 && got(2L)._2 == 0.2)
    assert(got(3L) == ((6L, 0.5, 0.6)))   // 5 bigrams, 2 distinct -> 3/5
    assert(got(4L) == ((1L, 1.0, 0.0)))
  }

  test("qualityScores: ratios and score are deterministic") {
    val docs = Seq((1L, "the cat sat", 11L)).toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.qualityScores(docs).head()
    assert(r.getLong(1) == 3L)                      // tokens
    assert(r.getDouble(2) == math.rint(11.0 / 3 * 10000) / 10000) // chars_per_token ~ 3.6667
    assert(r.getDouble(3) == 0.3333)                // 1 stopword of 3
  }

  test("languageId picks the language with most stopword hits") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "el perro la casa los gatos", "es"),
      (3L, "zzz qqq", "zz"),
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.languageId(docs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("normalized strips punctuation and collapses whitespace") {
    val docs = Seq((1L, "Hello,   World! (x)")).toDF("doc_id", "text")
    val r = TextAnalysis.normalized(docs).head()
    assert(r.getString(1) == "hello world x")
    assert(r.getLong(2) == 3L)
  }

  test("regexTagSummary applies first-match semantics") {
    val docs = Seq((1L, "spark and stream"), (2L, "stream only"), (3L, "a join"), (4L, "none"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.regexTagSummary(docs)
      .as[(String, Long)].collect().toMap
    assert(got == Map("spark" -> 1L, "streaming" -> 1L, "relational" -> 1L, "other" -> 1L))
  }
  test("gopherQualityFlags gates on word count, mean length, and stop words") {
    val long50 = ("the a " + Seq.fill(48)("word").mkString(" "))
    val docs = Seq(
      (1L, long50, "en", "s0", 0L),             // 50 words, has the+a -> kept
      (2L, "the a short doc", "en", "s0", 0L),  // 4 words -> words_ok false
      (3L, Seq.fill(60)("word").mkString(" "), "en", "s0", 0L), // no stop words
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.gopherQualityFlags(docs)
      .select("doc_id", "n_words", "words_ok", "stop_ok", "kept")
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 50L, true, true, true)))
    assert(got(2L) == ((2L, 4L, false, true, false)))
    assert(got(3L) == ((3L, 60L, true, false, false)))
  }
  test("charEntropy: 0 for constant text, 2 bits for a uniform 4-symbol alphabet") {
    val docs = Seq(
      (1L, "aaaaaaaa", "en", "s0", 8L),
      (2L, "abcdabcd", "en", "s0", 8L),
      (3L, "", "en", "s0", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.charEntropy(docs)
      .select("doc_id", "n_chars_split", "n_distinct_chars", "entropy_bits")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // the +0.0 normalization pins the zero-entropy case to +0.0 exactly
    assert(got(1L).toString == (1L, 8L, 1L, 0.0).toString)
    assert(got(2L) == ((2L, 8L, 4L, 2.0)))
    assert(got(3L).toString == (3L, 0L, 0L, 0.0).toString)
  }
  test("readability: hand-computed Flesch on a fixed sentence, floors on degenerate text") {
    val docs = Seq(
      (1L, "the cat sat on the mat. it was happy!", "en", "s", 37L),
      (2L, "xxxx", "en", "s", 4L)) // no vowels, no terminals -> floors
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.readability(docs)
      .as[(Long, Long, Long, Long, Double, String)].collect().map(r => r._1 -> r).toMap
    // doc 1: 9 words, 2 sentences, 10 vowel groups ("e a a o e a i a a-y" -> count)
    val (_, w, s, syl, flesch, band) = got(1L)
    assert(w == 9 && s == 2)
    val expected = BigDecimal(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (syl.toDouble / w))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(flesch - expected) < 1e-9)
    assert(band == (if (flesch >= 60) "easy" else if (flesch >= 30) "standard" else "difficult"))
    // degenerate doc: sentence and syllable floors keep the score total
    val (_, w2, s2, syl2, f2, _) = got(2L)
    assert(w2 == 1 && s2 == 1 && syl2 == 1 && !f2.isNaN)
  }

  test("lengthQuantiles: exact interpolated percentiles per group") {
    val docs = Seq(
      (1L, "a b", "en", "s0", 3L),       // 2 toks
      (2L, "a b c d", "en", "s0", 7L),   // 4
      (3L, "a b c d e f", "en", "s0", 11L), // 6
      (4L, "a", "de", "s0", 1L),         // 1
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.lengthQuantiles(docs)
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    // en: sorted [2,4,6]; p25 = 2 + 0.5*(4-2) = 3.0; p50 = 4; p75 = 5.0
    assert(got("en") == (("en", 3L, 3.0, 4.0, 5.0)))
    assert(got("de") == (("de", 1L, 1.0, 1.0, 1.0)))
  }

  test("lengthQualityCorrelation: r=1 on a perfectly linear source, 0 when either axis is constant") {
    val docs = Seq(
      // pos: (x, y) = (2,0), (4,2500), (6,5000) -- y = 1250(x-2), exactly linear
      (1L, "cat dog", "pos"),
      (2L, "the cat dog fish", "pos"),
      (3L, "the the the dog cat fish", "pos"),
      // flat: stop ratio constant (zero) across lengths -> sigma_y = 0 -> r = 0
      (4L, "cat dog", "flat"),
      (5L, "bird fish cow", "flat"),
      // samelen: lengths constant, ratios differ -> sigma_x = 0 -> r = 0
      (6L, "the cat", "samelen"),
      (7L, "cat dog", "samelen"),
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.lengthQualityCorrelation(docs)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("pos") == (("pos", 3L, 1.0)))
    assert(got("flat") == (("flat", 2L, 0.0)))
    assert(got("samelen") == (("samelen", 2L, 0.0)))
  }

  test("tokenizerFertility: letter/digit runs per whitespace word, hand-computed") {
    val docs = Seq(
      // "ab2cd ef" -> 2 words, subwords ab|2|cd|ef = 4, fertility 2.0
      (1L, "ab2cd ef", "en", "s1", 8L),
      // "x-y z9" -> 2 words, subwords x|y|z|9 = 4
      (2L, "x-y z9", "en", "s1", 6L),
      // clean prose: 1 subword per word
      (3L, "plain words only", "en", "s2", 16L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.tokenizerFertility(docs)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1") == (("s1", 2L, 4L, 8L, 14L, 2.0, 1.75)))
    assert(got("s2") == (("s2", 1L, 3L, 3L, 16L, 1.0, 5.3333)))
  }
  test("hillTailIndex: hand-computed alpha on a tiny exact fixture") {
    // k=4 top lengths 16,8,4,2 (x_k=2): sum ln = ln16+ln8+ln4+ln2 = 10 ln2,
    // denom = 10 ln2 - 4 ln2 = 6 ln2 -> alpha = 4 / (6 ln2)
    val docs = Seq((1L, 16L), (2L, 8L), (3L, 4L), (4L, 2L), (5L, 1L))
      .toDF("doc_id", "n_chars")
    val got = TextAnalysis.hillTailIndex(docs, k = 4)
      .as[(Long, Long, Double)].head()
    val alpha = math.round(4.0 / (6 * math.log(2)) * 1e4) / 1e4
    assert(got == ((4L, 2L, alpha)))
  }

  test("hillTailIndex: all-equal top-k reports NULL alpha, not a fault") {
    val docs = (1L to 6L).map((_, 100L)).toDF("doc_id", "n_chars")
    val got = TextAnalysis.hillTailIndex(docs, k = 4)
      .as[(Long, Long, Option[Double])].head()
    assert(got._1 == 4L && got._2 == 100L && got._3.isEmpty)
  }

  test("calibrationBins: hand-computed conf/acc/gap per decile bin") {
    // doc A: stops 1 of 4 tokens -> y=2500 bin 2; long (pos).
    // doc B: stops 1 of 4 -> bin 2; short. doc C: 0 stops -> bin 0; short.
    val docs = Seq(
      (1L, "the x y z", 300L),
      (2L, "the p q r", 100L),
      (3L, "m n o p", 100L)).toDF("doc_id", "text", "n_chars")
    val got = TextAnalysis.calibrationBins(docs)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 0.0, 0.0, 0.0),          // bin 0: conf 0, none long
      (2L, 2L, 0.25, 0.5, 0.25)))       // bin 2: conf .25, half long
  }

  test("labelAgreementKappa: hand-computed 2x2 kappa") {
    // ra = stored en; rb = heuristic. 4 docs:
    //  d1 en/predicted-en (the the) -> n11; d2 en/pred-und -> n10
    //  d3 de/pred-en -> n01; d4 de/pred-de (der und) -> n00
    val docs = Seq(
      (1L, "en", "the the x"),
      (2L, "en", "zzz yyy"),
      (3L, "de", "the and q"),
      (4L, "de", "der und w")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.labelAgreementKappa(docs)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].head()
    // po = 2/4 = .5; pe = (2*2 + 2*2)/16 = .5; kappa = 0
    assert(got == ((4L, 1L, 1L, 1L, 1L, 0.5, 0.5, 0.0)))
  }

  test("langSourceMi: independent dimensions give zero pmi everywhere") {
    import org.apache.spark.sql.functions.{col, length => slen}
    // perfectly factored 2x2 grid: every cell n = marginals' product / N
    val d = Seq(
      (1L, "en", "s1"), (2L, "en", "s2"), (3L, "de", "s1"), (4L, "de", "s2"))
      .toDF("doc_id", "lang", "source")
      .withColumn("text", col("lang")).withColumn("n_chars", slen(col("text")))
    val r = TextAnalysis.langSourceMi(d).collect()
    assert(r.length == 4)
    r.foreach { x =>
      assert(x.getDouble(3) == 1.0, "expected = 2*2/4 = 1")
      assert(x.getDouble(4) == 0.0 && x.getDouble(5) == 0.0, s"pmi must be 0: $x")
    }
  }

  test("langSourceMi: perfectly dependent dimensions give ln(2) pmi") {
    import org.apache.spark.sql.functions.{col, length => slen}
    // lang determines source: en->s1, de->s2, two docs each
    val d = Seq(
      (1L, "en", "s1"), (2L, "en", "s1"), (3L, "de", "s2"), (4L, "de", "s2"))
      .toDF("doc_id", "lang", "source")
      .withColumn("text", col("lang")).withColumn("n_chars", slen(col("text")))
    val r = TextAnalysis.langSourceMi(d).collect()
    assert(r.length == 2, "only the diagonal cells exist")
    r.foreach { x =>
      assert(x.getDouble(4) == 0.6931, s"pmi must be ln(2): $x") // round(ln 2, 4)
      assert(x.getDouble(5) == 0.346574, s"mi_part = 0.5*ln(2): $x")
    }
  }

  test("isotonicCalibration: minimax PAV pools the violating bins") {
    import org.apache.spark.sql.functions.lit
    // bin 0 (no stopwords): acc 1.0; bin 5 (half 'the'): acc 0.0;
    // bin 9 (all 'the'): acc 0.5. Equal weights → PAV pools 1.0,0.0 to
    // 0.5, then 0.5 ≤ 0.5 holds → iso = [0.5, 0.5, 0.5].
    val b0 = "b c d e f g h i j k"
    val b5 = "the the the the the b c d e f"
    val b9 = "the the the the the the the the the the"
    val d = Seq(
      (1L, b0, 260L), (2L, b0, 270L),
      (3L, b5, 100L), (4L, b5, 120L),
      (5L, b9, 300L), (6L, b9, 100L),
    ).toDF("doc_id", "text", "n_chars")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val r = TextAnalysis.isotonicCalibration(d).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 5L, 9L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(1.0, 0.0, 0.5))  // raw
    assert(r.map(_.getDouble(3)).toSeq == Seq(0.5, 0.5, 0.5))  // isotonic
  }

  test("isotonicCalibration is monotone non-decreasing on real data") {
    val real = graft.Tables(spark, sf("")).documents
    val iso = TextAnalysis.isotonicCalibration(real)
      .collect().map(_.getDouble(3)).toSeq
    assert(iso == iso.sorted, s"not monotone: $iso")
  }

  test("rakeKeyphrases: hand-computed deg/freq scores with quantized phrase sums") {
    // "deep learning of deep and the rate":
    //   phrases = [deep learning], [deep], [rate]
    //   freq: deep 2, learning 1, rate 1; deg: deep 3, learning 2, rate 1
    //   ws_q: deep 1_500_000, learning 2_000_000, rate 1_000_000
    //   scores: "deep learning" 3.5, "deep" 1.5, "rate" 1.0
    val docs = Seq((1L, "deep learning of deep and the rate")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(docs).as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("deep learning", 2L, 1L, 3.5), ("deep", 1L, 1L, 1.5), ("rate", 1L, 1L, 1.0)))
  }

  test("rakeKeyphrases: repeated phrases count occurrences once in the row, n times in freq") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(docs).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("phrase") == "alpha beta" &&
      got(0).getAs[Long]("n_occurrences") == 2L)
    // deg = 2+2 = 4 per word, freq = 2 → ws = 2.0 each → phrase score 4.0
    assert(got(0).getAs[Double]("score") == 4.0)
  }
}
