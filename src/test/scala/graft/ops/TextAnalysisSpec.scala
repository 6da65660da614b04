package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text-analysis operators: normalization, shingling, language-ID, quality
  * features, token counting, fingerprints.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](c: org.apache.spark.sql.Column, s: String): T =
    Seq(s).toDF("t").select(c.as("v")).as[T].head()

  test("normalize: lowercase, delimiter runs → single space, trimmed") {
    assert(one[String](TextAnalysis.normalize(col("t")), "  Hello,,  WORLD!! ")
      === "hello world")
    assert(one[String](TextAnalysis.normalize(col("t")), "a.b-c") === "a b c")
    assert(one[String](TextAnalysis.normalize(col("t")), "...") === "")
  }

  test("shingles: n-grams with space join; fewer than n tokens → empty") {
    val sh = one[Seq[String]](
      TextAnalysis.shingles(TextAnalysis.tokens(col("t")), 3), "a b c d")
    assert(sh === Seq("a b c", "b c d"))
    val short = one[Seq[String]](
      TextAnalysis.shingles(TextAnalysis.tokens(col("t")), 3), "a b")
    assert(short === Seq.empty)
  }

  test("shingleSet deduplicates repeated shingles") {
    val sh = one[Seq[String]](TextAnalysis.shingleSet(col("t"), 2), "a b a b a")
    assert(sh.sorted === Seq("a b", "b a"))
  }

  test("langId picks the profile with most marker hits; first profile wins ties") {
    assert(one[String](TextAnalysis.langId(TextAnalysis.tokens(col("t"))),
      "the cat is in the house and it was good") === "en")
    assert(one[String](TextAnalysis.langId(TextAnalysis.tokens(col("t"))),
      "der Hund und die Katze ist nicht hier") === "de")
    assert(one[String](TextAnalysis.langId(TextAnalysis.tokens(col("t"))),
      "el perro y la casa por con para que es") === "es")
    // zero hits anywhere → ties at 0 → first profile (en) wins deterministically
    assert(one[String](TextAnalysis.langId(TextAnalysis.tokens(col("t"))),
      "zzz qqq") === "en")
  }

  test("qualityFeatures: counts and ratios on a known sentence") {
    val f = Seq("The cat sat, twice!").toDF("t")
      .select(TextAnalysis.qualityFeatures(col("t")).as("f"))
      .select("f.n_chars", "f.n_tokens", "f.punct_ratio")
      .as[(Int, Int, Double)].head()
    assert(f._1 === 19)
    assert(f._2 === 4)
    assert(f._3 === math.rint(2.0 / 19 * 1e6) / 1e6)
  }

  test("qualityScore: prose scores higher than noise") {
    val score = (s: String) => one[Double](
      TextAnalysis.qualityScore(TextAnalysis.qualityFeatures(col("t"))), s)
    val prose = score("The quick brown fox jumps over the lazy dog near the " +
      "river bank while evening light settles on the quiet village rooftops")
    val noise = score("@@@ ### !!! 12345 67890 ***")
    assert(prose > 0.6)
    assert(noise < 0.3)
    assert(prose > noise)
  }

  test("token counts: whitespace vs BPE-ish regex") {
    assert(one[Int](TextAnalysis.wsTokenCount(col("t")), "one two  three") === 3)
    assert(one[Int](TextAnalysis.wsTokenCount(col("t")), "  ") === 0)
    // "don't" → don + ' + t = 3; "42" → 4 + 2 = 2 single digits
    assert(one[Int](TextAnalysis.bpeishTokenCount(col("t")), "don't 42") === 5)
  }

  test("redactPii replaces emails, URLs (greedy), and IPs with placeholders") {
    val r = (s: String) => one[String](TextAnalysis.redactPii(col("t")), s)
    assert(r("mail me at bob.smith+x@corp.example.org today")
      === "mail me at <EMAIL> today")
    assert(r("see https://a.example/x?q=1 and http://b.example")
      === "see <URL> and <URL>")
    assert(r("from 192.168.1.254 port 22") === "from <IP> port 22")
    // URL containing an @ is consumed as URL, not as email
    assert(r("https://user@host.example/path") === "<URL>")
    assert(r("no pii here") === "no pii here")
  }

  test("repeatedNgramFrac: 0 for unique text, →1 for loops, 0 below n tokens") {
    val f2 = (s: String) => one[Double](
      TextAnalysis.repeatedNgramFrac(TextAnalysis.tokens(col("t")), 2), s)
    assert(f2("a b c d e") === 0.0)
    assert(f2("a b a b a b a b") > 0.7) // 7 bigrams, 2 distinct
    assert(f2("solo") === 0.0)
  }

  test("contentFingerprint: equal iff normalized-equal") {
    val fp = (s: String) => one[Long](TextAnalysis.contentFingerprint(col("t")), s)
    assert(fp("Hello, World!") === fp("hello world"))
    assert(fp("hello world") !== fp("hello worlds"))
  }

  test("sketchFingerprint: stable, and equal for identical content") {
    val fp = (s: String) => one[Long](TextAnalysis.sketchFingerprint(col("t")), s)
    val a = fp("the quick brown fox jumps over the lazy dog")
    assert(a === fp("the quick brown fox jumps over the lazy dog"))
    assert(a !== fp("entirely different words in this other document here"))
  }

  test("gopherRules: each rule trips on its own planted violation, integer boundaries exact") {
    val good = (("the quick brown fox jumps over lazy dogs near rivers and " * 3)
      + "the end of it").trim // 37 words, mean len in [3,10], stopwords, varied
    val rows = Seq(
      (1L, good),                                     // all rules pass
      (2L, "the of short doc with few words"),        // 7 words < 30
      (3L, ("a b c d e f g h i j " * 4) + "the of"),  // mean len < 3
      (4L, good + " " + ("# " * 10)),                 // 10 symbols, 37 words
      (5L, good.replace("the end of it",
        "the end of it ... ... ... ...")),            // 4 ellipses → trips on 37 words? 4*10=40>37
      (6L, "the of " + ("spam " * 33)))               // 33/35 same token
    val out = TextAnalysis.gopherRules(rows.toDF("doc_id", "text"),
        "doc_id", "text", minWords = 30)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "r_word_count", "r_word_len", "r_symbol",
        "r_stopword", "r_repetition", "keep")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._8, s"good doc must keep: ${byId(1L)}")
    assert(!byId(2L)._3 && !byId(2L)._8, "short doc trips word count")
    assert(!byId(3L)._4 && !byId(3L)._8, "1-char tokens trip mean word length")
    assert(!byId(4L)._5 && !byId(4L)._8, "10 '#' in 37 words trips symbol ratio")
    assert(!byId(5L)._5 && !byId(5L)._8, "4 '...' in 37 words trips symbol ratio")
    assert(!byId(6L)._7 && !byId(6L)._8, "33/35 same token trips repetition")
    // integer boundary: EXACTLY minWords words passes, one fewer fails —
    // and symbol boundary 10·syms == wc passes (≤, not <)
    val b = TextAnalysis.gopherRules(Seq(
        (10L, "the of " + (1 to 28).map(i => s"tok$i").mkString(" ")), // 30 words
        (11L, "the of " + (1 to 27).map(i => s"tok$i").mkString(" ")), // 29 words
        (12L, "the of " + (1 to 28).map(i => s"tok$i").mkString(" ") + " # # #")
      ).toDF("doc_id", "text"), "doc_id", "text", minWords = 30)
      .select("doc_id", "r_word_count", "r_symbol")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(b(10L)._2, "exactly minWords passes")
    assert(!b(11L)._2, "minWords−1 fails")
    assert(b(12L)._3, "10·3 symbols == 30 words sits ON the ≤ boundary and passes")
  }

  test("tfidfTopK: rare terms outrank corpus-wide terms; tf/df exact") {
    // 'common' appears in every doc (idf = ln(4/4)+1 = 1); each doc also
    // has a unique term (idf = ln(4/2)+1) and doc 1 repeats its unique
    // term twice — highest score in doc 1 by both tf and idf
    val d = Seq(
      (1L, "common alpha alpha common"),
      (2L, "common beta"),
      (3L, "common gamma"))
      .toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
    val out = TextAnalysis.tfidfTopK(d, "doc_id", "toks", k = 2)
      .select("doc_id", "term", "tf", "df", "tfidf", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .groupBy(_._1)
    val doc1 = out(1L).sortBy(_._6)
    assert(doc1.map(r => (r._2, r._3, r._4)) === Seq(("alpha", 2L, 1L), ("common", 2L, 3L)))
    // alpha: tf=2, idf=ln(4/2)+1; common: tf=2, idf=ln(4/4)+1=1
    val expAlpha = BigDecimal(2.0 * (math.log(4.0 / 2.0) + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(doc1.head._5 === expAlpha)
    assert(doc1(1)._5 === 2.0)
    assert(out(2L).head._2 === "beta", "unique term ranks first in doc 2")
  }

  test("ruleAblation: unique kill credit counts docs failing ONLY that rule") {
    // A fails r1 only; B fails r1+r2; C passes both
    val flags = Seq(
      ("A", false, true),
      ("B", false, false),
      ("C", true, true)
    ).toDF("doc_id", "r1", "r2")
    val got = TextAnalysis.ruleAblation(flags, Seq("r1", "r2"))
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("r1", 2L, 1L, 0.666667),   // A+B flagged; only A fails r1 alone
      ("r2", 1L, 0L, 0.333333)))  // B flagged, but B also fails r1
    spark.catalog.clearCache()
  }
}
