package graft.tok

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tokenizer semantics vs the reference contract (SURVEY §2.3 items 1–3):
  * the full 38-byte delimiter set, empty-token suppression, case folding,
  * and the delimiter-file loader (`tokenizer.c:6-45`).
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(s: String, regex: String = Tokenizer.DefaultSplitRegex): Seq[String] =
    Seq(s).toDF("t")
      .select(Tokenizer.tokens(col("t"), regex).as("toks"))
      .as[Seq[String]].head()

  test("delimiter set is exactly whitespace + the 32 distinct config bytes") {
    assert(Tokenizer.WhitespaceDelimiters === Set(' ', '\t', '\n', '\r'))
    assert(Tokenizer.DefaultConfigDelimiters.size === 32)
    assert(Tokenizer.DefaultDelimiters.size === 36)
  }

  test("default config delimiters byte-match the reference delimiters.txt") {
    val ref = java.nio.file.Paths.get("/root/reference/delimiters.txt")
    assume(java.nio.file.Files.exists(ref), "reference checkout not present")
    val bytes = java.nio.file.Files.readAllBytes(ref)
    assert(bytes.length === 34) // [ and ] listed twice in the file
    assert(bytes.map(b => (b & 0xff).toChar).toSet === Tokenizer.DefaultConfigDelimiters)
  }

  test("every one of the 36 delimiters splits a word pair (per-byte table)") {
    // the §5.2 per-delimiter table: for each delimiter d, "ab<d>cd" → [ab, cd]
    for (d <- Tokenizer.DefaultDelimiters)
      assert(tokensOf(s"ab${d}cd") === Seq("ab", "cd"), s"delimiter ${d.toInt}")
  }

  test("non-delimiter bytes never split: alphanumerics and non-ASCII pass through") {
    assert(tokensOf("abc123") === Seq("abc123"))
    assert(tokensOf("naïve café 東京") === Seq("naïve", "café", "東京"))
  }

  test("empty tokens are never emitted (leading/trailing/all-delimiter input)") {
    assert(tokensOf("  ,,hello..world!! ") === Seq("hello", "world"))
    assert(tokensOf(",.;: \t\r\n") === Seq.empty)
    assert(tokensOf("") === Seq.empty)
  }

  test("maximal-run semantics: consecutive mixed delimiters are one split") {
    assert(tokensOf("a,. \t-b") === Seq("a", "b"))
  }

  test("case folding: lowerTokens lowercases before emitting (hash_map.c:27-28)") {
    val toks = Seq("The QUICK brown FoX").toDF("t")
      .select(Tokenizer.lowerTokens(col("t")).as("toks"))
      .as[Seq[String]].head()
    assert(toks === Seq("the", "quick", "brown", "fox"))
  }

  test("charClassRegex escapes class-special chars and is valid Java regex") {
    val tricky = Set('\\', '^', ']', '[', '-', 'a')
    val re = Tokenizer.charClassRegex(tricky)
    // compiles, and splits exactly on those chars
    val p = java.util.regex.Pattern.compile(re)
    assert(p.matcher("\\^][-a").matches())
    assert(!p.matcher("b").find())
    assert(tokensOf("x\\y^z]w[v-u", re) === Seq("x", "y", "z", "w", "v", "u"))
  }

  test("charClassRegex rejects an empty delimiter set") {
    intercept[IllegalArgumentException] { Tokenizer.charClassRegex(Set.empty) }
  }

  test("delimitersFromFile: whitespace built-ins union config bytes (define_delimiters)") {
    val dir = tempDir("delims")
    writeFile(dir, "d.txt", "@#")
    val ds = Tokenizer.delimitersFromFile(dir.resolve("d.txt").toString)
    assert(ds === Set(' ', '\t', '\n', '\r', '@', '#'))
    // a char NOT in this set (e.g. comma) must not split
    val re = Tokenizer.charClassRegex(ds)
    assert(tokensOf("a,b@c d", re) === Seq("a,b", "c", "d"))
  }
}
