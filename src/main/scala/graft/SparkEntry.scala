package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tok.Tokenizer
import graft.wc.WordCount

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2's inventory wired
  * to the driver's parquet fixtures; [[oracleSql]] carries the equivalent
  * ANSI SQL the driver runs in DuckDB over the same tables. Column names and
  * row order are kept identical on both sides (total ORDER BY everywhere).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The shared tokenizer regex, valid for both Java regex and DuckDB RE2. */
  private val Re = Tokenizer.DefaultSplitRegex
  /** SQL single-quote escape for embedding the regex in oracle strings. */
  private def sq(s: String): String = s.replace("'", "''")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("wc_words")(spark, "/root/testdata/sf0.001")

  /** Headline queries Bench times (subset of [[queries]]; keep it the
    * representative-per-operator-family list, not the full map, so the
    * sf0.1 bench stays a minutes-scale signal rather than an hour). */
  def benchQueries: Seq[String] = queries.keys.toSeq.sorted

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── The reference's own pipeline (SURVEY §2.1 O1–O11) ────────────────
    "wc_words" -> ((s, dir) =>
      WordCount.fromText(t(s, dir, "documents"), "text")),
    "wc_topk" -> ((s, dir) =>
      WordCount.fromText(t(s, dir, "documents"), "text")
        .orderBy(desc("cnt"), asc("word")).limit(20)),
    "wc_per_lang" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          explode(Tokenizer.lowerTokens(col("text"))).as("word"))
        .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "word")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "wc_words" ->
      s"""SELECT word, count(*) AS cnt
          FROM (SELECT unnest(string_split_regex(lower(text), '${sq(Re)}')) AS word
                FROM documents)
          WHERE word <> '' GROUP BY word ORDER BY word""",
    "wc_topk" ->
      s"""SELECT word, count(*) AS cnt
          FROM (SELECT unnest(string_split_regex(lower(text), '${sq(Re)}')) AS word
                FROM documents)
          WHERE word <> '' GROUP BY word
          ORDER BY cnt DESC, word ASC LIMIT 20""",
    "wc_per_lang" ->
      s"""SELECT lang, word, count(*) AS cnt
          FROM (SELECT lang, unnest(string_split_regex(lower(text), '${sq(Re)}')) AS word
                FROM documents)
          WHERE word <> '' GROUP BY lang, word ORDER BY lang, word""",
  )
}
