package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.tok.Tokenizer
import graft.wc.WordCount

/** The reference's own query surface (SURVEY §2.1 O1–O11): case-insensitive,
  * delimiter-tokenized word count over `documents.text`, plus the top-k and
  * per-group variants that exercise its sort/limit edges.
  */
object WordCountQueries {

  /** The shared tokenizer regex, valid for both Java regex and DuckDB RE2. */
  private val Re = Tokenizer.DefaultSplitRegex
  /** SQL single-quote escape for embedding the regex in oracle strings. */
  private def sq(s: String): String = s.replace("'", "''")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc_words" -> ((s, dir) =>
      WordCount.fromText(Tables.table(s, dir, "documents"), "text")),
    "wc_topk" -> ((s, dir) =>
      WordCount.fromText(Tables.table(s, dir, "documents"), "text")
        .orderBy(desc("cnt"), asc("word")).limit(20)),
    "wc_per_lang" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("lang"),
          explode(Tokenizer.lowerTokens(col("text"))).as("word"))
        .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "word")),
  )

  val oracles: Map[String, String] = Map(
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
