package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Composite training-data pipeline: the operators composed the way a
  * real corpus-cleaning job chains them — exact dedup → quality
  * scoring → language ID → admission filters — declared as ONE
  * oracle-checked query to prove the composition, not just the parts.
  * Every stage is per-row or one hash aggregate; the only shuffles are
  * the dedup group-by and the survivor semi-join.
  */
object PipelineQueries {
  val MinScore = 0.55
  val MinTokens = 12
  val MaxTokens = 95

  def cleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val survivors = Dedup.exact(docs, "doc_id", "text").select("doc_id")
    val kept = docs.join(survivors, Seq("doc_id"), "left_semi")
    val quality = TextAnalysis.qualityScore(kept, "doc_id", "text")
    val lang = TextAnalysis.langId(kept, "doc_id", "text")
      .select(col("doc_id"), col("predicted_lang"))
    quality
      .join(lang, "doc_id")
      .filter(col("score") >= MinScore &&
        col("n_tokens").between(MinTokens, MaxTokens))
      .select(col("doc_id"), col("predicted_lang"), col("n_tokens"),
        round(col("score"), 6).as("score"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean_corpus" -> (cleanCorpus _))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  val oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" -> {
      val langScores = TextAnalysis.LangProfiles.map { case (lang, stop) =>
        s"""SELECT doc_id, '$lang' AS lang,
           |  CAST(len(list_filter(w, x -> x IN ${inList(stop)})) AS DOUBLE) / len(w) AS lscore
           |FROM t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |kept AS (SELECT d.* FROM documents d WHERE EXISTS
         |         (SELECT 1 FROM surv WHERE surv.doc_id = d.doc_id)),
         |t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM kept),
         |q AS (SELECT doc_id,
         |  CAST(len(w) AS INTEGER) AS n_tokens,
         |  CAST(len(list_filter(w, x -> x IN ${inList(TextAnalysis.EnStopwords)})) AS DOUBLE) / len(w) AS stop_ratio,
         |  CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |  CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS avg_len
         |FROM t),
         |sc AS (SELECT doc_id, n_tokens,
         |  stop_ratio * 0.3 + (1.0 - punct_ratio) * 0.4 + least(avg_len / 10.0, 1.0) * 0.3 AS score
         |FROM q),
         |ls AS ($langScores),
         |pl AS (SELECT doc_id, lang AS predicted_lang FROM
         |       (SELECT doc_id, lang, row_number() OVER
         |          (PARTITION BY doc_id ORDER BY lscore DESC, lang) AS rn FROM ls)
         |       WHERE rn = 1)
         |SELECT sc.doc_id, pl.predicted_lang, sc.n_tokens, round(sc.score, 6) AS score
         |FROM sc JOIN pl ON sc.doc_id = pl.doc_id
         |WHERE sc.score >= $MinScore AND sc.n_tokens BETWEEN $MinTokens AND $MaxTokens
         |ORDER BY sc.doc_id""".stripMargin
    })
}
