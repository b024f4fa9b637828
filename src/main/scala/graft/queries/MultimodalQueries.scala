package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.multimodal.Multimodal

/** Declared multimodal queries.
  *
  * The multimodal payloads are UTF-8 bytes of `documents.text` (ASCII
  * fixture ⇒ byte == codepoint), so even the binary-kernel outputs are
  * DuckDB-oracle-checkable: the oracle recomputes histograms / frame
  * fingerprints from the text characters.
  *
  * (The streaming parity queries live in [[StreamQueries]].)
  */
object MultimodalQueries {
  private val M = graft.functions.TextOps.FingerprintMod

  private def blobs(s: SparkSession, dir: String): DataFrame =
    Multimodal.packBlobs(Tables.documents(s, dir), "doc_id", "text")

  def histogram(s: SparkSession, dir: String): DataFrame =
    Multimodal.byteHistogram(blobs(s, dir))
      .select(col("id").as("doc_id"), col("bin"), col("n"),
        round(col("ratio"), 6).as("ratio"))
      .orderBy("doc_id", "bin")

  def frames(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(blobs(s, dir))
      .select(col("id").as("doc_id"), col("frame_idx"), col("frame_fp"))
      .orderBy("doc_id", "frame_idx")

  /** REAL-codec round-trip (round 6): every fixture payload is
    * PNG-encoded and decoded through the actual ImageIO path — the
    * first declared query where the real decoder (not the byte stub)
    * is DuckDB-hash-checked: gray pixels make BT.601 luminance the
    * identity, so the oracle is plain byte arithmetic over the text
    * prefix. */
  def decodeRoundtrip(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeRoundtrip(blobs(s, dir))
      .select(col("id").as("doc_id"), col("n_px"), col("sum_lum"), col("n_nonzero"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_byte_histogram" -> (histogram _),
    "mm_frame_fingerprints" -> (frames _),
    "mm_decode_roundtrip" -> (decodeRoundtrip _))

  val oracles: Map[String, String] = Map(
    "mm_byte_histogram" ->
      s"""WITH px AS (
         |  SELECT doc_id, length(text) AS len,
         |    unnest(list_transform(generate_series(1, length(text)),
         |           i -> ascii(substr(text, i, 1)) % ${Multimodal.HistogramBins})) AS bin
         |  FROM documents)
         |SELECT doc_id, bin, COUNT(*) AS n,
         |  round(CAST(COUNT(*) AS DOUBLE) / max(len), 6) AS ratio
         |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mm_frame_fingerprints" ->
      s"""WITH f AS (
         |  SELECT doc_id, CAST(t.k AS INTEGER) AS frame_idx,
         |    substr(text, CAST(t.k AS INTEGER) * 64 + 1, 16) AS frame
         |  FROM documents,
         |    (SELECT unnest(generate_series(0, 1000)) AS k) t
         |  WHERE t.k * 64 < length(text))
         |SELECT doc_id, frame_idx,
         |  CASE WHEN length(frame) = 0 THEN 0
         |       ELSE list_reduce(list_transform(generate_series(1, length(frame)),
         |              i -> CAST(ascii(substr(frame, i, 1)) AS BIGINT)),
         |              (a, b) -> (a * 31 + b) % $M)
         |  END AS frame_fp
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // 8×8 gray PNG of the first 64 text bytes (zero-padded): PNG is
    // lossless and gray luminance is the identity, so sum_lum is the
    // plain byte sum of the prefix; ASCII fixture ⇒ no NUL bytes ⇒
    // n_nonzero = min(len, 64). list_sum over INTEGERs binds HUGEINT
    // in DuckDB — CAST per the OracleTypesSpec guard.
    "mm_decode_roundtrip" ->
      """SELECT doc_id, 64 AS n_px,
        |  CAST(coalesce(list_sum(list_transform(
        |    generate_series(1, least(length(text), 64)),
        |    i -> ascii(substr(text, i, 1)))), 0) AS BIGINT) AS sum_lum,
        |  CAST(least(length(text), 64) AS INTEGER) AS n_nonzero
        |FROM documents ORDER BY doc_id""".stripMargin)
}
