package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction / resize / frame-sampling as batched
  * per-partition kernels (the Scala analogue of `mapInPandas`: rows
  * are processed in fixed-size batches inside each partition, so a
  * real decoder could amortize model/library setup per batch).
  *
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * [[decodeStub]] is a deterministic fake (byte stream → fake "pixel"
  * stream). The Spark-side plumbing — schema, partitioning, batch
  * shape, kernel signatures — is real and tested; swapping in a real
  * codec changes only the function body.
  *
  * Scale: all kernels are per-row/per-partition (zero shuffle); blobs
  * never leave their partition, only fixed-width features do.
  */
object Multimodal {

  val HistogramBins = 64
  val DefaultBatchSize = 256

  /** Build a multimodal table from a corpus: payload bytes (UTF-8 of
    * the text — stands in for an image payload) + typed metadata. */
  def packBlobs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("blob"),
      struct(
        lit("application/x-fake-image").as("mime"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: a real implementation would call an image library
    * (e.g. javax.imageio / ffmpeg) here; the deterministic fake maps
    * each payload byte to an unsigned "pixel" intensity. */
  def decodeStub(blob: Array[Byte]): Array[Int] = {
    val px = new Array[Int](blob.length)
    var i = 0
    while (i < blob.length) { px(i) = blob(i) & 0xff; i += 1 }
    px
  }

  /** Feature extraction: per-blob normalized byte histogram
    * (`bins` buckets, bucket = pixel % bins), emitted sparse.
    * Runs batched per partition. Output: (id, bin, n, ratio). */
  def byteHistogram(blobs: DataFrame, bins: Int = HistogramBins,
                    batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real decoder would run vectorized
          batch.iterator.flatMap { case (id, blob) =>
            val px = decodeStub(blob)
            val h = new Array[Long](bins)
            px.foreach(p => h(p % bins) += 1)
            val len = px.length.toDouble
            (0 until bins).iterator
              .filter(h(_) > 0)
              .map(b => (id, b, h(b), h(b) / len))
          }
        }
      }
      .toDF("id", "bin", "n", "ratio")
  }

  /** Frame sampling: cut the payload into `frameLen`-byte frames at
    * `stride` intervals (every stride/frameLen-th frame kept) and
    * fingerprint each with the rolling hash (mod 1e9+7) so downstream
    * dedup can run on frames. Output: (id, frame_idx, frame_fp). */
  def frameSample(blobs: DataFrame, frameLen: Int = 16, stride: Int = 64): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val M = graft.functions.TextOps.FingerprintMod
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        Iterator.range(0, blob.length, stride).zipWithIndex.map { case (off, k) =>
          val end = math.min(off + frameLen, blob.length)
          var fp = 0L
          var i = off
          while (i < end) { fp = (fp * 31 + (blob(i) & 0xff)) % M; i += 1 }
          (id, k, fp)
        }
      }
      .toDF("id", "frame_idx", "frame_fp")
  }

  /** Resize: truncate the payload to `maxBytes` and update metadata —
    * the stub stand-in for a real image resize kernel. */
  def resize(blobs: DataFrame, maxBytes: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .map { case (id, blob) => (id, blob.take(maxBytes)) }
      .toDF("id", "blob")
      .withColumn("meta", struct(
        lit("application/x-fake-image").as("mime"),
        (length(col("blob")) % 640).cast("int").as("width"),
        (length(col("blob")) % 480).cast("int").as("height"),
        length(col("blob")).cast("long").as("n_bytes")))
  }

  /** Embed: full fixed-width feature vector (dense histogram ratio
    * per bin) as array<float> — the hand-off into the similarity /
    * clustering operators. */
  def embed(blobs: DataFrame, bins: Int = HistogramBins): Dataset[(Long, Array[Float])] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        val px = decodeStub(blob)
        val h = new Array[Float](bins)
        px.foreach(p => h(p % bins) += 1f)
        val len = math.max(px.length, 1).toFloat
        var i = 0
        while (i < bins) { h(i) /= len; i += 1 }
        (id, h)
      }
  }
}
