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
  * DECODE: PNG and JPEG payloads take a REAL `javax.imageio` decode
  * to integer luminance ([[decodeImage]] — the JDK ships both codecs,
  * no external dependency; MultimodalSpec drives it with
  * ImageIO-written PNGs and JPEGs end to end). Everything else — the
  * fixture's UTF-8 stand-in blobs, formats this JVM cannot read —
  * falls back to the deterministic byte-stream fake [[decodeStub]],
  * so declared-query outputs stay byte-reproducible. The Spark-side
  * plumbing — schema, partitioning, batch shape, kernel signatures —
  * is identical on both paths; an ffmpeg video codec would change
  * only [[decode]].
  *
  * Scale: all kernels are per-row/per-partition (zero shuffle); blobs
  * never leave their partition, only fixed-width features do.
  */
object Multimodal {

  // ImageIO's default ImageInputStream/ImageOutputStream cache is
  // DISK-backed: every encode/decode call creates, writes and deletes
  // a temp FILE. Our codecs only ever run over in-memory byte arrays
  // (payload columns), so the file cache is pure overhead — measured
  // r17: mm_decode_roundtrip 2.15 s → 0.42 s at sf0.1 single-task,
  // and under 32-way parallelism the per-call temp files contend on
  // the filesystem (5.2 s → 0.32 s). The object initializer runs once
  // per JVM wherever a kernel first touches this object (executors
  // included — every kernel closure references Multimodal).
  javax.imageio.ImageIO.setUseCache(false)

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

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  def isPng(blob: Array[Byte]): Boolean =
    blob.length >= PngMagic.length &&
      java.util.Arrays.equals(blob, 0, PngMagic.length, PngMagic, 0, PngMagic.length)

  /** JPEG SOI marker + third 0xFF (every JFIF/EXIF/raw-JPEG variant
    * starts FF D8 FF) — the same cheap prefix sniff as [[isPng]]. */
  def isJpeg(blob: Array[Byte]): Boolean =
    blob.length >= 3 &&
      (blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8 && (blob(2) & 0xff) == 0xff

  /** REAL decoder for PNG and JPEG payloads: `javax.imageio` (the JDK
    * ships both codecs — no external dependency) → row-major integer
    * luminance (BT.601 integer weights, deterministic:
    * (299·R + 587·G + 114·B) / 1000). `ImageIO.read` dispatches on
    * content, so one body serves both formats. Null for bytes ImageIO
    * rejects. */
  def decodeImage(blob: Array[Byte]): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        px(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    px
  }

  /** Dispatching decoder — the function every kernel calls: REAL
    * ImageIO decode for payloads that are PNGs or JPEGs (magic-byte
    * sniff), the deterministic byte-stream fake otherwise (the
    * fixture's UTF-8 stand-in blobs, or any codec this JVM lacks — so
    * the declared queries stay byte-reproducible while genuinely-image
    * payloads take the real path; MultimodalSpec drives it with
    * ImageIO-written PNGs and JPEGs end to end). An undecodable image
    * degrades to the fake rather than nulling the row — a corrupt
    * blob at corpus scale should yield a degenerate feature, not kill
    * the job. */
  def decode(blob: Array[Byte]): Array[Int] =
    if (isPng(blob) || isJpeg(blob)) {
      // NonFatal, not just IOException: ImageIO's readers throw
      // unchecked exceptions (IndexOutOfBounds/NegativeArraySize/
      // IllegalArgument) on crafted chunk data — the degrade-to-stub
      // contract must hold for those too, or one malformed blob kills
      // the whole scan
      val px = try decodeImage(blob)
        catch { case scala.util.control.NonFatal(_) => null }
      if (px != null) px else decodeStub(blob)
    } else decodeStub(blob)

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
            val px = decode(blob)
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

  /** SHARED-SEGMENT DETECTION across payloads — the copy-detection
    * reduction over [[frameSample]]'s rolling-hash frames: every
    * frame fingerprint that occurs in MORE THAN ONE distinct payload,
    * with its payload count, total occurrences, and the first/last
    * payload ids — how reused intros, watermarks, and syndicated
    * segments surface in a video/audio corpus without any pairwise
    * comparison. Scale: the frame stream (bytes/stride rows) shuffles
    * once on the fingerprint (map-side partials; the distinct-doc
    * count is the standard two-phase distinct agg), and the output is
    * shared-fingerprints-only — collision-bounded, not corpus-sized. */
  def sharedFrames(blobs: DataFrame, frameLen: Int = 16, stride: Int = 64): DataFrame =
    frameSample(blobs, frameLen, stride)
      .groupBy("frame_fp")
      .agg(countDistinct("id").as("n_docs"), count(lit(1)).as("n_occurrences"),
        min("id").as("first_doc"), max("id").as("last_doc"))
      .filter(col("n_docs") > 1)

  /** SCENE-CHANGE SEGMENTATION over a payload's ordered frame stream
    * (r12) — the shot-boundary pass a video pipeline runs before
    * frame-sampling training data (sample k frames PER SCENE, not per
    * second, or you oversample static shots): frames are the same
    * stride-`stride` windows [[frameSample]] cuts, each summarized by
    * its exact integer byte sum (the content feature — a rolling HASH
    * flips entirely on any byte change, so hash inequality cannot
    * grade change magnitude; the sum is the stand-in for a real
    * frame-histogram distance, per the repo's stubbed-decode
    * doctrine), and a scene boundary falls wherever the absolute
    * difference between consecutive frame sums exceeds `threshold`.
    * Output per payload: n_frames, n_scenes, max_scene_frames.
    *
    * Scale: the frame stream is bytes/stride rows; ONE id-keyed
    * window exchange (lag + running scene id — the sessionize shape),
    * then payload-bounded aggregates. All integer arithmetic —
    * hash-exact in any engine. */
  def sceneChanges(blobs: DataFrame, frameLen: Int = 16, stride: Int = 64,
                   threshold: Long = 200L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = blobs.sparkSession
    import spark.implicits._
    val feats = blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        Iterator.range(0, blob.length, stride).zipWithIndex.map { case (off, k) =>
          val end = math.min(off + frameLen, blob.length)
          var s = 0L
          var i = off
          while (i < end) { s += (blob(i) & 0xff); i += 1 }
          (id, k, s)
        }
      }.toDF("id", "frame_idx", "fsum")
    val w = Window.partitionBy("id").orderBy("frame_idx")
    val scenes = feats
      .withColumn("nw", when(lag("fsum", 1).over(w).isNull ||
        abs(col("fsum") - lag("fsum", 1).over(w)) > threshold, 1L).otherwise(0L))
      .withColumn("scene", sum("nw").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("id", "scene").agg(count(lit(1)).as("nf"))
    scenes.groupBy("id")
      .agg(sum("nf").as("n_frames"), count(lit(1)).as("n_scenes"),
        max("nf").as("max_scene_frames"))
  }

  /** AUDIO ACTIVITY PROFILE over an opaque payload — the framing +
    * energy + zero-crossing front-end every speech/audio ingest
    * pipeline runs before anything else (VAD gating, silence
    * trimming, frame sampling for training). Decode is the repo's
    * stubbed-decode doctrine ([[decodeStub]]): payload bytes are
    * read as unsigned 8-bit samples CENTERED AT 64 — real PCM
    * centers at 128, but the fixture payloads are ASCII text bytes
    * (all < 128), so a 128 midline would make the crossing feature
    * identically zero on every payload; the 64 midline is part of
    * the stub contract (disclosed), keeping both features live while
    * every op stays exact integer arithmetic any engine replays.
    *
    * Per non-overlapping `frameLen`-sample frame: energy = Σ(sample −
    * 64)² (≤ 191²·frameLen — BIGINT-safe by orders of magnitude) and
    * crossings = #{i : (sᵢ ≥ 64) ≠ (sᵢ₊₁ ≥ 64)} within the frame.
    * Per payload: frame count, active-frame count (energy >
    * `energyThreshold` — the VAD decision), total/max energy, total
    * crossings.
    *
    * Scale: the frame stream is bytes/frameLen rows computed in one
    * codegen-friendly pass over the payload column (no shuffle until
    * the payload-keyed partial/final aggregate — map-side combine
    * collapses each payload's frames before the exchange, so ≤ one
    * row per payload per partition moves). */
  def audioActivity(blobs: DataFrame, frameLen: Int = 16,
                    energyThreshold: Long = 29000L): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = blobs.sparkSession
    import spark.implicits._
    val feats = blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        Iterator.range(0, blob.length, frameLen).map { off =>
          val end = math.min(off + frameLen, blob.length)
          var energy = 0L
          var zcr = 0L
          var i = off
          while (i < end) {
            val s = (blob(i) & 0xff) - 64
            energy += s.toLong * s
            if (i + 1 < end) {
              val a = (blob(i) & 0xff) >= 64
              val b = (blob(i + 1) & 0xff) >= 64
              if (a != b) zcr += 1
            }
            i += 1
          }
          (id, energy, zcr)
        }
      }.toDF("id", "energy", "zcr")
    feats.groupBy("id").agg(
      count(lit(1)).as("n_frames"),
      sum(when(col("energy") > energyThreshold, 1L).otherwise(0L)).as("n_active"),
      sum(col("energy")).as("energy_total"),
      max(col("energy")).as("energy_max"),
      sum(col("zcr")).as("zcr_total"))
  }

  /** AUDIO FRAME-ENERGY VECTORS — the fixed-width feature hand-off
    * from the VAD front-end ([[audioActivity]]) into the similarity
    * family (r14 verdict task 6; the image family's trajectory:
    * decode → [[mosaicVectors]] → [[patchKnn]], now decode →
    * frame energies → kNN for the audio modality). Per payload: the
    * energies of its first `nFrames` non-overlapping
    * `frameLen`-sample frames — energy = Σ(sample − 64)², the VAD's
    * exact integer feature, the same midline-64 stub-decode contract
    * — as a fixed `nFrames`-long BIGINT vector; a partial trailing
    * frame sums its remaining samples and frames past the payload
    * end contribute 0 (the [[mosaicVectors]] zero-padded-prefix
    * discipline applied to the time axis: at frameLen 16 × 64 frames
    * the window is the payload's first 1 KiB).
    *
    * Scale: one codegen-friendly pass over the payload column, no
    * shuffle, nFrames longs out per payload — embarrassingly
    * parallel feature extraction whose output feeds the
    * broadcast/bounded-heap kNN kernel ([[patchKnn]]) or any ANN
    * family member. Every value is exact integer arithmetic any
    * engine replays. */
  def audioFrameVectors(blobs: DataFrame, frameLen: Int = 16,
                        nFrames: Int = 64): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        val v = new Array[Long](nFrames)
        var k = 0
        while (k < nFrames) {
          val off = k * frameLen
          val end = math.min(off + frameLen, blob.length)
          var e = 0L
          var i = off
          while (i < end) {
            val s = (blob(i) & 0xff) - 64
            e += s.toLong * s
            i += 1
          }
          v(k) = e
          k += 1
        }
        (id, v)
      }.toDF("id", "v")
  }

  /** AUDIO FINGERPRINT — the [[averageHash]] thresholding discipline
    * applied to the TIME axis (r15 verdict task 4): bit j of a 64-bit
    * fingerprint is set when frame j's energy ([[audioFrameVectors]]'s
    * exact integer feature) exceeds the payload's mean frame energy
    * (integer floor of sum/nFrames — the aHash mean rule). Two
    * payloads whose loud/quiet frame PATTERN matches fingerprint
    * alike even when absolute levels differ — the shape a re-encoded
    * or gain-shifted copy keeps. Emitted as two non-negative BIGINT
    * halves (lo = bits 0–31, hi = bits 32–63), the [[averageHash]]
    * convention, so the SAME banded-Hamming join
    * ([[ahashNearDupPairs]] — the 4×16-bit pigeonhole split, exact
    * for distance ≤ 3) serves both modalities unchanged.
    *
    * Scale: a per-row integer kernel over the already-extracted
    * frame-energy vectors, zero shuffle; 2 longs out per payload.
    * Mean-sum bound: ≤ 64 frames × 191²·16 < 2.4·10⁹ — five orders
    * inside BIGINT. */
  def audioFingerprint(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col("id").cast("long"), col("v"))
      .as[(Long, Array[Long])]
      .map { case (id, v) =>
        // the oracle's mean divisor is the fixed 64-frame window; a
        // caller passing any other frame count would silently diverge
        // from that contract (and an empty vector would divide by
        // zero), so the kernel requires the documented width
        require(v.length == 64,
          s"audioFingerprint expects exactly 64 frame energies, got ${v.length}")
        val mean = v.sum / v.length
        var lo = 0L; var hi = 0L
        var j = 0
        while (j < v.length && j < 64) {
          if (v(j) > mean) {
            if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
          }
          j += 1
        }
        (id, hi, lo)
      }.toDF("id", "ahash_hi", "ahash_lo")
  }

  /** Minimal RIFF/WAVE encoder — 16-bit PCM mono, little-endian
    * (r15 verdict task 8: the audio modality's REAL container
    * format, the [[encodeGrayPng]] role one modality over): each
    * payload byte b becomes the sample (b − 64)·256 — the midline-64
    * stub-decode contract lifted into a real signal, so everything
    * the parser reads back is exact integer arithmetic an SQL oracle
    * replays. Truncated/zero-padded to `nSamples` (the
    * [[encodeGrayPng]] prefix discipline on the time axis). */
  def encodeWav(bytes: Array[Byte], nSamples: Int,
                sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples >= 0, s"nSamples must be >= 0, got $nSamples")
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = if (i < bytes.length) ((bytes(i) & 0xff) - 64) * 256 else 0
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + data.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(data.length); bb.put(data)
    bb.array()
  }

  /** True when the blob carries the RIFF/WAVE magic — the audio
    * twin of the PNG/JPEG sniff [[decode]] dispatches on. */
  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** RIFF/WAVE parser — a REAL container decode in pure JVM (header
    * sniff + chunk walk + little-endian 16-bit PCM sample read; no
    * codec library). Returns (sampleRate, nChannels, samples).
    * Unknown chunks are skipped by their declared size (the RIFF
    * contract), so files with LIST/fact chunks parse too. Throws on
    * non-RIFF input — callers dispatch on [[isWav]] first, the
    * [[decode]] magic-byte discipline. */
  def decodeWav(wav: Array[Byte]): (Int, Int, Array[Int]) = {
    require(isWav(wav), "not a RIFF/WAVE container")
    val bb = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0
    var nChannels = 0
    var bitsPerSample = 0
    var samples: Array[Int] = null
    while (pos + 8 <= wav.length) {
      val id = new String(wav, pos, 4, "US-ASCII")
      val size = bb.getInt(pos + 4)
      // a corrupt/hostile declared size must fail loudly, not hang the
      // executor: a negative size would make the `pos` advance a no-op
      // (infinite loop) or reach the data branch as a negative array
      // length — the parser is advertised for sniff-dispatch over
      // arbitrary blobs, so the chunk walk validates what it reads
      require(size >= 0,
        s"RIFF chunk '$id' declares negative size $size at offset $pos")
      if (id == "fmt " && pos + 8 + 16 <= wav.length) {
        nChannels = bb.getShort(pos + 10).toInt
        sampleRate = bb.getInt(pos + 12)
        bitsPerSample = bb.getShort(pos + 22).toInt
      } else if (id == "data") {
        require(bitsPerSample == 16,
          s"only 16-bit PCM supported, got $bitsPerSample-bit")
        val n = math.min(size, wav.length - pos - 8) / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) = bb.getShort(pos + 8 + 2 * i).toInt
          i += 1
        }
        samples = out
      }
      pos += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    require(samples != null, "RIFF/WAVE container has no data chunk")
    (sampleRate, nChannels, samples)
  }

  /** Real-container audio round-trip kernel (the [[decodeRoundtrip]]
    * discipline for the audio modality): per row, WAV-ENCODE the
    * payload prefix ([[encodeWav]]) and parse it back through the
    * magic-dispatched [[decodeWav]] — the sniff selects the real
    * parser path by construction, so the declared query exercises
    * encode AND decode of a real container with an exact DuckDB
    * oracle (sample i = (byte_i − 64)·256; energy divides the ·256
    * back out, so it equals the VAD's Σ(b − 64)² exactly). Output:
    * (id, sample_rate, n_channels, n_samples, sum_samples, energy).
    * Batched, zero shuffle — blobs never leave their partition. */
  def audioRoundtrip(blobs: DataFrame, nSamples: Int = 256,
                     sampleRate: Int = 8000,
                     batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blob) =>
            val (sr, nc, s) = decodeWav(encodeWav(blob, nSamples, sampleRate))
            var sum = 0L; var energy = 0L
            var i = 0
            while (i < s.length) {
              sum += s(i)
              val v = (s(i) / 256).toLong
              energy += v * v
              i += 1
            }
            (id, sr, nc, s.length, sum, energy)
          }
        }
      }
      .toDF("id", "sample_rate", "n_channels", "n_samples",
        "sum_samples", "energy")
  }

  /** DECODED-PATH frame-energy features (r16 verdict task 4 — the
    * image family's decode-roundtrip-feeds-the-real-kernel discipline
    * applied to audio): per row, WAV-encode the payload's first
    * `frameLen·nFrames` samples ([[encodeWav]]) and parse them back
    * through the magic-dispatched [[decodeWav]]; the frame energies
    * are computed over the PARSED samples (Σ sample² per frame — the
    * midline removal already happened inside the encoder), so the
    * audio eval family's feature kernel runs real-container
    * end-to-end, not over stub payload bytes. Under the encode
    * contract (sample = (byte − 64)·256, zero-padded past the
    * payload) each frame energy is EXACTLY 256² × the stub kernel's
    * Σ(b − 64)², and the mean-threshold fingerprint downstream is
    * bit-identical to the stub path's — the scale cancels in the
    * comparison (spec-pinned). Domain note: the relation holds on
    * the encode contract's wrap-free byte range [0, 191] — every
    * ASCII text payload; a byte ≥ 192 maps past Short.MaxValue and
    * wraps in the 16-bit PCM container (the roundtrip family's
    * disclosed int16 domain). Batched like the other real-codec
    * kernels; zero shuffle, blobs never leave their partition. */
  def audioFrameVectorsDecoded(blobs: DataFrame, frameLen: Int = 16,
                               nFrames: Int = 64, sampleRate: Int = 8000,
                               batchSize: Int = DefaultBatchSize): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blob) =>
            val (_, _, s) =
              decodeWav(encodeWav(blob, frameLen * nFrames, sampleRate))
            val v = new Array[Long](nFrames)
            var k = 0
            while (k < nFrames) {
              var e = 0L
              var i = k * frameLen
              val end = math.min((k + 1) * frameLen, s.length)
              while (i < end) {
                e += s(i).toLong * s(i)
                i += 1
              }
              v(k) = e
              k += 1
            }
            (id, v)
          }
        }
      }.toDF("id", "v")
  }

  /** Encode the first `side`² payload bytes as a `side`×`side`
    * grayscale PNG (zero-padded) — a REAL ImageIO encode producing
    * blobs the real decode path reads back. Gray pixels make the
    * BT.601 integer luminance the identity (299 + 587 + 114 = 1000,
    * so (1000·v)/1000 = v exactly), and PNG is lossless — decoded
    * features are exact byte arithmetic an SQL oracle can replay. */
  def encodeGrayPng(bytes: Array[Byte], side: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < side * side) {
      val v = if (i < bytes.length) bytes(i) & 0xff else 0
      img.setRGB(i % side, i / side, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real-codec round-trip feature kernel: per row, PNG-ENCODE the
    * payload prefix ([[encodeGrayPng]]) and push the result through
    * the dispatching [[decode]] — the magic-byte sniff selects the
    * REAL ImageIO path, so the declared `mm_decode_roundtrip` query
    * exercises encode AND decode with an exact DuckDB oracle (the
    * stub path can't fire: the blob IS a PNG by construction).
    * Output: (id, n_px = side², sum_lum = Σ luminance, n_nonzero).
    * Batched like the other kernels — a real codec amortizes setup
    * per batch; zero shuffle, blobs never leave their partition. */
  def decodeRoundtrip(blobs: DataFrame, side: Int = 8,
                      batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blob) =>
            val px = decode(encodeGrayPng(blob, side))
            var sum = 0L; var nz = 0
            px.foreach { v => sum += v; if (v != 0) nz += 1 }
            (id, px.length, sum, nz)
          }
        }
      }
      .toDF("id", "n_px", "sum_lum", "n_nonzero")
  }

  /** AVERAGE-HASH (aHash) perceptual fingerprint through the REAL
    * codec: PNG-encode the payload prefix as a `side`×`side` gray
    * image ([[encodeGrayPng]]), decode it back via the dispatching
    * [[decode]] (the sniff selects the real ImageIO path — the blob
    * IS a PNG), downsample to a `grid`×`grid` mosaic by integer block
    * mean (floor), and set bit j when block j's mean exceeds the
    * mosaic's overall mean — the standard perceptual near-dup
    * fingerprint, here bit-exact: gray+lossless makes the decode the
    * identity, so every step is integer byte arithmetic a SQL oracle
    * replays. The 64 bits are emitted as two non-negative BIGINT
    * halves (lo = bits 0-31, hi = bits 32-63) — a single int64 would
    * go negative on bit 63 and engines disagree on shift overflow.
    *
    * Scale: per-row kernel, zero shuffle; downstream grouping shuffles
    * 2 longs per image, never pixels. */
  def averageHash(blobs: DataFrame, side: Int = 16, grid: Int = 8,
                  batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val block = side / grid
    require(side % grid == 0, s"side $side not a multiple of grid $grid")
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blob) =>
            val px = decode(encodeGrayPng(blob, side))
            val nB = grid * grid
            val bm = new Array[Long](nB)
            var j = 0
            while (j < nB) {
              val by = (j / grid) * block; val bx = (j % grid) * block
              var s = 0L; var dy = 0
              while (dy < block) {
                var dx = 0
                while (dx < block) { s += px((by + dy) * side + bx + dx); dx += 1 }
                dy += 1
              }
              bm(j) = s / (block * block)
              j += 1
            }
            val mean = bm.sum / nB
            var lo = 0L; var hi = 0L
            j = 0
            while (j < nB) {
              if (bm(j) > mean) {
                if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
              }
              j += 1
            }
            (id, hi, lo)
          }
        }
      }
      .toDF("id", "ahash_hi", "ahash_lo")
  }

  /** Banded-Hamming near-duplicate candidate join over aHash
    * fingerprints — the image twin of MinHash-LSH banding, with a
    * stronger guarantee: splitting the 64-bit hash into 4 disjoint
    * 16-bit bands makes the band join EXACT for Hamming distance ≤ 3
    * (pigeonhole: ≤ 3 differing bits cannot touch all 4 bands), so
    * unlike probabilistic LSH there is no recall loss at the default
    * radius. Exact-duplicate images are collapsed FIRST (group by the
    * full hash, keep count + min-id exemplar) and the join runs over
    * DISTINCT hash values — at 100 TB the million-fold-repeated blank
    * frame is one row with n_docs = 10⁹, not a quadratic bucket bomb;
    * bucket width is bounded by hash diversity, not corpus size.
    * Candidate pairs shuffle on (band_idx, band_val) — 4 rows of 5
    * longs per distinct hash — and the verify step is 2 xors + 2
    * popcounts per candidate, no pixel ever crossing the wire.
    * Requires maxDist < 4; a larger radius needs more bands (8×8-bit
    * gives exactness to distance 7 — same code, different split). */
  def ahashNearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, s"4x16-bit banding is only exact for maxDist <= 3, got $maxDist")
    val dh = hashes.groupBy("ahash_hi", "ahash_lo")
      .agg(count(lit(1)).as("n_docs"), min("id").as("exemplar_doc"))
    val bands = dh.select(col("ahash_hi"), col("ahash_lo"), col("n_docs"),
        col("exemplar_doc"),
        explode(array((0 until 4).map { j =>
          val src = if (j < 2) col("ahash_lo") else col("ahash_hi")
          struct(lit(j).as("band_idx"),
            (shiftright(src, 16 * (j % 2)) % 65536).as("band_val"))
        }: _*)).as("b"))
      .select(col("ahash_hi"), col("ahash_lo"), col("n_docs"), col("exemplar_doc"),
        col("b.band_idx"), col("b.band_val"))
    val a = bands.select(col("band_idx"), col("band_val"),
      col("ahash_hi").as("hi_a"), col("ahash_lo").as("lo_a"),
      col("n_docs").as("n_a"), col("exemplar_doc").as("doc_a"))
    val b = bands.select(col("band_idx"), col("band_val"),
      col("ahash_hi").as("hi_b"), col("ahash_lo").as("lo_b"),
      col("n_docs").as("n_b"), col("exemplar_doc").as("doc_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("hi_a") < col("hi_b") ||
        (col("hi_a") === col("hi_b") && col("lo_a") < col("lo_b")))
      .select("doc_a", "doc_b", "n_a", "n_b", "hi_a", "lo_a", "hi_b", "lo_b")
      .distinct()
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "n_a", "n_b", "hamming")
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

  /** INTEGER MOSAIC FEATURE VECTOR — the grid²-dim block-mean vector
    * the aHash thresholds ([[averageHash]]'s `bm` array) exposed as a
    * perceptual EMBEDDING: same real codec path (PNG encode →
    * ImageIO decode → integer block means), no thresholding — the
    * untruncated features a visual k-NN ranks on. Every component is
    * an exact integer, so downstream distances are BIGINT arithmetic
    * a SQL oracle replays bit-for-bit (no float embedding model in
    * this container — the mosaic is the deterministic stand-in with a
    * real decode in the loop). Per-row kernel, zero shuffle. */
  def mosaicVectors(blobs: DataFrame, side: Int = 16, grid: Int = 8,
                    batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val block = side / grid
    require(side % grid == 0, s"side $side not a multiple of grid $grid")
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blob) =>
            val px = decode(encodeGrayPng(blob, side))
            val nB = grid * grid
            val bm = new Array[Long](nB)
            var j = 0
            while (j < nB) {
              val by = (j / grid) * block; val bx = (j % grid) * block
              var s = 0L; var dy = 0
              while (dy < block) {
                var dx = 0
                while (dx < block) { s += px((by + dy) * side + bx + dx); dx += 1 }
                dy += 1
              }
              bm(j) = s / (block * block)
              j += 1
            }
            (id, bm)
          }
        }
      }
      .toDF("id", "mosaic")
  }

  /** VISUAL k-NN over mosaic vectors — exact top-k by INTEGER squared
    * euclidean distance (ties toward the lower neighbor id, self
    * excluded): the multimodal face of [[graft.operators.Similarity]]'s
    * brute-force baseline, with the same distributed shape (queries
    * broadcast, bounded per-partition heaps, only Q·k·numPartitions
    * candidates shuffle to the global rank) and a stronger determinism
    * story — distances are BIGINT sums of squared byte-scale ints
    * (≤ 64·255² per pair), so there is no float to round anywhere. */
  def patchKnn(mosaics: DataFrame, queries: Array[(Long, Array[Long])],
               k: Int, vecCol: String = "mosaic"): DataFrame = {
    val spark = mosaics.sparkSession
    import spark.implicits._
    val qb = spark.sparkContext.broadcast(queries)
    val p = mosaics.select(col("id").cast("long"), col(vecCol))
      .as[(Long, Array[Long])]
    val partial = p.mapPartitions { iter =>
      val qs = qb.value
      val ord = Ordering.Tuple2(Ordering[Long], Ordering[Long])
      val heaps = qs.map(_ => new graft.functions.BoundedTopK[(Long, Long)](k, ord))
      iter.foreach { case (id, v) =>
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv) = qs(qi)
          if (id != qid) {
            var d = 0L; var i = 0
            while (i < qv.length) { val t = qv(i) - v(i); d += t * t; i += 1 }
            heaps(qi).offer((d, id))
          }
          qi += 1
        }
      }
      qs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
        heaps(qi).iterator.map { case (d, id) => (qid, id, d) }
      }
    }.toDF("query_id", "neighbor_id", "sqdist")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("sqdist").asc, col("neighbor_id"))
    partial
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sqdist"))
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
        val px = decode(blob)
        val h = new Array[Float](bins)
        px.foreach(p => h(p % bins) += 1f)
        val len = math.max(px.length, 1).toFloat
        var i = 0
        while (i < bins) { h(i) /= len; i += 1 }
        (id, h)
      }
  }
}
