package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val blobs =
    Multimodal.packBlobs(Tables.documents(spark, sf001), "doc_id", "text").cache()

  test("packBlobs: binary payload with typed metadata, n_bytes = text length") {
    val schema = blobs.schema
    assert(schema("blob").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val joined = blobs.join(Tables.documents(spark, sf001), col("id") === col("doc_id"))
    assert(joined.filter(col("meta.n_bytes") =!= col("n_chars")).count() === 0)
  }

  test("byte histogram: ratios per doc sum to 1") {
    val h = Multimodal.byteHistogram(blobs)
    val sums = h.groupBy("id").agg(sum("ratio").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
    assert(sums.count() === 0)
    assert(h.filter(col("n") <= 0).count() === 0)
  }

  test("decode stub is deterministic and maps bytes to 0..255") {
    val px = Multimodal.decodeStub("abc".getBytes("UTF-8"))
    assert(px.toSeq === Seq(97, 98, 99))
    val neg = Multimodal.decodeStub(Array(-1.toByte))
    assert(neg.toSeq === Seq(255))
  }

  /** A tiny RGB PNG written by ImageIO itself — the decode round-trip
    * is real-codec end to end, no fixture file needed. */
  private def pngBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG payloads take the real ImageIO decode to BT.601 luminance") {
    // 2x2: black, white, pure red, pure green — integer luminances
    // 0, 255, (299*255)/1000 = 76, (587*255)/1000 = 149
    val png = pngBytes(Array(
      Array(0x000000, 0xFFFFFF),
      Array(0xFF0000, 0x00FF00)))
    assert(Multimodal.isPng(png))
    assert(!Multimodal.isPng("plain text".getBytes("UTF-8")))
    assert(Multimodal.decode(png).toSeq === Seq(0, 255, 76, 149))
    // non-PNG payloads keep the byte-stream fake
    assert(Multimodal.decode("abc".getBytes("UTF-8")).toSeq === Seq(97, 98, 99))
    // corrupt PNG (magic intact, body truncated) degrades to the fake
    val corrupt = png.take(12)
    assert(Multimodal.decode(corrupt).toSeq ===
      Multimodal.decodeStub(corrupt).toSeq)
  }

  /** ImageIO-written JPEG (the JDK ships the codec) — lossy, so the
    * round-trip asserts dimensions + luminance tolerance, not bit
    * equality like the PNG test. */
  private def jpegBytes(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("JPEG payloads take the real ImageIO decode (dims exact, luminance within codec loss)") {
    // uniform mid-gray survives JPEG's DCT almost exactly: every
    // decoded luminance must be 128 within a small quantization band
    val gray = jpegBytes(Array.fill(8, 8)(0x808080))
    assert(Multimodal.isJpeg(gray))
    assert(!Multimodal.isJpeg("plain text".getBytes("UTF-8")))
    assert(!Multimodal.isPng(gray))
    val px = Multimodal.decode(gray)
    assert(px.length === 64) // 8x8 row-major — the REAL path, not the byte stub
    assert(px.forall(p => math.abs(p - 128) <= 3), s"luminance drifted: ${px.toSeq}")
    // corrupt JPEG (SOI marker intact, body truncated) degrades to the fake
    val corrupt = gray.take(6)
    assert(Multimodal.decode(corrupt).toSeq === Multimodal.decodeStub(corrupt).toSeq)
  }

  test("PNG blobs flow through the batched histogram kernel unchanged in shape") {
    import spark.implicits._
    val png = pngBytes(Array(Array(0x000000, 0xFFFFFF), Array(0xFF0000, 0x00FF00)))
    val df = Seq((1L, png), (2L, "not a png".getBytes("UTF-8")))
      .toDF("id", "blob")
    val h = Multimodal.byteHistogram(df, bins = 64)
    // luminances 0,255,76,149 -> bins 0, 63 (255%64), 12, 21 — each 1/4
    val row1 = h.filter(col("id") === 1).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(row1 === Map(0 -> 1L, 63 -> 1L, 12 -> 1L, 21 -> 1L))
    assert(h.filter(col("id") === 2).count() > 0)
  }

  test("encode→decode round-trip is exact byte arithmetic (real codec both ways)") {
    import spark.implicits._
    // gray PNG luminance is the identity, PNG lossless: sum_lum must
    // equal the plain byte sum of the 64-byte prefix, zero-padded
    val df = Seq((1L, "abc".getBytes("UTF-8")),
                 (2L, Array.fill[Byte](100)(65)), // 100 bytes, truncated at 64
                 (3L, Array.emptyByteArray))
      .toDF("id", "blob")
    val r = Multimodal.decodeRoundtrip(df, side = 8).collect()
      .map(x => (x.getLong(0), (x.getInt(1), x.getLong(2), x.getInt(3)))).toMap
    assert(r(1L) === ((64, 97L + 98L + 99L, 3)))
    assert(r(2L) === ((64, 64L * 65L, 64)))
    assert(r(3L) === ((64, 0L, 0)))
    // the blob really took the ImageIO path: encoding produces a PNG
    assert(Multimodal.isPng(Multimodal.encodeGrayPng("xyz".getBytes, 8)))
  }

  test("frame sampling covers the payload at the configured stride") {
    val f = Multimodal.frameSample(blobs, frameLen = 16, stride = 64)
    val counts = f.groupBy("id").agg(count(lit(1)).as("frames"))
      .join(blobs.select(col("id"), col("meta.n_bytes").as("len")), "id")
    val bad = counts.filter(
      col("frames") =!= ceil(col("len").cast("double") / 64).cast("long"))
    assert(bad.count() === 0)
  }

  test("empty payloads produce no histogram bins or frames, and embed to zeros") {
    import spark.implicits._
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val blobs = Multimodal.packBlobs(empty, "doc_id", "text")
    assert(Multimodal.byteHistogram(blobs).count() === 0)
    assert(Multimodal.frameSample(blobs).count() === 0)
    val e = Multimodal.embed(blobs).collect()(0)._2
    assert(e.forall(_ === 0f))
  }

  test("resize truncates payloads and updates metadata") {
    val r = Multimodal.resize(blobs, 32)
    assert(r.filter(col("meta.n_bytes") > 32).count() === 0)
  }

  test("average hash: equals direct byte arithmetic, stable under identical payloads") {
    import spark.implicits._
    // direct recompute from the raw bytes — the codec round-trip must
    // be the identity (gray + lossless), so the kernel's hash equals
    // this byte-level reference
    def ref(text: String): (Long, Long) = {
      val b = text.getBytes("UTF-8").take(256).map(_ & 0xff)
      val p = b ++ Array.fill(256 - b.length)(0)
      val bm = (0 until 64).map { j =>
        val by = (j / 8) * 2; val bx = (j % 8) * 2
        (p(by * 16 + bx) + p(by * 16 + bx + 1) +
          p((by + 1) * 16 + bx) + p((by + 1) * 16 + bx + 1)).toLong / 4
      }
      val m = bm.sum / 64
      var lo = 0L; var hi = 0L
      bm.zipWithIndex.foreach { case (v, j) =>
        if (v > m) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
      }
      (hi, lo)
    }
    val texts = Seq((1L, "the quick brown fox jumps over the lazy dog " * 8),
      (2L, "the quick brown fox jumps over the lazy dog " * 8), // exact dup
      (3L, "completely different content with other words entirely " * 6))
    val df = Multimodal.packBlobs(
      texts.toDF("doc_id", "text"), "doc_id", "text")
    val got = Multimodal.averageHash(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ref(texts.head._2))
    assert(got(3L) === ref(texts(2)._2))
    assert(got(1L) === got(2L)) // identical payloads collide
    assert(got(1L) !== got(3L)) // different payloads do not
    // halves are non-negative (bit 63 lands in hi bit 31, still < 2^32)
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && lo >= 0L && hi < (1L << 32) && lo < (1L << 32))
    }
  }

  test("ahash banding is lossless at Hamming <= 3: equals brute-force pairs") {
    val hashes = Multimodal.averageHash(blobs)
    val got = Multimodal.ahashNearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2))
    // brute force over the distinct-hash frame — no banding anywhere
    val dh = hashes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._2, t._3))
      .map { case ((hi, lo), g) => (hi, lo, g.length.toLong, g.map(_._1).min) }
      .toArray
    val expected = (for {
      a <- dh; b <- dh
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      d = java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      if d <= 3
    } yield (a._4, b._4, a._3, b._3, d)).sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)
  }

  test("ahashDistanceHist: bins partition the pair graph; cumulative is the prefix sum") {
    val pairs = SparkEntry.queries("mm_ahash_near_pairs")(spark, sf001)
      .select(col("hamming").cast("int")).collect().map(_.getInt(0))
    val got = graft.queries.MultimodalQueries.ahashDistanceHist(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sum === pairs.length.toLong)
    val expect = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (d, n, cum) =>
      assert(d >= 0 && d <= 3)
      assert(n === expect(d))
      assert(cum === got.filter(_._1 <= d).map(_._2).sum)
    }
  }

  test("ahash banding refuses a radius the band split cannot guarantee") {
    intercept[IllegalArgumentException] {
      Multimodal.ahashNearDupPairs(Multimodal.averageHash(blobs), maxDist = 4)
    }
  }

  test("embed: fixed-width float features feed the similarity operators") {
    val e = Multimodal.embed(blobs).toDF("id", "embedding")
    val sample = e.limit(5).collect()
    sample.foreach(r => assert(r.getSeq[Float](1).length === Multimodal.HistogramBins))
    val topk = graft.operators.Similarity.bruteForceTopK(
      e, "id", "embedding",
      Array((sample.head.getLong(0),
        sample.head.getSeq[Float](1).map(_.toDouble).toArray)), 3)
    assert(topk.count() === 3)
  }

  test("ahash clusters equal a union-find over the near-pair graph") {
    val pairs = SparkEntry.queries("mm_ahash_near_pairs")(spark, sf001)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    // driver union-find with min-label components
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = nodes.groupBy(find).map { case (root, ns) =>
      (ns.min, ns.length.toLong) }.toMap  // min-label -> n_hashes
    val got = SparkEntry.queries("mm_ahash_clusters")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap === expect)
    // member counts ride along: images >= hashes in every cluster
    got.foreach { case (_, nh, ni) => assert(ni >= nh) }
  }

  test("shared frames: planted clone detected, counts reconcile with frameSample") {
    import spark.implicits._
    val base = "x" * 200
    val docs = Seq((1L, base), (2L, base), (3L, "y" * 200))
      .toDF("doc_id", "text")
    val b = Multimodal.packBlobs(docs, "doc_id", "text")
    val got = Multimodal.sharedFrames(b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // docs 1 and 2 are byte-identical; their repeated 'x'*16 frame
    // (offsets 0/64/128, 3 occurrences per doc) and the short 'x'*8
    // tail frame are the two shared fingerprints; doc 3 shares nothing
    assert(got.map(t => (t._2, t._3, t._4, t._5)).sorted.toSeq ===
      Seq((2L, 2L, 1L, 2L), (2L, 6L, 1L, 2L)))
    // fixture: every reported fp really occurs in >= 2 distinct docs
    val fixture = Multimodal.sharedFrames(blobs).collect()
    val byFp = Multimodal.frameSample(blobs)
      .groupBy("frame_fp").agg(countDistinct("id").as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fixture.foreach(r => assert(byFp(r.getLong(0)) === r.getLong(1)))
  }

  test("mosaic vectors threshold to exactly the average-hash bits") {
    val mosaics = Multimodal.mosaicVectors(blobs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val hashes = Multimodal.averageHash(blobs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hashes.nonEmpty)
    hashes.foreach { case (id, hi, lo) =>
      val bm = mosaics(id)
      assert(bm.length === 64)
      val mean = bm.sum / 64
      var eLo = 0L; var eHi = 0L
      for (j <- 0 until 64 if bm(j) > mean)
        if (j < 32) eLo |= 1L << j else eHi |= 1L << (j - 32)
      assert((hi, lo) === ((eHi, eLo)), s"doc $id")
    }
  }

  test("patch k-NN equals a driver-side exhaustive integer ranking") {
    val m = Multimodal.mosaicVectors(blobs)
    val all = m.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val qs = all.sortBy(_._1).take(3)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val expected = qs.map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (id, v) => (id, d2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(4).map(_._1).toSeq
    }.toMap
    val got = Multimodal.patchKnn(m, qs, 4)
      .orderBy("query_id", "rank")
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    assert(got === expected)
  }

  test("sceneChanges: planted two-shot payload splits at the boundary; constant payload is one scene") {
    import spark.implicits._
    // payload 1: 4 frames of byte 10, then 4 frames of byte 200 — one
    // boundary exactly at frame 4 (|Δsum| = 16·190 ≫ 200); payload 2:
    // a constant byte stream — a single scene however many frames
    val twoShot = Array.fill(4 * 64)(10.toByte) ++ Array.fill(4 * 64)(200.toByte)
    val constant = Array.fill(6 * 64)(42.toByte)
    val blobs = Seq((1L, twoShot), (2L, constant)).toDF("id", "blob")
    val got = Multimodal.sceneChanges(blobs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((8L, 2L, 4L)), s"two-shot payload: ${got(1L)}")
    assert(got(2L) === ((6L, 1L, 6L)), s"constant payload: ${got(2L)}")
    // threshold monotonicity: an impossibly high bar yields one scene
    val one = Multimodal.sceneChanges(blobs, threshold = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(one.values.forall(_ === 1L))
  }

  test("audioActivity: hand-computed energy/zcr on planted payloads; fixture VAD split is binary (r14)") {
    import spark.implicits._
    // payload 1: 16 bytes alternating 32/96 around the 64 midline —
    // per-sample deviation ±32, energy 16·1024 = 16384, crossings at
    // every adjacent pair (15); payload 2: constant 64 — deviation 0,
    // energy 0, zcr 0; payload 3: 20 bytes of 200 — two frames (16+4),
    // energy (200−64)²·16 = 295936 then ·4 = 73984, zero crossings
    val alt = Array.tabulate(16)(i => (if (i % 2 == 0) 32 else 96).toByte)
    val mid = Array.fill(16)(64.toByte)
    val loud = Array.fill(20)(200.toByte)
    val planted = Seq((1L, alt), (2L, mid), (3L, loud)).toDF("id", "blob")
    val got = Multimodal.audioActivity(planted)
      .collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === ((1L, 0L, 16384L, 16384L, 15L)), s"alternating: ${got(1L)}")
    assert(got(2L) === ((1L, 0L, 0L, 0L, 0L)), s"midline: ${got(2L)}")
    assert(got(3L) === ((2L, 2L, 369920L, 295936L, 0L)), s"loud: ${got(3L)}")
    // the declared threshold is calibrated at the fixture median: the
    // VAD split must be genuinely binary, not all-active/all-silent
    val fx = Multimodal.audioActivity(blobs)
      .agg(sum("n_active").as("a"), sum("n_frames").as("f")).collect()(0)
    val share = fx.getLong(0).toDouble / fx.getLong(1)
    info(f"fixture active-frame share at threshold 29000: $share%.3f")
    assert(share > 0.2 && share < 0.8, s"degenerate VAD split: $share")
  }

  test("audioFrameVectors: fixed width, exact energies, planted near-clone ranks first through patchKnn (r15)") {
    import spark.implicits._
    // hand-computed: 16 bytes alternating 32/96 -> frame-0 energy
    // 16·32² = 16384; a 20-byte payload of 200s -> frame 0 = 16·136²
    // = 295936, frame 1 (partial, 4 samples) = 4·136² = 73984; every
    // frame past the payload end = 0 and the vector is ALWAYS
    // AudioKnnFrames wide
    val alt = Array.tabulate(16)(i => (if (i % 2 == 0) 32 else 96).toByte)
    val loud = Array.fill(20)(200.toByte)
    val fv = Multimodal.audioFrameVectors(
        Seq((1L, alt), (2L, loud)).toDF("id", "blob"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(fv(1L).length === 64 && fv(2L).length === 64)
    assert(fv(1L).head === 16384L && fv(1L).drop(1).forall(_ === 0L))
    assert(fv(2L).take(2) === Seq(295936L, 73984L))
    assert(fv(2L).drop(2).forall(_ === 0L))
    // planted near-clone: base payload, a clone differing by ONE
    // sample, and two noise payloads — the clone must rank 1 for the
    // base query by integer sqdist
    val rnd = new scala.util.Random(31)
    val base = Array.fill(200)((rnd.nextInt(96) + 32).toByte)
    val clone = base.clone(); clone(37) = (clone(37) + 2).toByte
    val noise = Array.fill(2)(Array.fill(200)((rnd.nextInt(96) + 32).toByte))
    val planted = Seq((10L, base), (11L, clone), (12L, noise(0)),
      (13L, noise(1))).toDF("id", "blob")
    val vecs = Multimodal.audioFrameVectors(planted)
    val q = vecs.filter(col("id") === 10L)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val top = Multimodal.patchKnn(vecs, q, 3, vecCol = "v")
      .orderBy("rank").collect()
    assert(top(0).getLong(1) === 11L,
      s"near-clone did not rank first: ${top.toSeq}")
    // the fixture-declared query is deterministic across invocations
    val a = graft.queries.MultimodalQueries.audioKnnQ(spark, sf001).collect().toSeq
    val b = graft.queries.MultimodalQueries.audioKnnQ(spark, sf001).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("audioFrameVectorsDecoded: the real-parser path scales every stub energy by 256^2 exactly and keeps the fingerprint bit-identical (r17)") {
    import spark.implicits._
    // the encode contract: sample_i = (byte_i - 64)*256, zero-padded —
    // so each DECODED frame energy is 65536x the stub energy, frame
    // for frame, payload for payload (partial trailing frames and
    // past-end zero frames included). Domain: bytes in [0, 191], the
    // wrap-free int16 range of the contract — every ASCII text
    // payload; 191 itself is the edge sample 32512 < Short.MaxValue
    val rnd = new scala.util.Random(47)
    val payloads = Seq(
      (1L, Array.tabulate(16)(i => (if (i % 2 == 0) 32 else 96).toByte)),
      (2L, Array.fill(20)(191.toByte)),
      (3L, Array.fill(1500)((rnd.nextInt(96) + 32).toByte)),
      (4L, Array.empty[Byte])).toDF("id", "blob")
    val stub = Multimodal.audioFrameVectors(payloads)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val dec = Multimodal.audioFrameVectorsDecoded(payloads)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    stub.keys.foreach { id =>
      assert(dec(id) === stub(id).map(_ * 65536L),
        s"decoded energies diverge from 256^2 x stub for payload $id")
    }
    // the mean-threshold fingerprint is scale-invariant under the
    // exact 65536x relation (integer floor: 65536*S/64 = 1024*S with
    // no truncation loss), so the decoded-path fingerprint equals the
    // stub path's bit for bit — on the planted payloads AND the fixture
    val fpStub = Multimodal.audioFingerprint(
        Multimodal.audioFrameVectors(payloads))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val fpDec = Multimodal.audioFingerprint(
        Multimodal.audioFrameVectorsDecoded(payloads))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(fpDec === fpStub)
    val q = graft.queries.MultimodalQueries.audioDecodedFpQ(spark, sf001)
      .collect()
    assert(q.nonEmpty)
    val fixtureStub = Multimodal.audioFingerprint(
        Multimodal.audioFrameVectors(blobs))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    q.foreach { r =>
      assert((r.getAs[Long]("ahash_hi"), r.getAs[Long]("ahash_lo")) ===
        fixtureStub(r.getAs[Long]("doc_id")),
        s"fixture fingerprint diverged for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("audioActivity: oracle frame-series bound covers the corpus; frameLen guard (r14 ADVICE)") {
    import spark.implicits._
    // the mm_audio_activity oracle enumerates frame indexes 0..4095
    // (64 KiB of payload at frameLen 16) while the surface iterates
    // the whole blob — the 'covering far past any fixture length'
    // promise must be ENFORCED, not assumed: a longer payload would
    // silently diverge surface from oracle. Checked at both spec
    // scales (the driver gate runs the oracle at sf0.01).
    for (dir <- Seq(sf001, sf01)) {
      val maxLen = Tables.documents(spark, dir)
        .agg(max(length(col("text")))).collect()(0).getInt(0)
      assert(maxLen <= 65536,
        s"$dir: max payload $maxLen bytes exceeds the oracle's 64 KiB frame series")
    }
    // parameter validation matches the graphSearch convention
    intercept[IllegalArgumentException] {
      Multimodal.audioActivity(Seq((1L, Array[Byte](1))).toDF("id", "blob"),
        frameLen = 0)
    }
  }

  test("audioFingerprint: hand-computed mean-threshold bits; banding is lossless at Hamming <= 3 over the fixture (r16)") {
    import spark.implicits._
    import graft.queries.MultimodalQueries
    // hand-built vector: the bit rule is v(j) > floor(sum/64), halves
    // non-negative
    val v = Array.tabulate(64)(j => if (j % 7 == 0) 1000L else 10L)
    val mean = v.sum / 64
    val fp = Multimodal.audioFingerprint(Seq((1L, v)).toDF("id", "v"))
      .collect()(0)
    var lo = 0L; var hi = 0L
    (0 until 64).foreach { j =>
      if (v(j) > mean) { if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32) }
    }
    assert(fp.getLong(1) === hi && fp.getLong(2) === lo)
    assert(fp.getLong(1) >= 0L && fp.getLong(2) >= 0L)
    // losslessness law on the fixture family: the banded join equals
    // brute force over the distinct-fingerprint frame (the image
    // family's pigeonhole guarantee, same code path)
    val hashes = Multimodal.audioFingerprint(Multimodal.audioFrameVectors(
      blobs, frameLen = MultimodalQueries.AudioFrameLen,
      nFrames = MultimodalQueries.AudioKnnFrames))
    val got = Multimodal.ahashNearDupPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2))
    val dh = hashes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._2, t._3))
      .map { case ((h2, l2), g) => (h2, l2, g.length.toLong, g.map(_._1).min) }
      .toArray
    val expected = (for {
      a <- dh; b <- dh
      if a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      d = java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      if d <= 3
    } yield (a._4, b._4, a._3, b._3, d)).sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)
  }

  test("WAV round-trip: real RIFF parse equals the encode contract; sniff dispatch; chunk-walk robustness (r16)") {
    val bytes = Array.tabulate(10)(i => (60 + i * 7).toByte)
    val wav = Multimodal.encodeWav(bytes, 16)
    assert(Multimodal.isWav(wav))
    val (sr, nc, s) = Multimodal.decodeWav(wav)
    assert(sr === 8000 && nc === 1 && s.length === 16)
    (0 until 16).foreach { i =>
      val expect = if (i < bytes.length) ((bytes(i) & 0xff) - 64) * 256 else 0
      assert(s(i) === expect)
    }
    // negative samples survive the 16-bit little-endian round-trip
    assert(s(0) === (60 - 64) * 256)
    // the sniff dispatch: a PNG is not a WAV; garbage fails loudly
    assert(!Multimodal.isWav(Multimodal.encodeGrayPng(bytes, 8)))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(Array.fill(44)(0.toByte)))
    // the RIFF contract: an unknown odd-sized chunk between fmt and
    // data is skipped by its declared size + pad byte
    val pre = wav.take(36)
    val post = wav.drop(36)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) ++ Array[Byte](0)
    val (sr2, _, s2) = Multimodal.decodeWav(pre ++ list ++ post)
    assert(sr2 === 8000 && s2.toSeq === s.toSeq)
    // declared surface: header constants, non-negative energy,
    // deterministic across invocations
    val rt = graft.queries.MultimodalQueries.audioRoundtripQ(spark, sf001)
    val rows = rt.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("sample_rate") === 8000)
      assert(r.getAs[Int]("n_channels") === 1)
      assert(r.getAs[Int]("n_samples") === 256)
      assert(r.getAs[Long]("energy") >= 0L)
    }
    assert(graft.queries.MultimodalQueries.audioRoundtripQ(spark, sf001)
      .collect().toSeq === rows.toSeq)
  }

  test("audio near-dup: planted near-pattern pair found, far pattern excluded; groups equal a union-find (r16)") {
    import spark.implicits._
    // planted: A and B's loud-frame patterns differ in 2 threshold
    // bits (inside the exact radius), C's in ~50 (far outside)
    def vec(bits: Set[Int]) = Array.tabulate(64)(j => if (bits(j)) 1000L else 0L)
    val a = (0 until 20).toSet
    val b = a - 0 + 25
    val c = (30 until 60).toSet
    val fps = Multimodal.audioFingerprint(
      Seq((1L, vec(a)), (2L, vec(b)), (3L, vec(c))).toDF("id", "v"))
    val planted = Multimodal.ahashNearDupPairs(fps).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    assert(planted.map(p => Set(p._1, p._2)).toSet === Set(Set(1L, 2L)),
      s"planted pair set wrong: ${planted.toSeq}")
    assert(planted.head._3 === 2)
    // declared groups reconcile with the declared pairs: driver
    // union-find with min-label components (the ahash clusters law)
    val pairs = SparkEntry.queries("mm_audio_near_pairs")(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { val (l, h) = (math.min(rx, ry), math.max(rx, ry))
        parent(h) = l }
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expect = nodes.groupBy(find).map { case (_, ns) =>
      (ns.min, ns.length.toLong) }.toMap
    val got = SparkEntry.queries("mm_audio_groups")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap === expect)
    // member counts ride along: payloads >= fingerprints per cluster
    got.foreach { case (_, nf, np) => assert(np >= nf) }
  }
}
