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
}
