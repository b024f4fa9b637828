package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, VectorOps}

/** Deduplication operators for a large-scale training-data pipeline,
  * over a corpus DataFrame with (idCol: bigint, textCol: string).
  *
  * Scale design (100 TB corpus):
  *  - exact: one hash-partition shuffle on the text (group key could be
  *    sha2(text) to shrink shuffle bytes; kept as raw text here for
  *    oracle parity — swap via `keyExpr`);
  *  - ngramJaccard / minhash: inverted-index self-join — shuffle on
  *    shingle / band-bucket, never an O(n²) cross join. Hot shingles
  *    (stopword runs) can be frequency-capped before the join; the
  *    fixture corpus has max shingle frequency 25, so no cap is applied
  *    by default (`maxShingleFreq`).
  *  - simhash: fingerprints come from one codegen'd 64-column hash
  *    aggregate over exploded token hashes (shuffle = |docs|×64 ints
  *    after partial agg); candidate pairs from 16-bit band equality.
  *  - embeddingCosine: exact quadratic verifier — the scale path is the
  *    LSH/banded variants in [[Similarity]]; keep this for small/medium
  *    n and as the oracle-checkable ground truth.
  */
object Dedup {

  /** Exact dedup: one row per distinct text — the survivor (min id) and
    * the group size. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("n_dups"))
      .select("doc_id", "n_dups")

  /** Distinct (id, shingle) pairs — the inverted-index input. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shingles(col(textCol), n)).as("s"))
      .dropDuplicates("doc_id", "s")

  /** Exact n-gram Jaccard near-dup pairs via shared-shingle co-counts:
    * |A∩B| from the inverted-index self-join, |A∪B| = |A|+|B|−|A∩B|.
    * No cross join; shuffles on shingle then on (doc_a, doc_b). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8,
                   maxShingleFreq: Option[Int] = None): DataFrame = {
    val sh0 = docShingles(docs, idCol, textCol, n)
    // The inverted index feeds three consumers (sizes + both self-join
    // sides). Deliberately NOT persisted: with the compiled
    // WordShingles expression, re-shingling is cheaper than
    // materializing a corpus-sized cache (measured at 10× scale:
    // persisting was neutral-to-slower, and at 100 TB it would spill).
    val sh = maxShingleFreq match {
      case Some(cap) =>
        val hot = sh0.groupBy("s").count().filter(col("count") > cap).select("s")
        sh0.join(hot, Seq("s"), "left_anti")
      case None => sh0
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sa"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash + banded LSH near-dup pairs: signature of `numHashes`
    * murmur3 min-hashes over shingles, `bands` band-buckets, candidate
    * pairs from bucket equality, then exact Jaccard verification on
    * the candidates only (array_intersect on the two shingle sets).
    * Detection probability for similarity s: 1 − (1 − s^r)^b. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // Re-used by both verification joins; recomputed rather than
    // persisted (compiled shingling is cheaper than caching — see
    // ngramJaccard note; persisting here measured 3× SLOWER at 10×).
    val withSh = docs.select(col(idCol).as("doc_id"),
        TextOps.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // Signature via explode + ONE codegen'd hash aggregate (32 min
    // columns), not per-row HOFs: Catalyst inlines used-once HOF
    // projections into downstream lambdas, re-evaluating the signature
    // per band per row (catastrophically interpreted — 220 s at sf0.1);
    // aggregate output attributes are cheap references, so the band
    // hashes below cost nothing to derive. Shuffle = |docs|×numHashes
    // ints after partial agg.
    val shPairs = docShingles(docs, idCol, textCol, n)
    val minCols = (0 until numHashes).map(i => min(hash(lit(i), col("s"))).as(s"m$i"))
    val sig = shPairs.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * r until (b + 1) * r).map(j => col(s"m$j")): _*).as("bucket"))
    }
    // Buckets carry only (doc_id, band, bucket) — never the shingle
    // arrays — so the self-join shuffles fixed-width rows; the (few)
    // surviving candidate pairs re-join to fetch shingle sets for
    // exact verification.
    val buckets = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash fingerprints, computed the Spark-native way for
    * scale: explode distinct tokens, xxhash64 each, then ONE codegen'd
    * hash aggregate with 64 conditional-sum columns (bit i of the
    * fingerprint = sign of Σ ±1 over token-hash bit i). Shuffle volume
    * is |docs| × 64 ints after map-side partial aggregation; every
    * expression stays inside whole-stage codegen (the nested-HOF
    * formulation in [[TextOps.simhash64]] is O(64²·tokens) interpreted
    * per row — 300+ s at sf0.1 vs ~1 s for this plan). */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val th = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextOps.words(col(textCol)))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = th.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    // Distinct powers of two: the sum is exactly the 64-bit pattern.
    val sh = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), sh.as("sh"))
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, banded candidate
    * generation (4×16-bit bands — exhaustive for hamming ≤ 3), hamming
    * verification. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(docs, idCol, textCol)
    val bands = fp.select(col("doc_id"), col("sh"),
      expr("stack(4, 0, shiftright(sh, 0)  & 65535," +
           "         1, shiftright(sh, 16) & 65535," +
           "         2, shiftright(sh, 32) & 65535," +
           "         3, shiftright(sh, 48) & 65535) AS (band, bucket)"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sh").as("fa"), col("y.sh").as("fb"))
      .dropDuplicates("doc_a", "doc_b")
    cand.withColumn("hamming", TextOps.hamming64(col("fa"), col("fb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact embedding-cosine near-dup pairs. All O(n²) work happens in a
    * primitive-array kernel inside `mapPartitions` against a broadcast
    * copy of the table (per-pair higher-order-function evaluation is
    * interpreted, ~80 s at sf0.1; this kernel is < 1 s). The dot/norm
    * folds run left-to-right, exactly matching the sequential DuckDB
    * oracle evaluation, so results stay hash-identical.
    *
    * Scale: broadcasting one side caps at ~10⁶×dim doubles; beyond
    * that, block the broadcast side or use the LSH bucketed path in
    * [[Similarity]] — this operator is the oracle-checkable exact
    * verifier. */
  def embeddingCosine(embs: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val p = embs.select(col(idCol).cast("long").as("id"),
      VectorOps.toDouble(col(vecCol)).as("v")).as[(Long, Array[Double])]
    val all = spark.sparkContext.broadcast(p.collect().sortBy(_._1))
    val out = p.mapPartitions { iter =>
      val b = all.value
      iter.flatMap { case (ida, va) =>
        val na = math.sqrt(VectorOps.dotSeq(va, va))
        b.iterator
          .filter(_._1 > ida)
          .map { case (idb, vb) =>
            val c = VectorOps.dotSeq(va, vb) / (na * math.sqrt(VectorOps.dotSeq(vb, vb)))
            (ida, idb, c)
          }
          .filter(_._3 >= threshold)
      }
    }.toDF("id_a", "id_b", "cosine")
    out
  }

}
