package graft

import org.apache.spark.sql.functions._

import graft.operators.Integrity

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("referentialAudit: orphans, duplicates and matches counted exactly; clean join audits clean") {
    // left: keys 1,2,2,3 (2 duplicated); right: keys 2,4 (orphan 4)
    val l = Seq(1L, 2L, 2L, 3L).toDF("doc_id")
    val r = Seq(2L, 4L).toDF("vec_id")
    val a = Integrity.referentialAudit(l, "doc_id", r, "vec_id").collect()(0)
    assert(a.getLong(0) === 4L) // n_left rows
    assert(a.getLong(1) === 2L) // n_right rows
    assert(a.getLong(2) === 3L) // distinct left keys
    assert(a.getLong(3) === 2L) // distinct right keys
    assert(a.getLong(4) === 1L) // matched: key 2
    assert(a.getLong(5) === 2L) // left orphans: 1, 3
    assert(a.getLong(6) === 1L) // right orphans: 4
    assert(a.getLong(7) === 1L) // left dup keys: 2
    assert(a.getLong(8) === 0L)
    // identical key sets audit clean
    val c = Integrity.referentialAudit(l.distinct(), "doc_id",
      l.distinct().withColumnRenamed("doc_id", "vec_id"), "vec_id").collect()(0)
    assert(c.getLong(4) === 3L && c.getLong(5) === 0L && c.getLong(6) === 0L &&
      c.getLong(7) === 0L && c.getLong(8) === 0L)
  }

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    val before = Seq((1L, "O", 100L), (2L, "F", 200L), (3L, "O", 300L), (4L, "O", 400L))
      .toDF("k", "status", "cents")
    val after = Seq((1L, "O", 100L), (2L, "O", 200L), (3L, "O", 301L), (5L, "F", 500L))
      .toDF("k", "status", "cents")
    val got = Integrity.snapshotDiff(before, after, "k", Seq("status", "cents"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // 1 unchanged (dropped), 2 status-changed, 3 cents-changed,
    // 4 removed, 5 added
    assert(got === Seq((2L, "changed"), (3L, "changed"), (4L, "removed"), (5L, "added")))
  }

  test("snapshot diff compares null-safely") {
    val before = Seq((1L, Some(10L)), (2L, None), (3L, None))
      .toDF("k", "v")
    val after = Seq((1L, Option.empty[Long]), (2L, None), (3L, Some(7L)))
      .toDF("k", "v")
    val got = Integrity.snapshotDiff(before, after, "k", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // null vs 10 and 7 vs null are changes; null vs null is unchanged
    assert(got === Seq((1L, "changed"), (3L, "changed")))
  }

  test("checksum is invariant to row order and partitioning, sensitive to one row") {
    val o = graft.io.Tables.orders(spark, sf001)
    val vals = Seq(col("o_orderkey"), col("o_custkey"),
      (col("o_totalprice").cast("decimal(38,2)") * 100).cast("long"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      Integrity.tableChecksum(df, Seq("o_orderstatus"), vals)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = sums(o)
    assert(sums(o.repartition(7)) === base)
    assert(sums(o.orderBy(col("o_totalprice").desc)) === base)
    // flip one key: that status's checksum must move, others must not
    val perturbed = o.withColumn("o_orderkey",
      when(col("o_orderkey") === 1L, lit(2L)).otherwise(col("o_orderkey")))
    val pk = sums(perturbed)
    val hitStatus = o.filter(col("o_orderkey") === 1L)
      .select("o_orderstatus").collect()(0).getString(0)
    assert(pk(hitStatus)._2 !== base(hitStatus)._2)
    assert(pk.filterNot(_._1 == hitStatus) === base.filterNot(_._1 == hitStatus))
  }

  test("applyChanges(before, snapshotDiff(before, after)) reproduces after exactly") {
    // the MERGE round-trip law, on frames with every change kind plus
    // untouched pass-through rows
    val before = Seq((1L, "O", 100L), (2L, "F", 200L), (3L, "O", 300L), (4L, "O", 400L))
      .toDF("k", "status", "cents")
    val after = Seq((1L, "O", 100L), (2L, "O", 200L), (3L, "O", 301L), (5L, "F", 500L))
      .toDF("k", "status", "cents")
    val changes = Integrity.snapshotDiff(before, after, "k", Seq("status", "cents"))
    val rebuilt = Integrity.applyChanges(before, changes, "k", Seq("status", "cents"))
    assert(rebuilt.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      after.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
  }

  test("applyChanges round-trip holds on the fixture with modular version masks") {
    val o = graft.io.Tables.orders(spark, sf001)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        (col("o_totalprice").cast("decimal(38,2)") * 100).cast("long").as("cents"))
    val before = o.filter(col("k") % 7 =!= 0)
    val after = o.filter(col("k") % 5 =!= 0)
      .withColumn("cents", when(col("k") % 3 === 0, col("cents") + 1).otherwise(col("cents")))
    val changes = Integrity.snapshotDiff(before, after, "k", Seq("status", "cents"))
    val rebuilt = Integrity.applyChanges(before, changes, "k", Seq("status", "cents"))
    assert(rebuilt.exceptAll(after).count() === 0)
    assert(after.exceptAll(rebuilt).count() === 0)
  }

  test("checksum equals the union of its partitions' partial sums mod P") {
    // mergeability: checksum(A ∪ B) is derivable from per-part sums —
    // the property that lets a backfill validate shard by shard
    val o = graft.io.Tables.orders(spark, sf001)
    val vals = Seq(col("o_orderkey"), col("o_custkey"),
      (col("o_totalprice").cast("decimal(38,2)") * 100).cast("long"))
    val p = graft.operators.Sketches.HashP
    val lo = o.filter(col("o_orderkey") % 2 === 0)
    val hi = o.filter(col("o_orderkey") % 2 =!= 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      Integrity.tableChecksum(df, Seq("o_orderstatus"), vals)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val whole = m(o)
    val merged = (m(lo).keySet ++ m(hi).keySet).map { k =>
      k -> (m(lo).getOrElse(k, 0L) + m(hi).getOrElse(k, 0L)) % p
    }.toMap
    assert(merged === whole)
  }

  test("shard manifest conserves docs and tokens; checksums differ across shards") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = graft.queries.PipelineQueries.shardManifest(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.map(_._1).toSeq === m.map(_._1).toSeq.sorted)
    assert(m.map(_._2).sum === docs.count())
    val totalToks = docs
      .select(sum(size(graft.functions.TextOps.words(col("text"))).cast("long")))
      .collect()(0).getLong(0)
    assert(m.map(_._3).sum === totalToks)
    // 8 shards of distinct content should virtually never collide
    assert(m.map(_._4).distinct.length === m.length)
  }
}
