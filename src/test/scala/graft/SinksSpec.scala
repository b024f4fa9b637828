package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.io.{Sinks, Tables}

/** Write-side layout sinks — the z-order test MEASURES the pruning
  * claim: records actually read from parquet under a 2-D range
  * predicate, z-ordered layout vs the natural (orderkey-clustered)
  * layout of the same rows. */
class SinksSpec extends SparkSpec {

  private def recordsRead(work: => Unit): Long = {
    val read = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) read.addAndGet(m.inputMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      work
      org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
      read.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("z-ordered layout preserves rows exactly and prunes a 2-D range scan") {
    val li = Tables.lineitem(spark, sf01)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val natural = s"$tmp/natural"
    val zordered = s"$tmp/zordered"
    // same file count both sides — only the CLUSTERING differs
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(natural)
    Sinks.writeZOrdered(li, zordered, "l_partkey", "l_suppkey", nFiles = 16)

    // layout must be result-invisible: same multiset of rows
    val a = spark.read.parquet(natural)
    val b = spark.read.parquet(zordered)
    assert(a.count() === li.count())
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)

    // a selective 2-D range: both keys constrained to ~1/8 of their
    // domain → ~1/64 of rows qualify
    def q(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey").between(100, 350) &&
          col("l_suppkey").between(10, 22))
      df.count()
    }
    assert(q(natural) === q(zordered))
    val readNatural = recordsRead(q(natural))
    val readZ = recordsRead(q(zordered))
    // natural layout: partkey/suppkey are uniform within every file →
    // no row group's min/max excludes the predicate → full scan.
    // z-order: the qualifying rectangle intersects few z-runs.
    assert(readZ * 2 < readNatural,
      s"z-ordered read $readZ records vs $readNatural natural — no pruning win")
  }

}
