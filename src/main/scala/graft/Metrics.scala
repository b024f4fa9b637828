package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume evidence harness: runs each declared query under a
  * SparkListener and reports input rows vs shuffle bytes/records —
  * the measurable form of the engine's "shuffle only what's
  * semantically forced" design claim. Usage:
  *   sbt "runMain graft.Metrics <sfDir> [queryName ...]"
  * Prints one line per query: name, seconds, shuffle write MB,
  * shuffle write records, output rows.
  */
object Metrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder(GraftSession.envCpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val written = new LongAdder
    val records = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          written.add(m.shuffleWriteMetrics.bytesWritten)
          records.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // same JIT warmup rationale as graft.Bench: without it the first
    // timed query absorbs ~3-5 s of one-time codegen/reader compile
    // and its number reads as a phantom hot spot (round-4 audit:
    // text_repetition "13.6 s" was 4.6 s warmed, then 0.15 s fixed)
    try {
      spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()
      spark.range(1000000).selectExpr("sum(id)").count()
    } catch { case _: Throwable => () }
    println(f"${"query"}%-26s ${"sec"}%8s ${"shufMB"}%10s ${"shufRecs"}%12s ${"rows"}%10s")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        written.reset(); records.reset()
        val t0 = System.nanoTime()
        // noop sink materializes EVERY column — count() would let
        // Catalyst prune the query's actual compute (observed: the
        // as-of window vanishing entirely under count()).
        val err = try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          None
        } catch { case scala.util.control.NonFatal(e) => Some(e) }
        val sec = (System.nanoTime() - t0) / 1e9
        // deterministic drain, then snapshot BEFORE the (unmetered,
        // separately-optimized) row count re-executes the query
        org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
        val mb = written.sum() / 1e6
        val recs = records.sum()
        val rows = err match {
          case Some(e) => println(s"$name FAILED: ${e.toString.take(120)}"); -1L
          case None =>
            try fn(spark, sfDir).count()
            catch { case scala.util.control.NonFatal(_) => -1L }
        }
        println(f"$name%-26s $sec%8.2f $mb%10.2f $recs%12d $rows%10d")
      }
    }
    spark.stop()
  }
}
