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
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
    println(f"${"query"}%-26s ${"sec"}%8s ${"shufMB"}%10s ${"shufRecs"}%12s ${"rows"}%10s")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        written.reset(); records.reset()
        val t0 = System.nanoTime()
        // noop sink materializes EVERY column — count() would let
        // Catalyst prune the query's actual compute (observed: the
        // as-of window vanishing entirely under count()).
        val rows = try {
          val df = fn(spark, sfDir)
          df.write.mode("overwrite").format("noop").save()
          df.count()
        } catch { case _: Throwable => -1L }
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$name%-26s $sec%8.2f ${written.sum() / 1e6}%10.2f ${records.sum()}%12d $rows%10d")
      }
    }
    spark.stop()
  }
}
