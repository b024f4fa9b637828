package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.io.Tables
import graft.streaming.StreamOps

/** The events fixture has shipped in two generations — `ts` as
  * TIMESTAMP(NANOS) parquet (Spark 4 reads it only as a nanos long via
  * `spark.sql.legacy.parquet.nanosAsLong`) and as plain
  * TIMESTAMP(MICROS). Round 6's driver run broke on the generation flip
  * (every events/asof/range query failed analysis; the streaming reader
  * silently read µs as ns and watermark-dropped ~everything), so both
  * readers must normalize BOTH encodings to identical session
  * timestamps. This spec writes the same rows in each encoding and
  * pins the readers' outputs equal, batch and streaming.
  */
class TablesSchemaSpec extends SparkSpec {
  import spark.implicits._

  // one base row set: (event_id, epoch micros, user_id, type, value, props)
  private val baseUs = Seq(
    (1L, 1704067200000000L, 10L, "view", 1.25, """{"k":1}"""),
    (2L, 1704067201500000L, 10L, "purchase", 2.50, """{"k":2}"""),
    (3L, 1704153600999999L, 11L, "view", 3.75, """{"k":3}"""))

  /** dir/events.parquet with ts as a raw nanos LONG (how Spark sees the
    * legacy TIMESTAMP(NANOS) fixture under nanosAsLong=true). */
  private def writeLegacyNanos(): String = {
    val d = Files.createTempDirectory("graft-ev-ns").toString
    baseUs.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  /** dir/events.parquet with ts as a real TIMESTAMP(MICROS) column (the
    * current fixture generation). */
  private def writeTimestampMicros(): String = {
    val d = Files.createTempDirectory("graft-ev-us").toString
    baseUs.map { case (id, us, u, t, v, p) => (id, us, u, t, v, p) }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("Tables.events normalizes legacy nanos-long and timestamp fixtures identically") {
    val legacy = Tables.events(spark, writeLegacyNanos())
    val modern = Tables.events(spark, writeTimestampMicros())
    for (df <- Seq(legacy, modern)) {
      assert(df.schema("ts").dataType == TimestampType)
    }
    val l = legacy.select($"event_id", unix_micros($"ts")).as[(Long, Long)].collect().sortBy(_._1)
    val m = modern.select($"event_id", unix_micros($"ts")).as[(Long, Long)].collect().sortBy(_._1)
    assert(l.toSeq == m.toSeq)
    assert(l.map(_._2).toSeq == baseUs.map(_._2))
  }

  test("readEventsStream matches Tables.events on both fixture generations") {
    for (dir <- Seq(writeLegacyNanos(), writeTimestampMicros())) {
      val streamed = StreamOps.readEventsStream(spark, s"$dir/events.parquet")
      assert(streamed.isStreaming)
      assert(streamed.schema("ts").dataType == TimestampType)
      val q = streamed.writeStream.outputMode("append").format("memory")
        .queryName("tables_schema_spec_sink").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("tables_schema_spec_sink")
        .select($"event_id", unix_micros($"ts")).as[(Long, Long)].collect().sortBy(_._1)
      assert(got.map(_._2).toSeq == baseUs.map(_._2))
      spark.catalog.dropTempView("tables_schema_spec_sink")
    }
  }
}
