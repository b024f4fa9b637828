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

  // ---- full-catalog schema lock (round-7 verdict task 6) ------------
  // Every driver fixture table's NORMALIZED schema (as the io.Tables
  // readers expose it — so `events.ts` is pinned post-normalization and
  // the pin holds across both fixture generations). A silent fixture
  // regeneration that renames/retypes a column now fails this local
  // spec instead of surfacing as a wall of driver-round query errors.
  private val expectedSchemas = Map(
    "region" -> Seq("r_regionkey:int", "r_name:string"),
    "nation" -> Seq("n_nationkey:int", "n_name:string", "n_regionkey:int"),
    "customer" -> Seq("c_custkey:bigint", "c_name:string", "c_nationkey:int",
      "c_acctbal:double", "c_mktsegment:string"),
    "supplier" -> Seq("s_suppkey:bigint", "s_name:string", "s_nationkey:int",
      "s_acctbal:double"),
    "part" -> Seq("p_partkey:bigint", "p_name:string", "p_brand:string",
      "p_type:string", "p_size:int", "p_retailprice:double"),
    // o_orderdate / l_shipdate are parquet timestamp[us] WITHOUT
    // isAdjustedToUTC ⇒ Spark reads TIMESTAMP_NTZ (session tz is UTC,
    // so epoch arithmetic agrees with DuckDB either way); events.ts is
    // pinned below as plain `timestamp` because Tables.events
    // NORMALIZES whatever encoding ships to session TimestampType.
    "orders" -> Seq("o_orderkey:bigint", "o_custkey:bigint", "o_orderstatus:string",
      "o_totalprice:double", "o_orderdate:timestamp_ntz", "o_orderpriority:string"),
    "lineitem" -> Seq("l_orderkey:bigint", "l_partkey:bigint", "l_suppkey:bigint",
      "l_linenumber:int", "l_quantity:double", "l_extendedprice:double",
      "l_discount:double", "l_tax:double", "l_returnflag:string",
      "l_linestatus:string", "l_shipdate:timestamp_ntz"),
    "events" -> Seq("event_id:bigint", "ts:timestamp", "user_id:bigint",
      "event_type:string", "value:double", "props:string"),
    "documents" -> Seq("doc_id:bigint", "text:string", "lang:string",
      "source:string", "n_chars:bigint"),
    "embeddings" -> Seq("vec_id:bigint", "embedding:array<float>", "label:int"))

  test("every fixture table's normalized schema is pinned (all 10 tables)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir absent")
    Tables.all.foreach { t =>
      assume(new java.io.File(Tables.path(sfDir, t)).exists, s"$t fixture absent")
      val df = t match {
        case "events" => Tables.events(spark, sfDir) // normalized reader
        case other    => Tables.load(spark, sfDir, other)
      }
      val got = df.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
      assert(got == expectedSchemas(t),
        s"schema drift in fixture table '$t': got $got")
    }
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
