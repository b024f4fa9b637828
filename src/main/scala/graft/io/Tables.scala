package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central readers for the driver-generated fixture tables
  * (`/root/repo/TESTDATA.md`, `/root/repo/FIXTURES.md`).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * Parquet reader, column pruning and filter pushdown apply. At cluster
  * scale these paths would be directories of many files; nothing here
  * assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    spark.read.parquet(path(sfDir, name))
  }

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp; read nanos as long and truncate to µs —
    * exactly DuckDB's epoch_us() semantics, so oracles agree.
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at
    * session construction ([[graft.GraftSession]]) — readers must not
    * mutate session conf. */
  def events(spark: SparkSession, d: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true (see GraftSession)")
    load(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
