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
  /** `events.ts` has shipped in two fixture generations: TIMESTAMP(NANOS)
    * parquet (Spark 4 reads it only as a nanos LONG, via
    * `spark.sql.legacy.parquet.nanosAsLong=true` set in
    * [[graft.GraftSession]]) and plain TIMESTAMP(MICROS). Normalize both
    * to session TimestampType at µs precision — exactly DuckDB's
    * epoch_us() view of the same file, so oracles agree. Readers must
    * not mutate session conf; dispatch on the file schema instead. */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType)) // TIMESTAMP_NTZ: UTC session tz ⇒ same epoch µs
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
