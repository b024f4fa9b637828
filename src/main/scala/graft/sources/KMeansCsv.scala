package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity sources/sinks (SURVEY.md §2.1 rows 1–3, 11, 14):
  * space-delimited CSV points/centroids, a small in-memory demo
  * dataset, and a seeded Gaussian-cluster generator (the reference's
  * `KMeansDataGenerator` equivalent, re-expressed as a distributed
  * `spark.range` pipeline — no driver-side data generation).
  */
object KMeansCsv {

  /** `x y` space-delimited text → (x double, y double). */
  def readPoints(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("x double, y double")
      .option("delimiter", " ")
      .csv(path)

  /** `id x y` space-delimited text → (id int, x double, y double). */
  def readCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("id int, x double, y double")
      .option("delimiter", " ")
      .csv(path)

  /** Write as space-delimited text (reference `writeAsCsv(path, "\n", " ")`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("delimiter", " ").csv(path)

  /** Small deterministic in-memory demo set: 3 visually obvious 2-D
    * clusters around (-8,-8), (0,8), (8,-2) — the reference's
    * `KMeansData.getDefaultPointDataSet` role (data values are our
    * own, not copied). */
  def demoPoints(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = Seq((-8.0, -8.0), (0.0, 8.0), (8.0, -2.0))
    val offsets = Seq(
      (0.0, 0.0), (0.5, 0.3), (-0.4, 0.6), (0.8, -0.7), (-0.9, -0.2),
      (0.2, 0.9), (-0.6, -0.8), (1.0, 0.1), (-0.1, -1.0), (0.4, 0.4))
    base.flatMap { case (cx, cy) =>
      offsets.map { case (dx, dy) => (cx + dx, cy + dy) }
    }.toDF("x", "y")
  }

  def demoCentroids(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0, -7.0, -7.0), (1, 1.0, 7.0), (2, 7.0, -1.0)).toDF("id", "x", "y")
  }

  /** Reference-generator parity: write both `points` and `centers`
    * space-delimited files under `outDir` (the reference's
    * `KMeansDataGenerator` emits the same pair). */
  def generateAndWrite(spark: SparkSession, outDir: String, n: Long, k: Int,
                       stddev: Double, range: Double, seed: Long): Unit = {
    import spark.implicits._
    writeCsv(generatePoints(spark, n, k, stddev, range, seed), s"$outDir/points")
    val centers = generateCenters(spark, k, range, seed)
      .zipWithIndex.map { case ((x, y), i) => (i, x, y) }
    writeCsv(centers.toSeq.toDF("id", "x", "y"), s"$outDir/centers")
  }

  private[sources] def generateCenters(spark: SparkSession, k: Int, range: Double,
                                       seed: Long): Array[(Double, Double)] =
    spark.range(0, k, 1, 1)
      .select(
        (org.apache.spark.sql.functions.rand(seed) * 2 * range - range).as("cx"),
        (org.apache.spark.sql.functions.rand(seed + 1) * 2 * range - range).as("cy"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))

  /** Seeded synthetic generator: k Gaussian clusters in [-range,
    * range]², stddev spread — distributed, deterministic for a fixed
    * (seed, numPartitions). Mirrors the reference generator's
    * parameters (-points -k -stddev -range -seed). */
  def generatePoints(spark: SparkSession, n: Long, k: Int, stddev: Double,
                     range: Double, seed: Long, numPartitions: Int = 4): DataFrame = {
    // k deterministic centers derived from the seed via uniform rand.
    val centers = generateCenters(spark, k, range, seed)
    val centerX = array(centers.map(c => lit(c._1)).toIndexedSeq: _*)
    val centerY = array(centers.map(c => lit(c._2)).toIndexedSeq: _*)
    spark.range(0, n, 1, numPartitions)
      .select(
        (pmod(col("id"), lit(k)) + 1).cast("int").as("c"),
        randn(seed + 2).as("gx"), randn(seed + 3).as("gy"))
      .select(
        (element_at(centerX, col("c")) + col("gx") * stddev).as("x"),
        (element_at(centerY, col("c")) + col("gy") * stddev).as("y"))
  }
}
