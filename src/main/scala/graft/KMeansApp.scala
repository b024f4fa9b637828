package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cluster.KMeansNative
import graft.functions.VectorOps
import graft.sources.KMeansCsv

/** Reference-parity CLI (SURVEY.md §2.1 row 13): the whole reference
  * program as one main —
  *   --points <csv> --centroids <csv> --output <dir> --iterations <n>
  * Missing --points/--centroids → in-memory demo data; missing
  * --output → print to stdout; both exactly the reference's fallback
  * behavior.
  */
object KMeansApp {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  /** points (x, y) + centroids (id, x, y) → (clustered points df with
    * `id` column, final centroids). */
  def run(points: DataFrame, centroids: DataFrame, iterations: Int)
      : (DataFrame, Array[(Int, Array[Double])]) = {
    val pts = points.select(array(col("x"), col("y")).as("v"))
    val init = centroids.orderBy("id")
      .collect().map(r => r.getInt(0) -> Array(r.getDouble(1), r.getDouble(2)))
    // ids may be arbitrary ints; fit works on 0..k-1 positions.
    val fit = KMeansNative.fit(pts, "v", init.map(_._2), maxIter = iterations, tol = 0.0)
    val finalCenters = init.map(_._1).zip(fit.centers)
    val assignedDf = KMeansNative.assigned(
      points.withColumn("v", array(col("x"), col("y"))), col("v"), fit.centers)
    val idForPos = map(finalCenters.zipWithIndex.flatMap {
      case ((id, _), pos) => Seq(lit(pos), lit(id))
    }.toIndexedSeq: _*)
    val out = assignedDf.select(
      element_at(idForPos, col("cluster_id")).as("id"), col("x"), col("y"))
    (out, finalCenters)
  }

  def main(args: Array[String]): Unit = {
    val params = parseArgs(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("KMeans")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val points = params.get("points")
        .map(KMeansCsv.readPoints(spark, _))
        .getOrElse(KMeansCsv.demoPoints(spark))
      val centroids = params.get("centroids")
        .map(KMeansCsv.readCentroids(spark, _))
        .getOrElse(KMeansCsv.demoCentroids(spark))
      val iterations = params.getOrElse("iterations", "10").toInt
      val (clustered, _) = run(points, centroids, iterations)
      params.get("output") match {
        case Some(path) => KMeansCsv.writeCsv(clustered, path)
        case None       => clustered.show(100, truncate = false)
      }
    } finally spark.stop()
  }
}
