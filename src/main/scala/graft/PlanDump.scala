package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Optimization-evidence harness (round 17): writes the
  * `.explain("formatted")` text of declared queries to files so plan
  * claims (Exchange counts, join strategies, PushedFilters/ReadSchema)
  * are reviewable without running Spark. Usage:
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> [queryName ...]"
  * One `<outDir>/<name>.txt` per query; no actions are executed
  * (streaming queries are skipped — their batch plans are only
  * defined inside a running micro-batch).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r17"
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.builder(GraftSession.envCpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = ExplainMode.fromString("formatted")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        // stream_* queries run real micro-batch jobs on construction;
        // their meaningful plans live in the batch twins they mirror.
        if (!name.startsWith("stream_")) {
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(mode)
            Files.writeString(Paths.get(outDir, s"$name.txt"), txt)
            println(s"[plandump] wrote $outDir/$name.txt")
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
        }
      }
    }
    spark.stop()
  }
}
