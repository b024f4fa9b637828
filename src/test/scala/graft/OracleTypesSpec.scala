package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.sys.process._

/** Oracle type-drift guard (round-5 verdict task 2).
  *
  * `text_bigram_coverage` failed round 5's driver hash because DuckDB
  * returns HUGEINT (INT128) for uncast `SUM(CASE …)` / `//` while Spark
  * emits BIGINT — values agreed, the TYPE poisoned the value hash, and
  * the local canonical-string comparison (tools/check_oracle.py) could
  * not see it. This spec binds every `SparkEntry.oracleSql` entry in
  * DuckDB via `DESCRIBE` (no execution) and fails on any banned output
  * type (HUGEINT / DECIMAL / unsigned ints), so the whole drift class
  * is a local red bar instead of a driver-round surprise.
  *
  * DuckDB lives on the driver side of the box (python3 + duckdb 1.0);
  * the guard shells out and is cancelled — not passed — when that
  * environment is absent, so `sbt test` stays runnable anywhere.
  */
class OracleTypesSpec extends AnyFunSuite {

  /** Queries deliberately declared WITHOUT an oracle. Adding a name
    * here is a reviewed decision, not a fallback — everything else
    * must be hash-checked. */
  private val SanctionedRowsOnly = Set.empty[String]

  test("oracle keys and declared queries stay in bijection (minus the sanctioned set)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // a typo'd oracle key would SILENTLY downgrade its query to the
    // driver's weaker rows-only check — fail loudly here instead
    val orphanOracles = o -- q
    assert(orphanOracles.isEmpty, s"oracles without a declared query: $orphanOracles")
    val unchecked = q -- o -- SanctionedRowsOnly
    assert(unchecked.isEmpty,
      s"queries with neither an oracle nor a sanctioned-rows-only entry: $unchecked")
    val staleSanction = SanctionedRowsOnly -- (q -- o)
    assert(staleSanction.isEmpty,
      s"sanctioned entries that now have an oracle or no query (remove them): $staleSanction")
  }

  test("every oracle binds in DuckDB with driver-hashable column types") {
    val script = new java.io.File("tools/oracle_types.py")
    assume(script.isFile, s"tools/oracle_types.py not found at ${script.getAbsolutePath}")

    val oracleJson = Files.createTempFile("graft-oracles", ".json")
    Files.writeString(oracleJson, util.OracleJson.dump(SparkEntry.oracleSql))

    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val exit =
      try Seq("python3", script.getAbsolutePath, "/root/testdata/sf0.001",
        oracleJson.toString).!(logger)
      catch { case _: java.io.IOException => 2 } // no python3 on PATH
    finally Files.deleteIfExists(oracleJson)

    assume(exit != 2, s"duckdb/python3 unavailable, guard skipped:\n$out")
    assert(exit == 0, s"oracle type drift detected:\n$out")
  }
}
