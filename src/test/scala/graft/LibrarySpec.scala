package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.VectorSumAgg.vec_sum
import graft.io.{Sinks, Tables}
import graft.operators.Skew

/** Library-depth surfaces: UDAF aggregator, salting, partitioned
  * sinks, extensions registration. */
class LibrarySpec extends SparkSpec {
  import spark.implicits._

  test("VectorSumAgg equals the posexplode formulation on the fixture") {
    val pts = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        (col("vec_id") % 7).as("g"))
    val viaUdaf = pts.groupBy("g").agg(vec_sum(64)(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = pts.select(col("g"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("g", "d").agg(sum("x").as("s"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq).toMap
    viaUdaf.foreach { case (g, s) =>
      s.zip(viaExplode(g)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf001)
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), col("l_quantity"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    direct.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 === n)
    }
  }

  test("salted join equals the plain join, with no hot-key task funnel") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_linenumber", "l_returnflag")
    val dim = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("dim_n"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber", "l_returnflag", "dim_n")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    val plain = rows(li.join(dim.withColumnRenamed("l_returnflag", "_k"),
      col("l_returnflag") === col("_k")).drop("_k"))
    val maxTask = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) maxTask.getAndUpdate(p => math.max(p, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE's partition coalescing folds this toy-sized shuffle into ONE
    // task regardless of keys, hiding the distribution under test;
    // disable it and widen the reduce side so the two regimes separate
    // (at cluster scale the hot key exceeds any coalesce target and
    // the same spread is what saves the join)
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val salted =
      try {
        val got = rows(Skew.saltedJoin(li, dim, "l_returnflag", buckets = 16))
        org.apache.spark.GraftSparkShims.drainListenerBus(spark.sparkContext)
        got
      } finally {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(salted === plain)
    // 3 hot keys × 16 salts over 32 reduce tasks: a task holds a few
    // hundred rows; an unsalted 3-key join concentrates a whole flag
    // (~2000 rows, a third of the table) in one task
    val total = li.count()
    assert(maxTask.get < total / 6,
      s"a task read ${maxTask.get} of $total shuffle records — salt not spreading")
  }

  test("incremental state merge equals the flat aggregate for any split") {
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"), col("l_orderkey"),
        col("l_extendedprice").cast("decimal(38,2)").as("p"))
    val keys = Seq("l_returnflag")
    val flat = li.groupBy("l_returnflag")
      .agg(sum("p").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    // three disjoint slices, including one that owns some groups
    // exclusively (flag 'R' only in slice c — new-group path)
    val a = li.filter(pmod(col("l_orderkey"), lit(3)) === 0 && col("l_returnflag") =!= "R")
    val b = li.filter(pmod(col("l_orderkey"), lit(3)) =!= 0 && col("l_returnflag") =!= "R")
    val c = li.filter(col("l_returnflag") === "R")
    val merged = graft.operators.Incremental.finalizeState(
      graft.operators.Incremental.mergeStates(
        Seq(a, b, c).map(s => graft.operators.Incremental.partialState(s, keys, col("p"))),
        keys), keys)
      .collect().map(r => r.getString(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    assert(merged.keySet === flat.keySet)
    flat.foreach { case (k, (s, n)) =>
      assert(merged(k)._1.compareTo(s) === 0 && merged(k)._2 === n, s"group $k")
    }
  }

  test("partitioned sink round-trips and prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val docs = Tables.documents(spark, sf001)
    Sinks.writePartitioned(docs, s"$dir/docs", Seq("lang"))
    val back = Sinks.readPartitioned(spark, s"$dir/docs")
    assert(back.count() === docs.count())
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val one = back.filter(col("lang") === langs.head)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains(s"lang"), "partition filter should reach the scan")
    assert(one.count() === docs.filter(col("lang") === langs.head).count())
  }

  test("MLlib KMeans model save/load round-trip preserves centers") {
    val dir = Files.createTempDirectory("graft-model").toString
    val pts = Tables.embeddings(spark, sf001)
      .select(col("embedding").cast("array<double>").as("v"))
    val model = graft.cluster.KMeansMl.fit(pts, "v", 5, seed = 42, maxIter = 5)
    model.write.overwrite().save(s"$dir/km")
    val back = org.apache.spark.ml.clustering.KMeansModel.load(s"$dir/km")
    val a = model.clusterCenters.map(_.toArray.toSeq)
    val b = back.clusterCenters.map(_.toArray.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("bucketed tables join without a shuffle exchange on the join key") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf001).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val j = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n${plan.take(800)}")
    assert(j.count() === li.count())
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }

  test("declared rel_bucketed_join: no exchange on either join input") {
    val df = graft.queries.RelationalQueries.bucketedJoin(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    // the join reads co-located buckets directly, whatever physical
    // join AQE picks (tiny fixtures broadcast; big ones sort-merge):
    // NO exchange may ever partition on a join key — the only
    // hash exchange allowed is the group-cardinality aggregate tail
    val keyExchanges = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey"))).toSeq
    assert(keyExchanges.isEmpty,
      s"bucketed join inputs must not shuffle on the join key:\n$keyExchanges")
    assert(plan.contains("Join"), s"expected a join:\n${plan.take(400)}")
  }

  test("ORC and JSON sinks round-trip the documents table") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    val docs = Tables.documents(spark, sf001)
    docs.write.mode("overwrite").orc(s"$dir/docs_orc")
    docs.write.mode("overwrite").json(s"$dir/docs_json")
    val orc = spark.read.orc(s"$dir/docs_orc")
    val json = spark.read.schema(docs.schema).json(s"$dir/docs_json")
    assert(orc.count() === docs.count())
    assert(json.count() === docs.count())
    val origSum = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(orc.agg(sum("n_chars")).collect()(0).getLong(0) === origSum)
    assert(json.agg(sum("n_chars")).collect()(0).getLong(0) === origSum)
  }

  test("GraftExtensions class applies cleanly (injectFunction wiring)") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(e)
  }

  test("Bench timing surfaces a throwing query as the -1.0 sentinel") {
    assert(Bench.timeOnce(() => throw new RuntimeException("boom")) === -1.0)
    assert(Bench.timeOnce(() => ()) >= 0.0)
    // a failed rep poisons the query's reported value, never deflates it
    val (best, reps) = Bench.bestOf(() => throw new RuntimeException("boom"))
    assert(best === -1.0)
    assert(reps.forall(_ === -1.0) && reps.length === 2)
    val (ok, okReps) = Bench.bestOf(() => ())
    assert(ok >= 0.0 && okReps.forall(_ >= 0.0))
  }
}
