package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001).cache()

  test("packSequences: token conservation, full sequences, bucket invariance") {
    import org.apache.spark.sql.functions._
    val budget = 256
    val p = graft.operators.TextAnalysis
      .packSequences(docs, "lang", "doc_id", "text", budget).cache()
    // every token lands in exactly one span: per-language span totals
    // equal per-language token totals
    val toks = docs.groupBy("lang")
      .agg(sum(size(graft.functions.TextOps.words(col("text")))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val spans = p.groupBy("lang").agg(sum("n_toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spans === toks)
    // span geometry: offsets in [0, budget), spans fit their window
    assert(p.filter(col("seq_off") < 0 || col("seq_off") >= budget ||
      col("n_toks") <= 0 || col("seq_off") + col("n_toks") > budget).count() === 0)
    // concat-and-split: every sequence except each language's last is
    // exactly full
    val bySeq = p.groupBy("lang", "seq_id").agg(sum("n_toks").as("t"))
    val lastSeq = bySeq.groupBy("lang").agg(max("seq_id").as("last"))
    assert(bySeq.join(lastSeq, "lang")
      .filter(col("seq_id") =!= col("last") && col("t") =!= budget)
      .count() === 0)
    // the two-level prefix sum is result-invisible for any bucketing
    val one = graft.operators.TextAnalysis
      .packSequences(docs, "lang", "doc_id", "text", budget, buckets = 1)
    assert(p.exceptAll(one).count() === 0 && one.exceptAll(p).count() === 0)
    p.unpersist()
  }

  test("token stats: n_chars equals fixture n_chars; avg word len consistent") {
    val joined = TextAnalysis.tokenStats(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("n_chars").as("expected")), "doc_id")
    assert(joined.filter(col("n_chars") =!= col("expected")).count() === 0)
    val r = joined.filter(
      abs(col("avg_word_len") * col("n_tokens") -
        (col("n_chars") - col("n_tokens") + 1).cast("double")) > lit(1e-9))
    assert(r.count() === 0)
  }

  test("quality score is within [0, 1] and rewards stopword-rich clean text") {
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
    assert(q.filter(col("score") < 0 || col("score") > 1).count() === 0)
    val synthetic = Seq(
      (1L, "the cat sat on the mat and the dog is in it for now"),
      (2L, "zzzz qqqq xxxx wwww kkkk jjjj")).toDF("doc_id", "text")
    val s = TextAnalysis.qualityScore(synthetic, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(1L) > s(2L))
  }

  test("langId picks the profile language for obvious inputs, ties break alphabetically") {
    val synthetic = Seq(
      (1L, "der hund ist auf das sofa und nicht mit der katze"),
      (2L, "el perro en la casa con los gatos por una puerta"),
      (3L, "nothing matches any profile whatsoever zzz")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(synthetic, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === "de")
    assert(got(2L)._1 === "es")
    assert(got(3L) === ("de", 0.0)) // all-zero tie -> first lang alphabetically
  }

  test("BPE-ish segmentation splits punctuation and digit runs") {
    val messy = Seq((1L, "hello world42 it's x-1 done")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeTokenStats(messy, "doc_id", "text").collect()(0)
    assert(r.getInt(1) === 5) // whitespace tokens
    // hello | world | 42 | it | ' | s | x | - | 1 | done
    assert(r.getInt(2) === 10)
  }

  test("fingerprint distinguishes different docs and is stable") {
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text")
    assert(fp.select("fingerprint").distinct().count() >= docs.count() - 5)
    assert(fp.filter(col("fingerprint") < 0).count() === 0)
  }

  test("vocabulary counts occurrences and document frequency") {
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("a") === ((3L, 2L)))
    assert(v("b") === ((1L, 1L)))
    assert(v("c") === ((1L, 1L)))
  }

  test("stratified sample takes every k-th doc per stratum deterministically") {
    val sampled = TextAnalysis.stratifiedSample(
      Tables.documents(spark, sf001).select("doc_id", "lang"), "lang", "doc_id", 10)
    val perLang = Tables.documents(spark, sf001).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) === (n + 9) / 10, s"lang=$lang n=$n")
    }
    // deterministic: same rows both runs
    val a = sampled.collect().map(_.toSeq).toSet
    val b = TextAnalysis.stratifiedSample(
      Tables.documents(spark, sf001).select("doc_id", "lang"), "lang", "doc_id", 10)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("stratumRank equals the naive per-stratum window rank") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang")
    val naive = docs.withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("doc_id")))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong)).toMap
    // several bucket counts, including degenerate ones
    for (b <- Seq(1, 7, 256)) {
      val got = TextAnalysis.stratumRank(docs, "lang", "doc_id", buckets = b)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got === naive, s"buckets=$b")
    }
    // sizeCol (r17): the per-stratum total shipped on the counts
    // broadcast must equal the naive groupBy count, on every row
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val withN = TextAnalysis.stratumRank(docs, "lang", "doc_id",
        buckets = 7, sizeCol = Some("_n"))
      .select("lang", "_n")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(withN.nonEmpty && withN.forall { case (l, n) => sizes(l) == n })
  }

  test("repetition stats: hand-checked values, zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),        // bigrams: "a a","a a","a b" → max 2, dup 1/3
      (2L, "x y z"),          // all distinct
      (3L, "w"),              // no bigrams
      (4L, "q q q q"))        // bigrams: "q q"×3 → dup 2/3
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).toSeq === Seq(1L, 4, 0.5, 3, 2L, 1.0 / 3))
    assert(r(1).toSeq === Seq(2L, 3, 0.0, 2, 1L, 0.0))
    assert(r(2).toSeq === Seq(3L, 1, 0.0, 0, 0L, 0.0))
    assert(r(3).toSeq === Seq(4L, 4, 0.75, 3, 3L, 2.0 / 3))
    val plan = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition stats must not shuffle:\n$plan")
  }

  test("chunking: hand-checked windows, single-chunk fp equals doc fingerprint, zero shuffle") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val r = TextAnalysis.chunkStats(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "chunk_id").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getInt(2))).toSeq ===
      Seq((1L, 0, 2), (1L, 1, 2), (1L, 2, 1), (2L, 0, 2)))
    // a whole-doc chunk's fingerprint is the document fingerprint
    val whole = TextAnalysis.chunkStats(docs, "doc_id", "text", 100)
      .select("doc_id", "chunk_fp")
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text")
    assert(whole.orderBy("doc_id").collect().map(_.getLong(1)).toSeq ===
      fp.orderBy("doc_id").collect().map(_.getLong(1)).toSeq)
    val plan = TextAnalysis.chunkStats(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("mix sampler: rate 0 drops all, 10000 keeps all, rates nest, zero shuffle") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    def run(bps: Int) = TextAnalysis.mixSample(
        docs, "lang", "doc_id", langs.map(_ -> bps).toMap)
      .collect().map(_.getLong(0)).toSet
    assert(run(0).isEmpty)
    assert(run(10000).size === docs.count())
    // admission sets are NESTED in the rate (h < r1 implies h < r2 for
    // r1 <= r2) — raising a stratum's rate only adds rows
    val half = run(5000); val quarter = run(2500)
    assert(quarter.subsetOf(half))
    // per-stratum rates apply independently
    val mixed = TextAnalysis.mixSample(docs, "lang", "doc_id",
      Map(langs.head -> 10000), defaultBps = 0)
    val kept = mixed.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(kept === Set(langs.head))
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix sampler must not shuffle:\n$plan")
  }

  test("stratified sample is invariant to the bucket count") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang")
    def run(b: Int) = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", 10, buckets = b)
      .collect().map(_.toSeq).toSet
    val one = run(1)
    assert(one.nonEmpty)
    assert(run(13) === one)
    assert(run(256) === one)
  }

  test("hash-mod sampler: deterministic, zero-shuffle semantics, ~1/k per stratum") {
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang")
    val s1 = TextAnalysis.hashModSample(docs, "doc_id", 10)
    val s2 = TextAnalysis.hashModSample(docs, "doc_id", 10)
    val a = s1.collect().map(_.toSeq).toSet
    assert(a === s2.collect().map(_.toSeq).toSet)
    // admission is a pure filter: no Exchange in the plan
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampler must not shuffle:\n$plan")
    // proportional-ish allocation per stratum (multiplicative hash
    // decorrelates from id order); loose 3x bounds at fixture size
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val s = got.getOrElse(lang, 0L).toDouble
      assert(s >= n / 10.0 / 3 - 2 && s <= n / 10.0 * 3 + 2, s"lang=$lang $s of $n")
    }
  }

  test("tf-idf top terms: ranks contiguous, rarer term outranks commoner at equal tf") {
    val docs = Seq(
      (1L, "rare common common"),   // tf(rare)=1 df=1; tf(common)=2 df=3
      (2L, "common other"),
      (3L, "common else")).toDF("doc_id", "text")
    val r = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSeq
    // doc 1: score(rare)=1*3/1=3.0 > score(common)=2*3/3=2.0
    assert(r.filter(_._1 == 1L).sortBy(_._2).map(_._3) === Seq("rare", "common"))
    r.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1 to rows.length))
    }
  }

  test("corpus stats totals reconcile with the whole table") {
    val c = TextAnalysis.corpusStats(docs)
    val total = c.agg(sum("n_docs"), sum("total_chars")).collect()(0)
    assert(total.getLong(0) === docs.count())
    assert(total.getLong(1) ===
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
  }

  test("bigram coverage: self-composed reference doc scores 1000, signal discriminates") {
    import spark.implicits._
    // reference slice = 'ref' docs sharing a small bigram vocabulary;
    // a doc built purely from reference text must score 1000 permille,
    // an alien-vocabulary doc 0
    val corpus = Seq(
      (1L, "the data engine runs the data engine", "ref"),
      (2L, "the data engine runs fast today here", "ref"),
      (3L, "the data engine runs the data engine", "cand"),
      (4L, "zebra quokka lemur wombat differ wholly", "cand"))
      .toDF("doc_id", "text", "slice")
    val scored = TextAnalysis.bigramCoverage(corpus, "doc_id", "text",
        refFilter = col("slice") === "ref", refK = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored(3L) === 1000L, s"pure-reference doc: ${scored(3L)}")
    assert(scored(4L) === 0L, s"alien doc: ${scored(4L)}")
    // fixture corpus: en docs must out-cover non-en on an en reference
    val real = TextAnalysis.bigramCoverage(
        Tables.documents(spark, sf001), "doc_id", "text",
        refFilter = col("lang") === "en", refK = 200)
      .join(Tables.documents(spark, sf001).select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("coverage_permille").as("c"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(real(true) > real(false),
      s"en avg ${real(true)} must exceed non-en ${real(false)}")
  }

  test("bigram LM score: hand-checked conditionals, boilerplate outranks shuffled text") {
    import spark.implicits._
    // corpus: "a b" occurs twice, "a c" once; c("a") = 4 unigram
    // OCCURRENCES (the lone-"a" doc counts too — c1 is total token
    // frequency, not prefix frequency) → P(b|a) = 2/4, P(c|a) = 1/4;
    // single-token doc 4 has no bigrams and emits nothing
    val corpus = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "a"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramLmScore(corpus, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((1L, 500L)))   // 1000*2 DIV 4
    assert(r(3L) === ((1L, 250L)))   // 1000*1 DIV 4
    assert(!r.contains(4L))
    // fixture sanity: a doc made of the corpus's commonest bigram
    // must outscore every real doc's mean (boilerplate ceiling)
    val docs = Tables.documents(spark, sf001)
    val scored = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
    val mean = scored.agg(avg("lm_score_permille")).first.getDouble(0)
    assert(mean > 0.0 && mean < 1000.0, s"mean permille out of range: $mean")
  }

  test("held-out bigram LM: reference-domain docs outscore OOV docs; full OOV scores exactly 0") {
    import spark.implicits._
    // reference corpus: "a b" dominates; scoring corpus has an
    // in-domain doc, a half-domain doc ("a x": head 'a' known, bigram
    // unseen -> p=0), and a fully-OOV doc (must score EXACTLY 0, not
    // drop — OOV is the signal a domain filter keys on)
    val ref = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val scoreMe = Seq((10L, "a b"), (11L, "a x"), (12L, "z q")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLmScoreHeldOut(ref, scoreMe, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(10L) === ((1L, 666L))) // P(b|a) = 1000*2 DIV 3 (c1("a") = 3)
    assert(r(11L) === ((1L, 0L)))   // head known, bigram unseen
    assert(r(12L) === ((1L, 0L)))   // fully OOV — scored, not dropped
    // fixture direction check: the en-trained reference LM must score
    // the en stratum strictly above the non-en strata on average (the
    // domain signal the held-out form exists to expose — the
    // in-corpus scorer cannot distinguish strata this way)
    val docs = Tables.documents(spark, sf001)
    val scored = TextAnalysis.bigramLmScoreHeldOut(
        docs.filter(col("lang") === "en"), docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val byLang = scored.groupBy(col("lang") === "en")
      .agg(avg("lm_score_permille").as("m"))
      .collect().map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en-trained LM must prefer en docs: $byLang")
  }

  test("pii scrub counts and redacts emails and phones, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org today"),
      (2L, "call +1-415-555-0199 or +1-212-555-0100"),
      (3L, "no pii here at all"),
      (4L, "both a@b.io and +1-650-555-0123 appear"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getString(3)))).toMap
    assert(r(1L) === ((1, 0, "reach me at <EMAIL> today")))
    assert(r(2L) === ((0, 2, "call <PHONE> or <PHONE>")))
    assert(r(3L) === ((0, 0, "no pii here at all")))
    assert(r(4L) === ((1, 1, "both <EMAIL> and <PHONE> appear")))
  }

  test("boilerplate lines vanish above the share bar, body lines survive in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one\nFOOTER\nbeta two"),
      (2L, "gamma three\nFOOTER\ndelta four"),
      (3L, "epsilon five\nFOOTER"),
      (4L, "zeta six\nrare line"))
      .toDF("doc_id", "text")
    // FOOTER in 3/4 docs (> 0.5 share) must go; every other line is
    // unique and stays, in original order
    val r = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", maxDocShare = 0.5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) === ((3L, 1L, "alpha one\nbeta two")))
    assert(r(2L) === ((3L, 1L, "gamma three\ndelta four")))
    assert(r(3L) === ((2L, 1L, "epsilon five")))
    assert(r(4L) === ((2L, 0L, "zeta six\nrare line")))
  }

  test("a doc whose every line is boilerplate cleans to the empty string") {
    import spark.implicits._
    val docs = Seq((1L, "X"), (2L, "X"), (3L, "X\nkeep me"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.removeBoilerplateLines(docs, "doc_id", "text", maxDocShare = 0.5)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(1L) === "")
    assert(r(3L) === "keep me")
  }

  test("bm25TopK: matches a pure-Scala BM25 reference on a small corpus") {
    val corpus = Seq(
      (1L, "hash join scan hash hash"),
      (2L, "join join join window"),
      (3L, "vector vector scan window hash join"),
      (4L, "the quick brown fox"), // no query terms — absent from output
      (5L, "scan"))
    val df = corpus.toDF("doc_id", "text")
    val terms = Seq("hash", "join", "scan", "window", "vector")
    val got = graft.operators.TextAnalysis
      .bm25TopK(df, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // pure reference: same rational formulation, Long/Double arithmetic
    val words = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = corpus.size.toLong
    val sumdl = words.map(_._2.size.toLong).sum
    val dl = words.map { case (id, w) => id -> w.size.toLong }.toMap
    val tf = words.flatMap { case (id, w) =>
      w.filter(terms.contains).groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) } }
    val dfreq = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val exp = tf.map { case (id, t, f) =>
        val idf = (2L * (n - dfreq(t)) + 1L).toDouble / (2L * dfreq(t) + 1L)
        val tfc = (44L * f * sumdl).toDouble /
          (20L * f * sumdl + 6L * sumdl + 18L * dl(id) * n)
        (id, math.floor(idf * tfc * 1000000.0).toLong)
      }.groupBy(_._1).map { case (id, xs) => (id, xs.map(_._2).sum, xs.size.toLong) }
      .toSeq.sortBy { case (id, s, _) => (-s, id) }
      .zipWithIndex.map { case ((id, s, nt), i) => (i + 1, id, nt, s) }
    assert(got.toSeq === exp)
    assert(!got.exists(_._2 == 4L)) // no-match doc absent
  }

  test("bm25TopKPerQuery: one-query batch equals bm25TopK; shared terms scored once") {
    val corpus = Seq(
      (1L, "hash join scan hash hash"),
      (2L, "join join join window"),
      (3L, "vector vector scan window hash join"),
      (4L, "the quick brown fox"),
      (5L, "scan"))
    val df = corpus.toDF("doc_id", "text")
    val terms = Seq("hash", "join", "scan", "window", "vector")
    // law: a single-query batch reproduces the global variant exactly
    // (modulo the query_id column and rank column order)
    val single = graft.operators.TextAnalysis
      .bm25TopK(df, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val qt1 = terms.map(t => (7, t)).toDF("query_id", "token")
    val batch = graft.operators.TextAnalysis
      .bm25TopKPerQuery(df, "doc_id", "text", qt1, k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(batch === single)
    // multi-query batch: each query's rows equal its own single-query run
    val qt = (Seq("hash", "join").map(t => (1, t)) ++
      Seq("scan", "window", "vector").map(t => (2, t))).toDF("query_id", "token")
    val multi = graft.operators.TextAnalysis
      .bm25TopKPerQuery(df, "doc_id", "text", qt, k = 10)
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
      .toMap
    for ((qid, qterms) <- Seq(1 -> Seq("hash", "join"), 2 -> Seq("scan", "window", "vector"))) {
      val alone = graft.operators.TextAnalysis
        .bm25TopKPerQuery(df, "doc_id", "text",
          qterms.map(t => (qid, t)).toDF("query_id", "token"), k = 10)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(multi(qid) === alone, s"query $qid")
    }
  }

  test("quality buckets equal the naive NTILE window formulation") {
    import org.apache.spark.sql.expressions.Window
    val ta = graft.operators.TextAnalysis
    val lm = ta.bigramLmScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("lm_score_permille"))
    val lang = ta.langId(docs, "doc_id", "text")
      .select(col("doc_id"), col("predicted_lang").as("lang"))
    val naive = lm.join(lang, "doc_id")
      .withColumn("bucket", ntile(3).over(
        Window.partitionBy("lang").orderBy(col("lm_score_permille"), col("doc_id")))
        .cast("long"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("lm_score_permille").as("min_permille"),
        max("lm_score_permille").as("max_permille"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val mine = ta.qualityBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(mine === naive)
    // buckets within a language are balanced to within one row
    val sizes = mine.groupBy(_._1).values
    sizes.foreach { bs =>
      val ns = bs.map(_._3)
      assert(ns.max - ns.min <= 1, s"unbalanced buckets: $bs")
    }
  }

  test("ppsSample equals the naive single-window formulation for any bucket count") {
    import org.apache.spark.sql.expressions.Window
    val step = 97
    val naive = docs
      .select(col("lang"), col("doc_id").cast("bigint").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("e", sum("n_toks").over(
        Window.partitionBy("lang").orderBy("doc_id")))
      .withColumn("n_picks", expr(s"(e DIV $step) - ((e - n_toks) DIV $step)"))
      .filter(col("n_picks") > 0)
      .select("lang", "doc_id", "n_toks", "n_picks")
      .collect().toSet
    for (buckets <- Seq(1, 3, 256)) {
      val got = TextAnalysis.ppsSample(docs, "lang", "doc_id", "text",
        step = step, buckets = buckets).collect().toSet
      assert(got === naive, s"buckets=$buckets")
    }
    assert(naive.nonEmpty)
  }

  test("ppsSample: per-stratum pick mass is exactly floor(tokens/step); long docs multi-pick") {
    import spark.implicits._
    val step = 97
    val got = TextAnalysis.ppsSample(docs, "lang", "doc_id", "text", step = step)
      .groupBy("lang").agg(sum("n_picks").as("p"))
    val tot = docs.select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("lang").agg(sum("t").as("tot"))
    got.join(tot, "lang").collect().foreach { r =>
      assert(r.getAs[Long]("p") === r.getAs[Long]("tot") / step,
        s"lang ${r.getAs[String]("lang")}")
    }
    // a document longer than several steps is picked once per dart
    val toy = Seq(("en", 1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("lang", "doc_id", "text")
    val picks = TextAnalysis.ppsSample(toy, "lang", "doc_id", "text", step = 3)
      .collect()
    assert(picks.length === 1 && picks.head.getAs[Long]("n_picks") === 3L)
  }

  test("shardAssign: per-shard positions dense, hash-ordered, bucket-invariant") {
    import org.apache.spark.sql.expressions.Window
    val P = TextAnalysis.SampleHashP; val A = TextAnalysis.SampleHashA
    val naive = docs
      .select(col("doc_id").cast("bigint").as("doc_id"))
      .withColumn("_h", pmod(pmod(col("doc_id"), lit(P)) * lit(A), lit(P)))
      .withColumn("shard", pmod(col("_h"), lit(8L)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("_h", "doc_id")).cast("bigint"))
      .select("doc_id", "shard", "pos")
      .collect().toSet
    for (buckets <- Seq(1, 7, 256)) {
      val got = TextAnalysis.shardAssign(docs, "doc_id", numShards = 8,
        buckets = buckets).collect().toSet
      assert(got === naive, s"buckets=$buckets")
    }
    // bijection: every doc exactly once; positions dense per shard
    assert(naive.size === docs.count())
    naive.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getLong(2)).toSeq.sorted
      assert(ps === (1L to ps.length).toSeq, s"shard $shard not dense")
    }
  }

  test("lengthBatching: equals naive window; full batches; zero padding when uniform") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val sized = docs.select(col("doc_id").cast("bigint").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("len_bucket", expr("n_toks DIV 32"))
    val naive = sized
      .withColumn("r", row_number().over(
        Window.partitionBy("len_bucket").orderBy("doc_id")))
      .withColumn("batch_id", expr("(r - 1) DIV 16"))
      .groupBy("len_bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"), max("n_toks").as("max_toks"),
        sum("n_toks").as("sum_toks"))
      .withColumn("padding_permille",
        expr("CAST((1000 * (n_docs * max_toks - sum_toks)) " +
          "DIV greatest(n_docs * max_toks, 1) AS BIGINT)"))
      .collect().toSet
    val got = TextAnalysis.lengthBatching(docs, "doc_id", "text",
      bucketWidth = 32, batchSize = 16).collect().toSet
    assert(got === naive)
    // every batch except possibly a bucket's last is exactly full
    val byBucket = got.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byBucket.foreach { case (_, bs) =>
      val lastBatch = bs.map(_._2).max
      bs.filter(_._2 < lastBatch).foreach(b => assert(b._3 === 16L))
    }
    // uniform lengths -> zero padding
    val toy = (1L to 32L).map(i => (i, (1 to 40).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val pads = TextAnalysis.lengthBatching(toy, "doc_id", "text", 32, 16)
      .select("padding_permille").collect().map(_.getLong(0))
    assert(pads.nonEmpty && pads.forall(_ === 0L))
  }

  test("zipfCoverage: minimal head per threshold; closed-form toy") {
    import spark.implicits._
    // fixture: thresholds monotone in n_words, coverage proven minimal
    val rows = TextAnalysis.zipfCoverage(docs, "text")
      .orderBy("threshold_permille").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(500L, 900L, 990L))
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted)     // head grows
    // driver recompute: the counts, ranked the same way
    val counts = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }
    val total = counts.map(_._2).sum
    val cums = counts.scanLeft(0L)(_ + _._2).drop(1)
    rows.foreach { case (t, n, cov, tot) =>
      assert(tot === total)
      assert(cov === cums(n.toInt - 1))
      assert(cov * 1000 >= t * total)                                 // reaches
      if (n > 1) assert(cums(n.toInt - 2) * 1000 < t * total)         // minimally
    }
    // closed-form toy: a a a a b b c d
    val toy = Seq((1L, "a a a a b b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.zipfCoverage(toy, "text")
      .orderBy("threshold_permille").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((500L, 1L, 4L), (900L, 4L, 8L), (990L, 4L, 8L)))
  }

  test("skipgrams: window-2 hand check; window-1 equals the bigram multiset") {
    val toy = Seq((1L, "a b c a")).toDF("doc_id", "text")
    // offsets 1: (a b)(b c)(c a); offset 2: (a c)(b a)
    val got = TextAnalysis.skipgramCounts(toy, "doc_id", "text", window = 2, topN = 10)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got === Map("a b" -> 1L, "b c" -> 1L, "c a" -> 1L,
      "a c" -> 1L, "b a" -> 1L))
    // window=1 reduces to bigram occurrence counts on fixture data
    val sg1 = TextAnalysis.skipgramCounts(docs, "doc_id", "text", window = 1, topN = 20)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val bigrams = docs
      .select(explode(graft.functions.TextOps.shinglesAll(col("text"), 2)).as("bg"))
      .groupBy("bg").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sg1.foreach { case (p, n) => assert(bigrams(p) === n, p) }
    // single-token docs produce no pairs and no index-0 errors
    val tiny = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.skipgramCounts(tiny, "doc_id", "text").count() === 0)
  }

  test("skipgrams: tie-complete nominee cut resolves all-tied counts by pair ASC (r10 ADVICE)") {
    import spark.implicits._
    // 40 distinct adjacent pairs, each occurring exactly once: every
    // pair ties at the top-N margin, so a fixed limit(3·topN) nominee
    // cut would choose an arbitrary hash-ordered subset while the
    // GROUP BY oracle tie-breaks by pair ASC. The count-threshold cut
    // must nominate every tied bucket and return the
    // lexicographically smallest pairs.
    val text = (0 to 40).map(i => f"w$i%02d").mkString(" ")
    val toy = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.skipgramCounts(toy, "doc_id", "text", window = 1, topN = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val expect = (0 until 5).map(i => (i + 1, f"w$i%02d w${i + 1}%02d", 1L))
    assert(got.toSeq === expect)
  }

  test("lang confusion: rows conserve doc counts, cells match langId directly") {
    val m = TextAnalysis.langConfusion(docs, "doc_id", "text", "lang")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val byLabel = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.foreach { case (lang, n) =>
      val row = m.filter(_._1._1 == lang).values
      assert(row.map(_._1).sum === n, s"row $lang count")
      assert(row.map(_._2).sum <= 1000L, s"row $lang permille (floor division)")
    }
    // cells equal a direct langId x label recount
    val direct = TextAnalysis.langId(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "predicted_lang").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m.view.mapValues(_._1).toMap === direct)
  }

  test("collocations: hand-checked Dice ranking with tie-break on a toy corpus") {
    val docs = Seq(
      (1L, "big data big data pipeline"),
      (2L, "big data lake")).toDF("doc_id", "text")
    // unigrams: big=3 data=3 pipeline=1 lake=1
    // bigrams: "big data"x3 "data big"x1 "data pipeline"x1 "data lake"x1
    val got = TextAnalysis.collocations(docs, "doc_id", "text", minCount = 1, topN = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1, "big data", 3L, 1000L),
      (2, "data lake", 1L, 500L),       // dice tie with "data pipeline":
      (3, "data pipeline", 1L, 500L),   // bg ASC breaks it
      (4, "data big", 1L, 333L)))
  }

  test("collocations: minCount filters, dice bounded by 1000, ranks contiguous") {
    val docs = Tables.documents(spark, sf001)
    val got = TextAnalysis.collocations(docs, "doc_id", "text", minCount = 3, topN = 20)
      .orderBy("rank").collect()
    assert(got.nonEmpty && got.length <= 20)
    assert(got.map(_.getInt(0)).toSeq === (1 to got.length))
    got.foreach { r =>
      assert(r.getLong(2) >= 3L)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L)
    }
  }

  // driver replica of the corpus fold: h = (h·31 + codepoint) mod P
  private def foldFp(s: String): Long = {
    var h = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % graft.functions.TextOps.FingerprintMod
      i += Character.charCount(cp)
    }
    h
  }

  test("GramKernel rolling recurrence == direct per-position refold, bit-for-bit") {
    val k = 25
    val texts = docs.select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    val viaKernel = docs
      .select(col("doc_id"), graft.plans.expressions.gram_fingerprints(col("text"), k).as("g"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toArray)
    val direct = docs.select("doc_id", "text").orderBy("doc_id").collect().map { r =>
      val cps = r.getString(1).codePoints().toArray
      (0 to cps.length - k).map { i =>
        var h = 0L; var j = 0
        while (j < k) { h = (h * 31L + cps(i + j)) % graft.functions.TextOps.FingerprintMod; j += 1 }
        h
      }.toArray
    }
    assert(viaKernel.length === direct.length)
    viaKernel.zip(direct).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("repeatedSpans: planted verbatim clone surfaces in both docs; unique corpus is empty") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"zeta eta $passage theta iota kappa lambda"),
      (3L, "completely unrelated text with no duplicated passage at all xyzzy"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repeatedSpans(d, "doc_id", "text", 25)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // both clone carriers report a span at least as long as the passage
    assert(got.keySet === Set(1L, 2L))
    assert(got.values.forall(_ >= passage.length))
    val unique = Seq(
      (1L, "one two three four five six seven eight nine ten eleven twelve"),
      (2L, "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.repeatedSpans(unique, "doc_id", "text", 25).count() === 0L)
  }

  test("repeatedSpansSampled: detection guarantee + driver replica of the winnow cascade") {
    import spark.implicits._
    val k = 25; val w = 8
    // GUARANTEE: every repeated span >= k + w - 1 chars must surface
    // in EVERY carrier doc (the fully-inside-window min gram is
    // content-determined, so both occurrences nominate it)
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    assert(passage.length >= k + w - 1)
    val planted = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"zeta eta $passage theta iota kappa lambda"),
      (3L, "completely unrelated text with no duplicated passage at all xyzzy"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repeatedSpansSampled(planted, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.keySet === Set(1L, 2L))
    // span extents snap to selected grams, but a >= k+w-1 repeat
    // still covers at least one full gram in each doc
    assert(got.values.forall(_ >= k))

    // driver replica on the fixture: winnow-select positions (all
    // achieving a window min), verify substring counts among selected,
    // islands with gap k + w - 1 — must equal the operator exactly
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val P = 1000000007L
    def hashes(t: String): Array[Long] = {
      val n = t.length - k + 1
      Array.tabulate(math.max(0, n)) { i =>
        t.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c) % P)
      }
    }
    def selected(h: Array[Long]): Seq[Int] = {
      if (h.isEmpty) return Nil
      val sel = Array.fill(h.length)(false)
      val nWin = math.max(1, h.length - w + 1)
      for (i <- 0 until nWin) {
        val end = math.min(i + w, h.length)
        val m = (i until end).map(h).min
        for (j <- i until end if h(j) == m) sel(j) = true
      }
      sel.indices.filter(sel)
    }
    val cand = rows.flatMap { case (id, t) =>
      selected(hashes(t)).map(p => (id, p, t.substring(p, p + k))) }
    val subCounts = cand.groupBy(_._3).view.mapValues(_.size).toMap
    val ver = cand.filter(c => subCounts(c._3) > 1).map(c => (c._1, c._2))
    val gap = k + w - 1
    val expect = ver.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val islands = sorted.tail.foldLeft(List((sorted.head, sorted.head, 1))) {
        case ((st, en, ng) :: rest, p) =>
          if (p > en + gap) (p, p, 1) :: (st, en, ng) :: rest
          else (st, p, ng + 1) :: rest
        case (Nil, p) => List((p, p, 1))
      }
      val sp = islands.map { case (st, en, ng) => (st.toLong, en.toLong + k, ng.toLong) }
      (id, (sp.map(_._3).sum, sp.size.toLong,
        sp.map(s => s._2 - s._1).sum, sp.map(s => s._2 - s._1).max))
    }
    val gotFx = TextAnalysis.repeatedSpansSampled(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(gotFx === expect)
    assert(gotFx.nonEmpty)
  }

  test("repeatedSpans == driver brute force over all substrings (fixture)") {
    val k = 25
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    rows.foreach { case (_, t) =>
      (0 to t.length - k).foreach { i =>
        val s = t.substring(i, i + k)
        counts(s) = counts.getOrElse(s, 0) + 1
      }
    }
    val expect = rows.flatMap { case (id, t) =>
      val pos = (0 to t.length - k).filter(i => counts(t.substring(i, i + k)) > 1)
      if (pos.isEmpty) None else {
        // island merge: gap > k splits
        val islands = pos.tail.foldLeft(List(List(pos.head))) { (acc, p) =>
          if (p > acc.head.head + k) List(p) :: acc
          else (p :: acc.head) :: acc.tail
        }.map(_.reverse).reverse
        val extents = islands.map(is => (is.min, is.max + k, is.size))
        Some((id, extents.map(_._3.toLong).sum, extents.size.toLong,
          extents.map(e => (e._2 - e._1).toLong).sum,
          extents.map(e => (e._2 - e._1).toLong).max))
      }
    }.sortBy(_._1)
    val got = TextAnalysis.repeatedSpans(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect.toSeq && got.nonEmpty)
    // NOTE: fixture texts are ASCII, so String.substring positions and
    // the kernel's codepoint positions coincide (the kernel itself is
    // codepoint-pinned by the refold test above).
  }

  test("BpeMergeKernel == classic greedy scan on overlap/edge cases") {
    import org.apache.spark.unsafe.types.UTF8String
    def k(s: String, a: String, b: String): String =
      graft.plans.BpeMergeKernel.compute(UTF8String.fromString(s),
        UTF8String.fromString(a), UTF8String.fromString(b)).toString
    assert(k("a a a", "a", "a") === "aa a")       // leftmost non-overlapping
    assert(k("a a a a", "a", "a") === "aa aa")
    assert(k("a b a b", "a", "b") === "ab ab")
    assert(k("a a b", "a", "b") === "a ab")
    assert(k("b a b a b", "b", "a") === "ba ba b")
    assert(k("x", "a", "b") === "x")              // single symbol untouched
    assert(k("ab a b", "a", "b") === "ab ab")     // earlier merged symbol is inert
    assert(k("a ab ab", "a", "ab") === "aab ab")  // multi-char right symbol
  }

  test("bpeLearnMerges: hand-computed merges on the classic toy corpus; counts exact") {
    import spark.implicits._
    // Sennrich-style toy: "low" x5, "lower" x2 — most frequent pair is
    // l-o (7 = 5+2), then lo-w (7), then low (5)+"er"-chain ties
    val d = Seq((1L, ("low " * 5).trim + " " + ("lower " * 2).trim))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeLearnMerges(d, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got(0) === ((1, "l", "o", "lo", 7L)))
    assert(got(1) === ((2, "lo", "w", "low", 7L)))
    // round 3: remaining pairs all count 2 ("low e", "e r") — tie
    // breaks on pair string ASC: "e r" < "low e"
    assert(got(2) === ((3, "e", "r", "er", 2L)))
  }

  test("bpeEncodeReport: merges compress monotonically; zero merges == char count") {
    import spark.implicits._
    val d = Seq((1L, "en", ("low " * 5).trim + " " + ("lower " * 2).trim))
      .toDF("doc_id", "lang", "text")
    // no merges: every word token splits into its characters
    val zero = TextAnalysis.bpeEncodeReport(d, "lang", "text", Seq.empty)
      .collect().head
    assert(zero.getLong(2) === 7L)        // n_words
    assert(zero.getLong(3) === 5 * 3 + 2 * 5L) // n_bpe_tokens == total chars
    // learned merges can only reduce the subword count, monotonically
    val merges = TextAnalysis.bpeLearnMerges(d, "doc_id", "text", 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val counts = (0 to merges.length).map { k =>
      TextAnalysis.bpeEncodeReport(d, "lang", "text", merges.take(k))
        .collect().head.getLong(3)
    }
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    // after (l,o) and (lo,w): "low"->1 subword x5, "lower"->3 x2
    val two = TextAnalysis.bpeEncodeReport(d, "lang", "text", merges.take(2))
      .collect().head
    assert(two.getLong(3) === 5 * 1 + 2 * 3L)
  }

  test("topicClusters: planted two-vocab corpus separates perfectly at k=2; sizes partition the corpus") {
    import spark.implicits._
    // two disjoint vocabularies, 6 docs each + slight within-group
    // variety; INTERLEAVED ids so the declared first-k init (docs 0
    // and 1) seeds one center inside each vocabulary
    val ga = Seq("alpha beta gamma alpha", "beta gamma alpha beta", "gamma alpha beta gamma")
    val gb = Seq("zump quor flig zump", "quor flig zump quor", "flig zump quor flig")
    val d = (ga ++ ga).zip(gb ++ gb).zipWithIndex
      .flatMap { case ((a, b), i) =>
        Seq((2L * i, "en", a), (2L * i + 1, "de", b)) }
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.topicClusters(d, "doc_id", "lang", "text",
        buckets = 32, k = 2, iters = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.map(_._2).sum === 12L)
    // perfect separation: each cluster is single-vocab, so the
    // dominant lang count equals the cluster size
    assert(got.forall { case (_, n, _, topN) => n === topN })
    assert(got.map(_._3).toSet === Set("en", "de"))
    // fixture: sizes partition the corpus, every cluster id in [0, k)
    val fx = graft.queries.TextQueries.topicClustersQ(spark, sf001).collect()
    assert(fx.map(_.getLong(1)).sum === Tables.documents(spark, sf001).count())
    assert(fx.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
  }

  test("topicKeywords: planted vocab tokens outrank shared stopwords; lift law; minCount gates") {
    import spark.implicits._
    // two disjoint topic vocabularies sharing the stopword "the":
    // keyword lift should be ~2000 (concentrated in 1 of 2 equal
    // clusters), stopword lift ~1000 (corpus-flat)
    val ga = Seq("alpha the beta gamma the alpha", "beta the gamma alpha the beta",
      "gamma the alpha beta the gamma")
    val gb = Seq("zump the quor flig the zump", "quor the flig zump the quor",
      "flig the zump quor the flig")
    val d = (ga ++ ga).zip(gb ++ gb).zipWithIndex
      .flatMap { case ((a, b), i) => Seq((2L * i, a), (2L * i + 1, b)) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.topicKeywords(d, "doc_id", "text",
        buckets = 32, k = 2, iters = 5, minCount = 2L, topM = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val byCluster = got.groupBy(_._1)
    assert(byCluster.size === 2)
    val vocabA = Set("alpha", "beta", "gamma")
    val vocabB = Set("zump", "quor", "flig")
    byCluster.values.foreach { rows =>
      val tokens = rows.sortBy(_._2).map(_._3).toSeq
      // rank 1..3 are the cluster's own vocab (lift ~2000); "the"
      // (lift ~1000) can only appear after them
      assert(tokens.take(3).toSet === vocabA || tokens.take(3).toSet === vocabB)
      rows.foreach { case (_, rank, tok, ckt, ct, lift) =>
        // lift law replayed exactly: each cluster holds 36 tokens,
        // corpus 72; a vocab token appears 8 times, all in one
        // cluster (twice in its home doc, once in each sibling, x2
        // group copies) -> lift (8*1000*72)/(36*8) = 2000
        if (vocabA(tok) || vocabB(tok)) {
          assert(ckt === 8L && ct === 8L && lift === 2000L)
        } else {
          assert(tok === "the" && lift === 1000L && rank === 4)
        }
      }
    }
    // minCount above the vocab counts empties the report
    assert(TextAnalysis.topicKeywords(d, "doc_id", "text", 32, 2, 5,
      minCount = 100L, topM = 4).count() === 0L)
  }

  test("noveltyCurve: attribution partitions the gram universe; clone source adds nothing") {
    import spark.implicits._
    val d = Seq(
      ("a_first", "one two three four five six"),
      ("b_clone", "one two three four five six"),            // verbatim clone
      ("c_fresh", "alpha beta gamma delta epsilon zeta eta")) // all new
      .toDF("source", "text")
    val got = TextAnalysis.noveltyCurve(d, "source", "text", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // a_first: 2 grams, both novel; b_clone: same 2 grams, 0 novel;
    // c_fresh: 3 grams, all novel; cumulative = partition of the universe
    assert(got.toSeq === Seq(
      ("a_first", 2L, 2L, 1000L, 2L),
      ("b_clone", 2L, 0L, 0L, 2L),
      ("c_fresh", 3L, 3L, 1000L, 5L)))
    // fixture law: Σ n_novel == global distinct gram count
    val fx = TextAnalysis.noveltyCurve(docs, "source", "text", 5).collect()
    val universe = docs.select(explode(graft.functions.TextOps.shingles(col("text"), 5)).as("g"))
      .distinct().count()
    assert(fx.map(_.getLong(2)).sum === universe && fx.nonEmpty)
    assert(fx.last.getLong(4) === universe)
  }

  test("tokenBudgetSelect: two-level cumulative equals the naive per-lang window; budget edges") {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.qualityScore(docs, "doc_id", "text", carry = Seq("lang"))
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("n_tokens").cast("long").as("n_toks"),
        floor(col("score") * 1000000.0).as("score_micros"))
    val w = Window.partitionBy("lang")
      .orderBy(col("score_micros").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = scored.withColumn("cum", sum("n_toks").over(w))
      .filter(col("cum") <= 2000L)
      .groupBy("lang").agg(count(lit(1)).as("n_selected"),
        sum("n_toks").as("n_tokens_selected"), min("score_micros").as("cutoff"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = TextAnalysis.tokenBudgetSelect(docs, "doc_id", "lang", "text", 2000L)
      .collect()
    assert(got.filter(_.getLong(3) > 0)
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      === naive.toSeq)
    // budget ≥ corpus selects everything; budget 1 selects nothing
    val all = TextAnalysis.tokenBudgetSelect(docs, "doc_id", "lang", "text", 100000000L)
      .collect()
    assert(all.nonEmpty && all.forall(r =>
      r.getLong(3) === r.getLong(1) && r.getLong(4) === r.getLong(2)))
    val none = TextAnalysis.tokenBudgetSelect(docs, "doc_id", "lang", "text", 1L)
      .collect()
    assert(none.forall(r => r.getLong(3) === 0L && r.isNullAt(5)))
  }

  test("chunksOverlap: coverage and overlap laws; stride == window degenerates to chunkStats") {
    import spark.implicits._
    val d = Seq((1L, (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunksOverlap(d, "doc_id", "text", 32, 16)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    // ceil(50/16) = 4 windows at starts 0,16,32,48; tails shorten
    assert(got.toSeq === Seq((0, 0, 32), (1, 16, 32), (2, 32, 18), (3, 48, 2)))
    // every word index is covered by at least one window
    val covered = got.flatMap { case (_, st, n) => st until (st + n) }.toSet
    assert(covered === (0 until 50).toSet)
    // stride == window: identical segmentation to the disjoint chunker
    val disj = TextAnalysis.chunkStats(d, "doc_id", "text", 16)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    val same = TextAnalysis.chunksOverlap(d, "doc_id", "text", 16, 16)
      .collect().map(r => (r.getInt(1), r.getInt(3), r.getLong(4))).toSeq
    assert(same === disj)
  }

  test("temperatureMix: low-resource sources up-weighted; weights normalize; deeper alpha flattens") {
    import spark.implicits._
    // 90/9/1 token split across three sources
    val d = (
      (1 to 90).map(i => (i.toLong, "big", "a b c d e f g h i j")) ++
      (1 to 9).map(i => (100L + i, "mid", "a b c d e f g h i j")) ++
      Seq((200L, "small", "a b c d e f g h i j"))).toDF("doc_id", "source", "text")
    def mix(a: Int) = TextAnalysis.temperatureMix(d, "source", "text", 1000L, a)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val m1 = mix(1)
    // shares: 900, 90, 10 permille; alpha=0.5 smooths toward uniform
    assert(m1("big")._1 === 900L && m1("mid")._1 === 90L && m1("small")._1 === 10L)
    assert(m1("big")._2 < 900L && m1("small")._2 > 10L && m1("mid")._2 > 90L)
    // permille weights normalize up to per-source floor loss
    val wsum = m1.values.map(_._2).sum
    assert(wsum > 1000L - 3 * 2 && wsum <= 1000L)
    // target budgets follow the weights exactly (integer arithmetic)
    m1.foreach { case (_, (_, w, t)) => assert(t === w) } // targetDocs=1000
    // alpha=0.25 (two sqrts) flattens further
    val m2 = mix(2)
    assert(m2("big")._2 < m1("big")._2 && m2("small")._2 > m1("small")._2)
    // degenerate single source takes the whole budget
    val solo = TextAnalysis.temperatureMix(
        d.filter(col("source") === "big"), "source", "text", 1000L)
      .collect()
    assert(solo.length === 1 && solo.head.getLong(4) === 1000L &&
      solo.head.getLong(5) === 1000L)
  }

  test("epochAdmission: epochs draw different subsets; rates honor the mix budget; deterministic") {
    import spark.implicits._
    // 200 docs over two sources, 10 tokens each; a tight target keeps
    // every rate well below 1000‰ so the epoch salt is actually live
    val d = (
      (1 to 150).map(i => (i.toLong, "big", "a b c d e f g h i j")) ++
      (1 to 50).map(i => (1000L + i, "small", "a b c d e f g h i j")))
      .toDF("doc_id", "source", "text")
    def adm(target: Long, epochs: Int) =
      TextAnalysis.epochAdmission(d, "doc_id", "source", "text", target, epochs)
    val r = adm(40L, 3).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    // every (epoch, source) cell reports; tokens = 10 * docs (uniform fixture)
    assert(r.map(t => (t._1, t._2)).toSet ===
      (1 to 3).flatMap(e => Seq((e, "big"), (e, "small"))).toSet)
    r.foreach { case (_, _, rate, n, toks) =>
      assert(rate < 1000L && toks === 10L * n)
    }
    // rates are epoch-invariant (they come from the mix frame alone)
    assert(r.groupBy(_._2).forall { case (_, rows) => rows.map(_._3).distinct.size === 1 })
    // the multiplicative salt gives each epoch a DIFFERENT admitted
    // subset — recompute membership per epoch and compare sets
    val mults = TextAnalysis.epochMultipliers(3).toMap
    def members(epoch: Int): Set[Long] = {
      val rates = r.collect { case (e, s, rate, _, _) if e == 1 => s -> rate }.toMap
      (1 to 150).map(_.toLong).filter { id =>
        (id % TextAnalysis.SampleHashP) * mults(epoch) %
          TextAnalysis.SampleHashP % 1000 < rates("big")
      }.toSet
    }
    assert(members(1) !== members(2))
    // ...and the operator's per-epoch counts match the replayed filter
    val bigCounts = r.collect { case (e, "big", _, n, _) => e -> n }.toMap
    (1 to 3).foreach(e => assert(bigCounts(e) === members(e).size.toLong))
    // a huge target caps every rate at 1000 and admits everything, every epoch
    val full = adm(1000000L, 2).collect()
    full.foreach { x => assert(x.getLong(2) === 1000L) }
    assert(full.map(_.getLong(3)).sum === 2L * 200L)
    // deterministic end to end
    assert(adm(40L, 3).collect().toSeq === adm(40L, 3).collect().toSeq)
  }

  test("sampleDrift: cap-rate sample drifts 0; sub-cap drift equals the exact replica") {
    import spark.implicits._
    // bimodal lengths (1 vs 33 words -> buckets 0 and 2 at width 16)
    val d = (1 to 400).map { i =>
      val words = if (i % 3 == 0) Seq.fill(33)("w") else Seq("w")
      (i.toLong, "s", words.mkString(" "))
    }.toDF("doc_id", "source", "text")
    // target >= corpus: rate caps at 1000, sample == corpus, L1 == 0
    val full = TextAnalysis.sampleDrift(d, "doc_id", "source", "text", 1000L)
      .collect()
    assert(full.length === 1 && full(0).getLong(3) === 0L &&
      full(0).getLong(1) === full(0).getLong(2))
    // sub-cap rate: replay the admission + bucket-share arithmetic
    val got = TextAnalysis.sampleDrift(d, "doc_id", "source", "text", 120L)
      .collect()(0)
    val m1 = TextAnalysis.epochMultipliers(1).head._2
    val rate = 120L * 1000L / 400L // single source: weight 1000, floor chain
    val admitted = (1 to 400).filter { i =>
      (i.toLong % TextAnalysis.SampleHashP) * m1 %
        TextAnalysis.SampleHashP % 1000 < rate
    }
    def shares(ids: Seq[Int]): Map[Long, Long] = {
      val bs = ids.groupBy(i => (if (i % 3 == 0) 33L else 1L) / 16L)
        .view.mapValues(_.size.toLong).toMap
      bs.map { case (b, c) => b -> 1000L * c / ids.size }
    }
    val (p, q) = (shares(1 to 400), shares(admitted))
    val l1 = (p.keySet ++ q.keySet).toSeq
      .map(b => math.abs(p.getOrElse(b, 0L) - q.getOrElse(b, 0L))).sum
    assert(got.getLong(1) === 400L)
    assert(got.getLong(2) === admitted.size.toLong)
    assert(got.getLong(3) === l1)
    // the hash sampler sits near the noise floor, far from disjoint
    assert(l1 < 200L)
    // a source whose rate floors to 0 permille must still REPORT —
    // n_sample 0 at maximal drift (sum of corpus shares), never a
    // silently dropped row (the audit exists for exactly this case):
    // with a tiny target, the small source's budget rounds to 0 docs
    val d2 = ((1 to 390).map(i => (i.toLong, "big", "a b c d e f g h i j")) ++
      (1 to 10).map(i => (1000L + i, "small", "a b c d e f g h i j")))
      .toDF("doc_id", "source", "text")
    val fl = TextAnalysis.sampleDrift(d2, "doc_id", "source", "text", 5L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fl.keySet === Set("big", "small"))
    assert(fl("small")._2 === 0L)
    assert(fl("small")._3 >= 900L && fl("small")._3 <= 1000L)
  }

  test("epochOverlap: every pair overlaps like an independent draw, never rotation-structured") {
    import spark.implicits._
    // one source, 2000 docs: the mix gives rate = target*1000/n_docs
    val d = (1 to 2000).map(i => (i.toLong, "s", "a b c d e f g h i j"))
      .toDF("doc_id", "source", "text")
    // target 600 -> rate 300 permille; the additive-salt bug made
    // pair (1,3) overlap EXACTLY max(0, rate-542) = 0 and pair (1,2)
    // exactly rate-271; the multiplicative salt must look like an
    // independent draw (expected pairwise jaccard r/(2-r) ~ 176
    // permille) on EVERY pair including the distance-2 one
    val ov = TextAnalysis.epochOverlap(d, "doc_id", "source", "text", 600L, 3)
      .collect().map(x => ((x.getInt(0), x.getInt(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
      .toMap
    assert(ov.keySet === Set((1, 2), (1, 3), (2, 3)))
    ov.foreach { case ((a, b), (na, nb, both, jac)) =>
      // sizes ~ rate * n = 600 each; binomial-tight bounds
      assert(na > 450 && na < 750 && nb > 450 && nb < 750, s"sizes ($a,$b)")
      assert(both > 0L && both < math.min(na, nb), s"pair ($a,$b) overlap $both")
      // independent-draw jaccard ~ 176 permille; rotation gives either
      // ~0 (shift >= rate) or >= 1000*(r-shift)/(2r-(r-shift)) -- just
      // pin a generous central band that both failure modes leave
      assert(jac > 60L && jac < 400L, s"pair ($a,$b) jaccard $jac")
    }
    // cap regime: target >= n_docs admits everything -> all pairs 1000
    val full = TextAnalysis.epochOverlap(d, "doc_id", "source", "text", 4000L, 2)
      .collect()
    assert(full.length === 1 && full(0).getLong(5) === 1000L)
  }

  test("tokenBudgetSelect: null/NaN-scored docs sort LAST, never first (r10 ADVICE)") {
    import spark.implicits._
    // an empty doc scores NaN (0/0 punct ratio); pinned to −1 it must
    // lose to every real document instead of landing in a NULL bucket
    // that the ASC bucket window would order FIRST
    val degenerate = Seq((999999L, "en", "")).toDF("doc_id", "lang", "text")
    val aug = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("text"))
      .unionByName(degenerate)
    def sel(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.tokenBudgetSelect(d, "doc_id", "lang", "text", 2000L)
        .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(sel(aug) === sel(docs.toDF()))
    // selected on its own (budget permits), the degenerate doc
    // reports the pinned −1 cutoff — deterministic in both engines
    val only = TextAnalysis.tokenBudgetSelect(degenerate, "doc_id", "lang", "text", 100L)
      .collect()
    assert(only.length === 1 && only.head.getLong(3) === 1L &&
      only.head.getLong(5) === -1L)
  }

  test("sourceOverlap: clone pair overlaps fully both ways; disjoint source pairs absent") {
    import spark.implicits._
    val d = Seq(
      ("a_big", "one two three four five six seven eight"),   // 4 grams
      ("b_clone", "one two three four five six"),             // 2 grams ⊂ a's
      ("c_fresh", "alpha beta gamma delta epsilon zeta eta")) // disjoint
      .toDF("source", "text")
    val got = TextAnalysis.sourceOverlap(d, "source", "text", 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // only (a, b) overlap: 2 shared grams = 500‰ of a's 4, 1000‰ of b's 2
    assert(got.toSeq === Seq(("a_big", "b_clone", 2L, 500L, 1000L)))
    // fixture laws: a < b throughout; n_shared ≤ min side ⇒ permille ≤ 1000
    val fx = graft.queries.TextQueries.sourceOverlapQ(spark, sf001).collect()
    assert(fx.nonEmpty)
    assert(fx.forall(r => r.getString(0) < r.getString(1)))
    assert(fx.forall(r => r.getLong(3) <= 1000L && r.getLong(4) <= 1000L))
  }

  test("sourceOverlap equals the brute-force pairwise intersection on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def text() = (0 until 3 + rnd.nextInt(5)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (_ <- 1 to 5) {
      val srcs = Vector("s0", "s1", "s2", "s3")
      val rows = (1 to 20).map(_ => (srcs(rnd.nextInt(srcs.size)), text()))
      val got = TextAnalysis.sourceOverlap(rows.toDF("source", "text"),
          "source", "text", 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      def grams(t: String) = t.split(" ").sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSet
      val bySrc = rows.groupBy(_._1).view
        .mapValues(_.flatMap(r => grams(r._2)).toSet).toMap
      val ref = (for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
        shared = (bySrc(a) & bySrc(b)).size if shared > 0
      } yield (a, b, shared.toLong,
        1000L * shared / bySrc(a).size, 1000L * shared / bySrc(b).size))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(got === ref)
    }
  }

  test("repeatedSpans dispatch equality: broadcast-nominee and shuffle-join paths agree") {
    val viaBroadcast = TextAnalysis.repeatedSpans(docs, "doc_id", "text", 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val viaShuffle = TextAnalysis.repeatedSpans(docs, "doc_id", "text", 25,
        maxBroadcastNominees = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(viaBroadcast.toSeq === viaShuffle.toSeq && viaBroadcast.nonEmpty)
  }

  test("repeatedSpansAuto dispatch law: exact below the density threshold, sampled above (r11 verdict task 2)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // the driver fixtures' winnow-selected repeat density (93–120‰
    // measured at sf0.01/sf0.1) sits well under the default 180‰, so
    // the DEFAULT dispatch must reproduce the EXACT operator row for
    // row — this is what keeps the declared text_repeated_spans on
    // its exact all-substrings oracle
    val auto = rows(TextAnalysis.repeatedSpansAuto(docs, "doc_id", "text", 25, 8))
    val exact = rows(TextAnalysis.repeatedSpans(docs, "doc_id", "text", 25))
    assert(auto === exact && auto.nonEmpty)
    // threshold 0 pushes the SAME corpus onto the dense branch — must
    // reproduce the sampled twin row for row (the reused nominee
    // frame is the sampled cascade's own, not an approximation of it)
    val forced = rows(TextAnalysis.repeatedSpansAuto(docs, "doc_id", "text", 25, 8,
      denseThresholdPermille = 0L))
    val sampled = rows(TextAnalysis.repeatedSpansSampled(docs, "doc_id", "text", 25, 8))
    assert(forced === sampled && forced.nonEmpty)
    assert(exact !== sampled) // the two branches are genuinely different statistics
  }

  test("repeatedSpansAuto boundary: dispatch is <=/> exactly AT the measured density (r12 verdict task 9)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // measure the corpus's winnow-repeat density through the SAME
    // arithmetic the dispatch computes (shared repeatDensityPermille),
    // then pin the boundary semantics at that exact value: density is
    // a pure content function, so on a threshold-straddling corpus the
    // branch is decided by <= vs >, never by run-to-run noise
    val d = TextAnalysis.winnowRepeatDensityPermille(docs, "doc_id", "text", 25, 8)
    assert(d > 0L, "fixture must have genuine repeats for the boundary to be live")
    // threshold == density: <= keeps the corpus on the EXACT branch
    val atBoundary = rows(TextAnalysis.repeatedSpansAuto(docs, "doc_id", "text", 25, 8,
      denseThresholdPermille = d))
    assert(atBoundary === rows(TextAnalysis.repeatedSpans(docs, "doc_id", "text", 25)))
    // threshold == density - 1: strictly above -> the SAMPLED branch
    val justOver = rows(TextAnalysis.repeatedSpansAuto(docs, "doc_id", "text", 25, 8,
      denseThresholdPermille = d - 1))
    assert(justOver === rows(TextAnalysis.repeatedSpansSampled(docs, "doc_id", "text", 25, 8)))
    // same corpus, same threshold, second run: identical branch and
    // identical report — the dispatch cannot flip between runs
    assert(atBoundary === rows(TextAnalysis.repeatedSpansAuto(docs, "doc_id", "text", 25, 8,
      denseThresholdPermille = d)))
  }

  test("splitDrift: planted length- and lang-keyed split defects light up their column (r11 verdict task 10)") {
    val d = Tables.documents(spark, sf01)
    def drift(split: org.apache.spark.sql.Column) =
      TextAnalysis.splitDrift(d, "lang", "text", split)
        .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(3)))).toMap
    // honest doc-id hash split: both drifts sit at the binomial noise
    // floor (measured ≤ 279‰ at sf0.01 — the small val/test splits
    // are the noisy ones)
    val honest = drift(graft.queries.PipelineQueries.splitOf(col("doc_id")))
    assert(honest.values.forall { case (l, g) => l < 400 && g < 400 })
    // PLANTED DEFECT 1 — a length-keyed split (short half trains,
    // long half tests): the length column must light up far past the
    // floor
    val med = d.stat.approxQuantile("n_chars", Array(0.5), 0.0)(0)
    val byLen = drift(when(col("n_chars") < med, "train").otherwise("test"))
    assert(byLen("train")._1 >= 600, s"length defect undetected: $byLen")
    // PLANTED DEFECT 2 — a lang-keyed split (en trains, rest tests):
    // the lang column must light up, and harder than its len column
    // (lang is hash-assigned on the fixture, so length stays noise)
    val byLang = drift(when(col("lang") === "en", "train").otherwise("test"))
    assert(byLang("train")._2 >= 800, s"lang defect undetected: $byLang")
    assert(byLang("train")._2 > byLang("train")._1)
  }

  test("dsirImportance == driver replica of the hashed-ratio arithmetic; target outranks raw") {
    import spark.implicits._
    val b = 64
    val d = Seq(
      (1L, "en", "alpha beta alpha beta gamma"),
      (2L, "en", "alpha gamma beta alpha"),
      (3L, "de", "zump quor flig zump blar"),
      (4L, "de", "quor blar flig zump"),
      (5L, "de", "alpha zump beta quor")) // mixed vocab
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.dsirImportance(d, "doc_id", "text",
        targetFilter = col("lang") === "en", buckets = b, topK = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver replica: same features, same fold, same pinned IEEE ops
    val rows = Seq((1L, true, "alpha beta alpha beta gamma"),
      (2L, true, "alpha gamma beta alpha"),
      (3L, false, "zump quor flig zump blar"),
      (4L, false, "quor blar flig zump"),
      (5L, false, "alpha zump beta quor"))
    val occ = rows.flatMap { case (id, t, txt) =>
      val w = txt.split(" ", -1)
      val feats = w.toSeq ++ w.sliding(2).map(_.mkString(" ")).toSeq
      feats.map(f => (id, t, foldFp(f) % b))
    }
    val cT = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cR = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nT = cT.values.sum; val nR = cR.values.sum
    val s = cR.keys.map { bk =>
      val u = (cT.getOrElse(bk, 0L) + 1).toDouble / (nT + b).toDouble
      val v = (cR(bk) + 1).toDouble / (nR + b).toDouble
      bk -> math.floor(1e6 * (u / v)).toLong
    }.toMap
    val expW = occ.groupBy(_._1).view.mapValues(os => (os.size.toLong, os.map(o => s(o._3)).sum)).toMap
    val expRank = expW.toSeq.map { case (id, (nf, w)) => (id, nf, w) }
      .sortBy { case (id, _, w) => (-w, id) }
      .zipWithIndex.map { case ((id, nf, w), i) => (i + 1, id, nf, w) }
    assert(got.toSeq === expRank)
    // the en docs (pure target vocab) outrank the pure-raw de docs
    val rankOf = got.map(r => r._2 -> r._1).toMap
    assert(rankOf(1L) < rankOf(3L) && rankOf(2L) < rankOf(4L))
  }
}
