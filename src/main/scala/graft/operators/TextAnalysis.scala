package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Text-analysis operators for a training-data pipeline: token stats,
  * quality scoring, heuristic language ID, and document fingerprinting.
  * Everything is per-row expression work (codegen or compiled custom
  * expressions) — zero shuffles; aggregation is left to callers.
  */
object TextAnalysis {

  /** Function-word profiles for the language-ID heuristic (ASCII-only
    * so oracle SQL round-trips byte-identically). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "nicht"),
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "los", "que", "en", "un", "por", "con", "una", "para"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "une", "sur", "avec", "au"))

  val EnStopwords: Seq[String] = LangProfiles.toMap.apply("en")

  /** Per-document token statistics:
    * (id, n_tokens, n_distinct, n_chars, avg_word_len). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.words(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(w).as("n_tokens"),
      size(array_distinct(w)).as("n_distinct"),
      length(col(textCol)).as("n_chars"),
      // chars minus separators over tokens — exact, avoids per-token
      // length summation so the oracle formula is identical.
      ((length(col(textCol)) - (size(w) - 1)).cast("double") / size(w))
        .as("avg_word_len"))
  }

  /** BPE-style regex token count alongside the whitespace count: runs
    * of letters, runs of digits, and single other non-space characters
    * — the pre-merge segmentation a byte-pair tokenizer starts from.
    * An approximate compression proxy (ws_tokens / bpe_tokens) comes
    * free. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeTokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.words(col(textCol))
    val bpe = size(regexp_extract_all(col(textCol), lit(BpePattern), lit(0)))
    docs.select(
      col(idCol).as("doc_id"),
      size(w).as("n_ws_tokens"),
      bpe.as("n_bpe_tokens"),
      (size(w).cast("double") / bpe).as("ws_per_bpe"))
  }

  /** Quality features + a composite score in [0, 1]:
    * 0.3·stopword_ratio + 0.4·(1 − punct_ratio) + 0.3·min(avg_len/10, 1).
    * The exact arithmetic shape is mirrored in the DuckDB oracle. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   carry: Seq[String] = Nil): DataFrame = {
    val w = TextOps.words(col(textCol))
    val nTok = size(w)
    // Null-safe divisors: an EMPTY document (0 chars / 0 tokens) must
    // score NULL, not throw ANSI DIVIDE_BY_ZERO — downstream
    // consumers (tokenBudgetSelect) pin the null to a sorts-last
    // sentinel (r10 ADVICE). The fixture has no empty docs, so every
    // declared oracle is byte-identical.
    val nTokD = when(nTok === 0, lit(null)).otherwise(nTok.cast("double"))
    val nCharsD = when(length(col(textCol)) === 0, lit(null))
      .otherwise(length(col(textCol)).cast("double"))
    val stopRatio = size(filter(w, t => t.isin(EnStopwords: _*))).cast("double") / nTokD
    val punctRatio = length(regexp_replace(col(textCol), "[a-z0-9 ]", ""))
      .cast("double") / nCharsD
    val avgLen = (length(col(textCol)) - (nTok - 1)).cast("double") / nTokD
    docs.select(Seq(
      col(idCol).as("doc_id"),
      nTok.as("n_tokens"),
      stopRatio.as("stop_ratio"),
      punctRatio.as("punct_ratio"),
      (stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.4 +
        least(avgLen / 10.0, lit(1.0)) * 0.3).as("score")) ++ carry.map(col): _*)
  }

  /** TOKEN-BUDGET greedy selection — "fill each language's training
    * budget with its best documents": per language, documents are
    * taken in (quality score DESC, doc_id) order until the next doc
    * would cross `budgetTokens` whitespace tokens; the report is the
    * langs-bounded manifest (selected docs/tokens, the score cutoff,
    * and the candidate totals). The selection key is
    * floor(score·10⁶) — the [[qualityScore]] composite, whose
    * pinned-order IEEE arithmetic the text_quality oracle already
    * proves bit-reproducible cross-engine — with doc_id as the total
    * tie-break.
    *
    * The cumulative token sum is EXACT but never funnels one language
    * into one task (the naive per-lang window): the two-level
    * stratumRank substrate re-specialized to SUMS — score-range
    * buckets give a monotone partition of the selection order, bucket
    * token-subtotals window over a langs×buckets-bounded frame, and
    * the within-(lang, bucket) running sum adds the broadcast bucket
    * offset. Identical semantics to the naive scan, spec-pinned. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, langCol: String,
                        textCol: String, budgetTokens: Long,
                        buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0 && buckets > 0, "budget/buckets must be positive")
    val width = math.max(1L, 1000001L / buckets)
    // A degenerate document (empty text → 0/0 ratios) scores
    // null/NaN; left alone it lands in a NULL bucket that Spark's ASC
    // window orders FIRST — i.e. highest selection priority — while
    // the oracle's score DESC puts it last (r10 ADVICE). Pin every
    // non-finite score to −1: real scores are ≥ 0 by construction
    // (all three components are non-negative), so −1 sorts strictly
    // last in both engines and the bucket index stays non-null.
    val microsRaw = floor(col("score") * 1000000.0).cast("long")
    val scored = qualityScore(docs, idCol, textCol, carry = Seq(langCol))
      .select(col("doc_id").cast("long").as("doc_id"), col(langCol).as("lang"),
        col("n_tokens").cast("long").as("n_toks"),
        when(col("score").isNull || isnan(col("score")) ||
            col("score") === Double.PositiveInfinity, lit(-1L))
          .otherwise(microsRaw).as("score_micros"))
    // bucket index DESCENDS with score so bucket order == take order
    val b = scored.withColumn("_bucket",
      expr(s"(1000000 - score_micros) DIV $width"))
    val offs = b.groupBy(col("lang").as("_l"), col("_bucket").as("_b"))
      .agg(sum("n_toks").as("_t"))
      .withColumn("_off", coalesce(
        sum("_t").over(Window.partitionBy("_l").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_l"), col("_b"), col("_off"))
    val wb = Window.partitionBy("lang", "_bucket")
      .orderBy(col("score_micros").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = b
      .join(broadcast(offs), b("lang") <=> offs("_l") && b("_bucket") <=> offs("_b"))
      .withColumn("cum_toks", col("_off") + sum("n_toks").over(wb))
      .filter(col("cum_toks") <= budgetTokens)
      .groupBy("lang").agg(count(lit(1)).as("n_selected"),
        sum("n_toks").as("n_tokens_selected"),
        min("score_micros").as("cutoff_score_micros"))
    scored.groupBy("lang")
      .agg(count(lit(1)).as("n_candidates"), sum("n_toks").as("n_tokens_total"))
      .join(sel, Seq("lang"), "left")
      .select(col("lang"), col("n_candidates"), col("n_tokens_total"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("n_tokens_selected"), lit(0L)).as("n_tokens_selected"),
        col("cutoff_score_micros"))
      .orderBy("lang")
  }

  /** Heuristic language ID: fraction of tokens in each language's
    * function-word profile; argmax with (score desc, lang asc)
    * tie-break. Output (id, predicted_lang, score). */
  /** The winning (lang, score) struct of the stopword-profile vote —
    * shared by [[langId]] and [[langConfusion]] so both ride one
    * projection with no self-join. */
  private def bestLang(textCol: String): Column = {
    val w = TextOps.words(col(textCol))
    val scored = LangProfiles.map { case (lang, stop) =>
      val s = size(filter(w, t => t.isin(stop: _*))).cast("double") / size(w)
      struct((s * -1).as("neg"), lit(lang).as("lang"), s.as("score"))
    }
    array_min(array(scored: _*))
  }

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val best = bestLang(textCol)
    docs.select(
      col(idCol).as("doc_id"),
      best.getField("lang").as("predicted_lang"),
      best.getField("score").as("score"))
  }

  /** LANGUAGE-ID CONFUSION MATRIX — the classifier-eval report every
    * curation pipeline runs before trusting a language filter: for
    * each (labeled lang, predicted lang) cell, the document count and
    * the row-conditional rate in integer permille. The label column
    * rides the SAME scan as the prediction (no self-join); the agg is
    * |langs|²-bounded, so the whole matrix costs one pass at any
    * corpus size. Diagonal permille = per-language recall. */
  def langConfusion(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String): DataFrame =
    docs.select(col(labelCol).as("label_lang"),
        bestLang(textCol).getField("lang").as("predicted_lang"))
      .groupBy("label_lang", "predicted_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_permille",
        expr("(1000 * n) DIV sum(n) OVER (PARTITION BY label_lang)"))

  /** Rolling-hash fingerprint (order-sensitive, mod 1e9+7): one BIGINT
    * per document. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      TextOps.rollingFingerprint(col(textCol)).as("fingerprint"))

  /** Vocabulary build: token → (occurrence count, document frequency)
    * — the canonical explode-then-aggregate pipeline op (the first
    * step of any tokenizer/TF-IDF build). Scale: both aggregates are
    * algebraic, so partial aggregation absorbs the stopword skew
    * before the shuffle; the distinct doc-frequency adds the usual
    * second exchange, which is semantically forced. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextOps.words(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))

  /** Top-k terms per document by TF-IDF — the raw-ratio variant
    * `tf · N / df` rather than `tf · ln(N/df)`: the integer inputs
    * make the score ONE correctly-rounded double division, identical
    * bits in every IEEE engine, whereas `ln` may differ in the last
    * ulp between libm implementations and silently flip near-tied
    * rank orders. Same ranking for any monotone transform of N/df.
    * Scale: token-level aggregates are partial-agg friendly. The df
    * side is |vocab| rows — NOT broadcastable at corpus scale (Heaps'
    * law: a web-scale corpus has 10⁸–10⁹ distinct tokens, multi-GB
    * over any broadcast limit), so the tf⋈df join carries no broadcast
    * hint: both sides arrive hash-partitioned on `token` from their
    * own aggregates, and AQE still picks a broadcast join while the
    * vocabulary is genuinely small. The final per-doc rank partitions
    * by doc_id (high cardinality — no window skew). */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // N stays INSIDE the plan (1-row broadcast agg, like the oracle's
    // CROSS JOIN (SELECT COUNT(*))): a driver-side docs.count() would
    // run an extra corpus scan at construction time and make a lazy
    // query builder side-effecting.
    val n1 = docs.agg(count(lit(1)).as("_n"))
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.words(col(textCol))).as("token"))
    val tf = tokens.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(n1))
      .withColumn("score", (col("tf") * col("_n")).cast("double") / col("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("score"))
  }

  /** Exact per-stratum rank (1-based, ordered by `idCol`) computed
    * WITHOUT funneling a stratum into one task. A plain
    * `row_number() over (partition by stratum)` sends every row of a
    * stratum through a single task — with low-cardinality strata
    * (languages, sources) that is a handful of tasks sorting the whole
    * corpus at 100 TB. Here the rank is split two-level, all lazy
    * Catalyst, no driver collect:
    *
    *   1. bucket ids into `buckets` range buckets (in-plan min/max,
    *      integer DIV — monotone in id, so bucket order = id order);
    *   2. count rows per (stratum, bucket) — a partial-agg shuffle
    *      whose OUTPUT is ≤ strata·buckets rows;
    *   3. prefix-sum those counts per stratum (window over the tiny
    *      counts table) → each bucket's starting offset;
    *   4. broadcast-join offsets back and take `row_number` per
    *      (stratum, bucket): parallelism is strata·buckets and each
    *      task sorts ~1/buckets of a stratum.
    *
    * Rank = offset + within-bucket row_number, identical to the
    * single-window formulation for any bucketing (used verbatim by the
    * DuckDB oracles). Skewed id ranges degrade bucket balance but
    * never correctness. */
  def stratumRank(docs: DataFrame, strataCol: String, idCol: String,
                  buckets: Int = 256,
                  rankCol: String = "_stratum_rank",
                  sizeCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol).cast("bigint")
    val bounds = docs.agg(min(id).as("_min_id"), max(id).as("_max_id"))
    // The user-supplied id column is only ever referenced through the
    // Column API; the integer-DIV expr sees the pre-projected `_idb`
    // alias, so a non-identifier column name (dots, hyphens, reserved
    // words) can neither mis-parse nor resolve to the wrong column.
    val withB = docs.crossJoin(broadcast(bounds))
      .withColumn("_idb", id)
      .withColumn("_width", greatest(
        ceil((col("_max_id") - col("_min_id") + 1).cast("double") / buckets)
          .cast("bigint"),
        lit(1L)))
      .withColumn("_bucket", expr("(_idb - _min_id) DIV _width"))
      .drop("_idb", "_min_id", "_max_id", "_width")
    val counts = withB
      .groupBy(col(strataCol).as("_s"), col("_bucket").as("_b"))
      .agg(count(lit(1)).as("_c"))
    // `sizeCol` (r17 optimization round): callers that also need the
    // per-stratum TOTAL (NTILE arithmetic — qualityBuckets,
    // decileReport) used to re-aggregate the corpus-sized input a
    // 4th time for it; the total is already implied by the tiny
    // per-(stratum, bucket) counts frame, so attach it through the
    // SAME broadcast join that ships the offsets — zero extra passes.
    val offs = counts
      .withColumn("_off", coalesce(
        sum("_c").over(Window.partitionBy("_s").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_tot", coalesce(
        sum("_c").over(Window.partitionBy("_s")), lit(0L)))
      .select(col("_s"), col("_b"), col("_off"), col("_tot"))
    val wb = Window.partitionBy(col(strataCol), col("_bucket"))
      .orderBy(col(idCol))
    val ranked = withB
      .join(broadcast(offs),
        withB(strataCol) <=> offs("_s") && withB("_bucket") <=> offs("_b"))
      .withColumn(rankCol, col("_off") + row_number().over(wb))
    sizeCol.fold(ranked.drop("_tot")) { n =>
        ranked.withColumnRenamed("_tot", n)
      }
      .drop("_s", "_b", "_off", "_bucket")
  }

  /** Deterministic every-k-th downsample within each stratum (ordered
    * by `idCol`) — reproducible train/eval splits. Built on
    * [[stratumRank]], so no stratum ever funnels into a single task;
    * semantics (and the oracle SQL) are exactly the naive
    * `(row_number() over (partition by stratum order by id) - 1) % k = 0`. */
  def stratifiedSample(docs: DataFrame, strataCol: String, idCol: String,
                       k: Int, buckets: Int = 256): DataFrame =
    stratumRank(docs, strataCol, idCol, buckets)
      .filter(pmod(col("_stratum_rank") - 1, lit(k)) === 0)
      .drop("_stratum_rank")

  /** Concat-and-split SEQUENCE PACKING — the step between chunking
    * and training: within each stratum (language/domain), documents
    * are conceptually concatenated in id order and the token stream
    * is cut into fixed `budget`-token sequences; each document emits
    * one span row per sequence it overlaps (GPT-style packing, where
    * a document may straddle a sequence boundary). Output:
    * (stratum, seq_id, doc_id, seq_off, n_toks) — every sequence
    * except a stratum's last is exactly full by construction.
    *
    * Scale shape: the per-stratum prefix sum is TWO-LEVEL (the
    * [[stratumRank]] bucketing verbatim — a naive
    * `sum() over (partition by stratum order by id)` funnels each
    * language's entire corpus into one task): per-(stratum, bucket)
    * token sums → prefix over the tiny sums table → broadcast
    * offsets + within-bucket running sum, parallelism strata·buckets.
    * The span explode is in-row (cost = output cardinality, like
    * chunking). All integer arithmetic — the DuckDB oracle is the
    * plain single-window formulation, which the bucketing reproduces
    * exactly for any bucket count (spec-pinned). */
  def packSequences(docs: DataFrame, strataCol: String, idCol: String,
                    textCol: String, budget: Int, buckets: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    tokenSpans(docs, strataCol, idCol, textCol, buckets)
      .filter(col("_t") > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"_start DIV $budget"), expr(s"(_end - 1) DIV $budget"))))
      .select(col("_st").as(strataCol), col("seq_id"), col("doc_id"),
        (greatest(col("_start"), col("seq_id") * budget) - col("seq_id") * budget)
          .as("seq_off"),
        (least(col("_end"), (col("seq_id") + 1) * budget)
          - greatest(col("_start"), col("seq_id") * budget)).as("n_toks"))
  }

  /** Per-document span (_start, _end] of the per-stratum concatenated
    * token stream, id-ordered — the shared substrate of
    * [[packSequences]] and [[ppsSample]]. The per-stratum prefix sum
    * is the TWO-LEVEL [[stratumRank]] bucketing (per-(stratum, bucket)
    * token sums → prefix over the tiny sums table → broadcast offsets
    * + within-bucket running sum), so no stratum ever funnels into a
    * single task. Columns: `_st`, `doc_id`, `_t` (token count),
    * `_start`, `_end`; identical for any bucket count to the naive
    * single-window `sum() over (partition by stratum order by id)`. */
  private def tokenSpans(docs: DataFrame, strataCol: String, idCol: String,
                         textCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(strataCol).as("_st"), col(idCol).cast("bigint").as("doc_id"),
      size(TextOps.words(col(textCol))).cast("long").as("_t"))
    val bounds = toks.agg(min(col("doc_id")).as("_min_id"), max(col("doc_id")).as("_max_id"))
    val withB = toks.crossJoin(broadcast(bounds))
      .withColumn("_width", greatest(
        ceil((col("_max_id") - col("_min_id") + 1).cast("double") / buckets).cast("bigint"),
        lit(1L)))
      .withColumn("_bucket", expr("(doc_id - _min_id) DIV _width"))
      .drop("_min_id", "_max_id", "_width")
    val sums = withB.groupBy(col("_st").as("_s"), col("_bucket").as("_b"))
      .agg(sum("_t").as("_c"))
    val offs = sums
      .withColumn("_off", coalesce(
        sum("_c").over(Window.partitionBy("_s").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_s"), col("_b"), col("_off"))
    val wb = Window.partitionBy(col("_st"), col("_bucket")).orderBy(col("doc_id"))
    withB
      .join(broadcast(offs), withB("_st") <=> offs("_s") && withB("_bucket") <=> offs("_b"))
      .withColumn("_end", col("_off") + sum("_t").over(wb))
      .withColumn("_start", col("_end") - col("_t"))
      .drop("_s", "_b", "_off", "_bucket")
  }

  /** Systematic SIZE-PROPORTIONAL sampling (PPS) — the data-mixing
    * sampler that weights documents by TOKEN COUNT, not uniformly:
    * within each stratum the documents are conceptually concatenated
    * in id order and every `step`-th token position is a dart; a
    * document is selected iff a dart lands inside its span, i.e.
    * `_end DIV step > _start DIV step`, and `n_picks` counts its darts
    * (a doc longer than `step` tokens is picked multiple times — the
    * with-replacement weight a token-budget mixer consumes). Expected
    * sample mass per stratum is tokens/step documents with inclusion
    * probability exactly proportional to length — unlike
    * [[hashModSample]] (uniform over docs) and [[stratifiedSample]]
    * (every k-th doc), this is the sampler that preserves TOKEN
    * distribution. Classic systematic PPS (Madow 1949), here in pure
    * integer arithmetic so the DuckDB oracle replays the selection
    * bit-for-bit.
    *
    * Scale shape: the span substrate is [[tokenSpans]] — the same
    * two-level funnel-free prefix sum as sequence packing; selection
    * itself is a per-row integer filter. At 100 TB the only exchanges
    * are the (stratum, bucket) token sums (≤ strata·buckets rows) and
    * the within-bucket window — no corpus-wide sort, no sampling
    * state. */
  def ppsSample(docs: DataFrame, strataCol: String, idCol: String,
                textCol: String, step: Int, buckets: Int = 256): DataFrame = {
    require(step > 0, "step must be positive")
    tokenSpans(docs, strataCol, idCol, textCol, buckets)
      .withColumn("n_picks", expr(s"(_end DIV $step) - (_start DIV $step)"))
      .filter(col("n_picks") > 0)
      .select(col("_st").as(strataCol), col("doc_id"),
        col("_t").as("n_toks"), col("n_picks"))
  }

  /** VOCABULARY COVERAGE CURVE (Zipf head report) — the tokenizer-
    * design signal: for each coverage threshold (permille of ALL
    * token occurrences), the smallest frequency-ranked head size that
    * reaches it, plus the exact occurrences that head covers. Rank
    * order is (count DESC, word ASC) — fully deterministic.
    *
    * Scale shape: token counting is the usual explode + partial/final
    * hash aggregate (vocab-sized output, never corpus-sized); the
    * head is `orderBy(desc).limit(headK)` — Spark plans TakeOrdered
    * with per-partition heaps, so no global sort ever materializes —
    * and the prefix-sum window then runs over ≤ headK rows (a BOUNDED
    * single partition, like every top-k in the repo). By Zipf's law
    * the interesting thresholds live in the head; a threshold the
    * head cannot reach is absent from the output (semantics: coverage
    * WITHIN the top-`headK` head — headK is a parameter of the
    * report, and the oracle replays the same bound). */
  def zipfCoverage(docs: DataFrame, textCol: String,
                   thresholds: Seq[Int] = Seq(500, 900, 990),
                   headK: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholds.nonEmpty && thresholds.forall(t => t > 0 && t <= 1000))
    val counts = docs
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("_total"))
    val ord = Window.orderBy(col("c").desc, col("w"))
    val head = counts.orderBy(col("c").desc, col("w")).limit(headK)
      .withColumn("_rank", row_number().over(ord).cast("bigint"))
      .withColumn("_cum", sum("c").over(ord))
    head.crossJoin(broadcast(total))
      .withColumn("threshold_permille",
        explode(array(thresholds.map(t => lit(t.toLong)): _*)))
      .filter(col("_cum") * 1000 >= col("threshold_permille") * col("_total"))
      .groupBy("threshold_permille")
      .agg(min(struct(col("_rank"), col("_cum"))).as("_m"),
        max(col("_total")).as("total_tokens"))
      .select(col("threshold_permille"), col("_m._rank").as("n_words"),
        col("_m._cum").as("covered_tokens"), col("total_tokens"))
  }

  /** Deterministic EPOCH SHUFFLE + SHARD ASSIGNMENT — the step that
    * turns a curated corpus into training input files: each document
    * goes to shard `h(id) mod numShards` and receives a dense position
    * `pos` within its shard ordered by `(h(id), id)`, where h is the
    * exact multiplicative hash of [[hashModSample]]. Because h
    * decorrelates order from id, each shard reads as a seeded
    * pseudo-random permutation sample of the corpus — the "global
    * shuffle" a data loader wants — while staying bit-reproducible in
    * any engine (no engine-private RNG).
    *
    * Scale shape: the within-shard rank is two-level like
    * [[stratumRank]], but bucketed on the HASH (whose domain [0, P) is
    * known a priori — no min/max pass): per-(shard, hash-bucket)
    * counts → prefix over the tiny counts table → broadcast offsets +
    * within-bucket row_number ordered by (h, id). Parallelism is
    * shards·buckets; no shard ever funnels into one task, which a
    * naive `row_number() over (partition by shard)` would force at
    * 100 TB. */
  def shardAssign(docs: DataFrame, idCol: String, numShards: Int,
                  buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "numShards must be positive")
    val width = SampleHashP / buckets + 1
    val h = docs.select(col(idCol).cast("bigint").as("doc_id"))
      .withColumn("_h",
        pmod(pmod(col("doc_id"), lit(SampleHashP)) * lit(SampleHashA),
          lit(SampleHashP)))
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)))
      .withColumn("_bucket", expr(s"_h DIV ${width}L"))
    val counts = h.groupBy(col("shard").as("_s"), col("_bucket").as("_b"))
      .agg(count(lit(1)).as("_c"))
    val offs = counts
      .withColumn("_off", coalesce(
        sum("_c").over(Window.partitionBy("_s").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_s"), col("_b"), col("_off"))
    val wb = Window.partitionBy(col("shard"), col("_bucket"))
      .orderBy(col("_h"), col("doc_id"))
    h.join(broadcast(offs),
        h("shard") === offs("_s") && h("_bucket") === offs("_b"))
      .withColumn("pos", col("_off") + row_number().over(wb))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** LENGTH-BUCKETED BATCHING report — the inference/packing-free
    * training layout that groups similar-length documents so padding
    * is bounded: length bucket `lb = n_toks DIV bucketWidth`, dense
    * in-bucket rank by doc id (two-level [[stratumRank]], so a hot
    * length bucket never funnels), batch `(rank − 1) DIV batchSize`,
    * then per-(bucket, batch) the padded-waste accounting: row count,
    * max/sum tokens, and `padding_permille` =
    * `1000·(n·max − Σ) DIV (n·max)` — all exact integers. The report
    * is batch-count-sized, never corpus-sized. */
  def lengthBatching(docs: DataFrame, idCol: String, textCol: String,
                     bucketWidth: Int, batchSize: Int,
                     buckets: Int = 256): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0, "bucketWidth/batchSize must be positive")
    val sized = docs.select(col(idCol).cast("bigint").as("doc_id"),
        size(TextOps.words(col(textCol))).cast("long").as("n_toks"))
      .withColumn("len_bucket", expr(s"n_toks DIV $bucketWidth"))
    stratumRank(sized, "len_bucket", "doc_id", buckets, rankCol = "_r")
      .withColumn("batch_id", expr(s"(_r - 1) DIV $batchSize"))
      .groupBy("len_bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max("n_toks").as("max_toks"),
        sum("n_toks").as("sum_toks"))
      .withColumn("padding_permille",
        expr("CAST((1000 * (n_docs * max_toks - sum_toks)) " +
          "DIV greatest(n_docs * max_toks, 1) AS BIGINT)"))
  }

  /** Multiplicative-hash admission sampling: keep a row iff
    * `((id mod P) · A mod P) mod k = 0` with P = 1e9+7 and
    * A = 2654435761 mod P (Knuth's 2³²·φ⁻¹ multiplier, reduced so the
    * product stays < 2⁶³ for ANY bigint id). A pure scan filter — zero
    * shuffle, zero state, the sampler of choice at 100 TB — and being
    * exact integer arithmetic it is bit-reproducible in any engine, so
    * unlike murmur3/xxhash it is DuckDB-oracle-checkable. Within each
    * stratum the multiplicative hash decorrelates admission from id
    * order, giving ~1/k of every stratum (proportional allocation)
    * without ever grouping by stratum. */
  val SampleHashP = 1000000007L
  val SampleHashA = 2654435761L % SampleHashP
  /** Second Lehmer base, the epoch-salt stream for [[epochAdmission]]
    * (MINSTD's own constant). The per-epoch hash MULTIPLIES the doc
    * residue by m_e = A·B^e mod P — an ADDITIVE salt (x + e·B) % P
    * % 1000 is a mere rotation of the admission window by
    * (B mod 1000)‰ per epoch (adjacent epochs overlap by exactly
    * max(0, rate − 271)‰ and epochs two apart by max(0, rate − 542)‰
    * — structurally correlated, the failure the epochOverlap audit
    * exposes), while distinct multiplicative maps of the mod-P group
    * scatter the %1000 classes like independent draws. */
  val SampleHashB = 48271L

  /** (epoch, m_e = A·B^e mod P) for e in 1..epochs — exact Long
    * arithmetic, every intermediate < P² < 2⁶³. */
  def epochMultipliers(epochs: Int): Seq[(Int, Long)] = {
    var b = 1L
    (1 to epochs).map { e =>
      b = b * SampleHashB % SampleHashP
      (e, SampleHashA * b % SampleHashP)
    }
  }
  def hashModSample(docs: DataFrame, idCol: String, k: Int): DataFrame =
    docs.filter(
      pmod(pmod(col(idCol).cast("bigint"), lit(SampleHashP)) * lit(SampleHashA),
        lit(SampleHashP)) % k === 0)

  /** Gopher-style per-document repetition signals — the quality gate
    * that catches boilerplate and looping text generations:
    * duplicate-word fraction, duplicate-bigram fraction, and the
    * highest bigram count. One compiled per-row pass
    * ([[graft.plans.RepetitionKernel]]) over the text — ZERO shuffle,
    * so at 100 TB this is a scan like the other quality scores, not
    * the (doc, gram) explode + two-level group-by a naive plan would
    * shuffle; and compiled, not interpreted-HOF (30× measured — see
    * the kernel's scaladoc). All counts are exact integers and the
    * fractions one correctly-rounded double division each, so the
    * whole output is DuckDB-oracle-checkable. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val r = graft.plans.expressions.repetition_stats(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), r.as("r"))
      .select(
        col("doc_id"),
        col("r")(0).cast("int").as("n_words"),
        ((col("r")(0) - col("r")(1)).cast("double") / col("r")(0)).as("dup_word_frac"),
        col("r")(2).cast("int").as("n_bigrams"),
        col("r")(4).as("max_bigram_freq"),
        when(col("r")(2) > 0,
            (col("r")(2) - col("r")(3)).cast("double") / col("r")(2))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
  }

  /** HOF twin of [[repetitionStats]] — semantically identical
    * (ExpressionsSpec pins the equivalence) but per-element
    * interpreted; the declared query runs the compiled kernel. */
  def repetitionStatsHof(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.words(col(textCol))
    // ALL bigrams (multiset — repetition is the signal, so no
    // dedup here, unlike TextOps.shingles)
    val bg = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    // longest run of equal adjacent elements in the sorted multiset
    // = the highest bigram frequency
    val maxRun = aggregate(
      sort_array(bg),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs
      .select(col(idCol).as("doc_id"), w.as("w"), bg.as("bg"), maxRun.as("max_bigram_freq"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        ((size(col("w")) - size(array_distinct(col("w")))).cast("double")
          / size(col("w"))).as("dup_word_frac"),
        size(col("bg")).as("n_bigrams"),
        col("max_bigram_freq"),
        when(size(col("bg")) > 0,
            (size(col("bg")) - size(array_distinct(col("bg")))).cast("double")
              / size(col("bg")))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
  }

  /** Data MIXING for training-set construction: admit each stratum
    * (language, domain, source…) at its own rate, expressed in basis
    * points of 10000 — e.g. upsample rare languages, downsample
    * crawl-heavy domains. Admission reuses the exact multiplicative
    * hash of [[hashModSample]] (`h(id) mod 10000 < rate_bps`), and the
    * per-stratum rate is an in-plan CASE chain over the (tiny, fixed)
    * rate map — so the whole operator is a ZERO-shuffle, zero-join
    * scan filter at any corpus size, bit-reproducible in any engine.
    * Strata absent from the map get `defaultBps`. */
  def mixSample(docs: DataFrame, strataCol: String, idCol: String,
                ratesBps: Map[String, Int], defaultBps: Int = 0): DataFrame = {
    require(ratesBps.values.forall(r => r >= 0 && r <= 10000) &&
      defaultBps >= 0 && defaultBps <= 10000, "rates are basis points in [0, 10000]")
    // deterministic chain order so plan text (and the oracle SQL
    // generated from the same map) never depends on map iteration
    val rateExpr = ratesBps.toSeq.sortBy(_._1).foldLeft(lit(defaultBps)) {
      case (acc, (k, bps)) => when(col(strataCol) === lit(k), lit(bps)).otherwise(acc)
    }
    docs.filter(
      pmod(pmod(col(idCol).cast("bigint"), lit(SampleHashP)) * lit(SampleHashA),
        lit(SampleHashP)) % 10000 < rateExpr)
  }

  /** Context-window CHUNKING — the sequence-packing prep step: split
    * each document into fixed-size word windows of `chunkWords`,
    * emitting per chunk its word count and the polynomial fingerprint
    * of its text (chunk-level identity, so downstream chunk dedup /
    * packing can key on 8 bytes instead of the chunk body). One
    * per-row transform + explode over the in-row token list — ZERO
    * shuffle at any corpus size; the fan-out is rows × ceil(words/
    * chunkWords), the unavoidable output cardinality. Exact integer
    * fingerprints → fully oracle-checkable. */
  def chunkStats(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int): DataFrame = {
    require(chunkWords >= 1, "chunkWords >= 1")
    val w = TextOps.words(col(textCol))
    val nChunks = floor(((size(col("w")) + chunkWords - 1)
      / lit(chunkWords.toDouble))).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1), i => struct(
      i.as("chunk_id"),
      least(lit(chunkWords), size(col("w")) - i * chunkWords).as("n_words"),
      TextOps.rollingFingerprint(
        concat_ws(" ", slice(col("w"), i * chunkWords + 1, lit(chunkWords))))
        .as("chunk_fp")))
    docs
      .select(col(idCol).as("doc_id"), w.as("w"))
      .select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_words"), col("c.chunk_fp"))
  }

  /** OVERLAPPING sliding-window chunking — the RAG / long-context
    * preprocessing cut ([[chunkStats]] is the disjoint form): windows
    * of `windowWords` words every `stride` words (stride < window ⇒
    * overlap keeps boundary-spanning context retrievable). Window i
    * covers words [i·stride, i·stride + windowWords); a window exists
    * while its start is inside the document, so nChunks = ⌈n/stride⌉
    * and tail windows shorten. Zero shuffle: one per-row transform,
    * fingerprints via the corpus-standard mod-P char fold. */
  def chunksOverlap(docs: DataFrame, idCol: String, textCol: String,
                    windowWords: Int, stride: Int): DataFrame = {
    require(windowWords >= 1 && stride >= 1, "windowWords/stride >= 1")
    val w = TextOps.words(col(textCol))
    val nChunks = floor(((size(col("w")) + stride - 1)
      / lit(stride.toDouble))).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1), i => struct(
      i.as("chunk_id"),
      (i * stride).as("start_word"),
      least(lit(windowWords), size(col("w")) - i * stride).as("n_words"),
      TextOps.rollingFingerprint(
        concat_ws(" ", slice(col("w"), i * stride + 1, lit(windowWords))))
        .as("chunk_fp")))
    docs
      .select(col(idCol).as("doc_id"), w.as("w"))
      .select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.start_word"),
        col("c.n_words"), col("c.chunk_fp"))
  }

  /** Corpus-level aggregate: per (lang, source) doc counts + token
    * totals — the group-by surface over the text stats. */
  /** BIGRAM COVERAGE against a REFERENCE slice — the integer-exact
    * core of coverage-based data selection (the DSIR/importance-
    * sampling family scores candidates by n-gram overlap with a
    * target corpus; logs and ratios vary by libm, so this surface
    * keeps the raw signal exact): the reference slice's `refK` most
    * frequent word bigrams (count desc, bigram asc — total order)
    * form the target set, and every document scores
    * coverage_permille = 1000 · |doc bigrams ∩ target| DIV |doc
    * bigrams| over its DISTINCT bigrams. All integers — hash-exact.
    *
    * Scale shape: the reference aggregation is a capped top-k (two
    * exchanges over partial counts, output bounded at refK rows —
    * broadcastable at ANY corpus size, the decontamination lesson);
    * the doc side is one distinct-bigram explode joined to that
    * broadcast, grouped back by doc — no corpus×corpus work. */
  def bigramCoverage(docs: DataFrame, idCol: String, textCol: String,
                     refFilter: Column, refK: Int = 200): DataFrame = {
    val bi = explode(TextOps.shingles(col(textCol), 2)).as("bg")
    val ref = docs.filter(refFilter)
      .select(bi)
      .groupBy("bg").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bg"))
      .limit(refK)
      .select(col("bg"), lit(1).as("_hit"))
    val docBi = docs.select(col(idCol).as("doc_id"), bi) // shingles are distinct per doc
    docBi.join(broadcast(ref), Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("_hit"), lit(0))).as("n_covered"))
      .select(col("doc_id"), col("n_bigrams"), col("n_covered"),
        expr("(1000 * n_covered) DIV n_bigrams").as("coverage_permille"))
  }

  /** Bigram language-model quality score — the deterministic analogue
    * of the "score every document under a small LM and filter" stage
    * of a training-data pipeline. The corpus itself is the model:
    * c(w₁w₂) bigram-occurrence counts and c(w) unigram-occurrence
    * counts, a document's score the mean conditional probability of
    * its bigram OCCURRENCES in integer permille —
    * `Σ (1000·c(w₁w₂) DIV c(w₁)) DIV n_bigrams` — all integer
    * arithmetic, so the DuckDB oracle replays it cell-exactly
    * (a float log-perplexity would diverge cross-engine).
    *
    * Scale shape: token-linear like `text_vocab`/`text_tfidf` — the
    * occurrence frame shuffles on bigram then on prefix token (two
    * shuffle joins against the count tables; no vocabulary-sized
    * broadcast, no per-doc funnel). Documents with < 2 tokens have no
    * bigram occurrences and are absent from the output (both
    * engines). */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextOps.words(col(textCol))
    // compiled kernel, NOT an interpreted transform/sequence lambda —
    // the occurrence frame feeds two plan subtrees (the count agg and
    // the probe join), so the shingle loop runs twice per doc and an
    // interpreted HOF here measured ~5 s at sf0.1 vs sub-second compiled
    val occ = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shinglesAll(col(textCol), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val c2 = occ.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val c1 = docs.select(explode(w).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c_w1"))
    occ.join(c2, Seq("bg"))
      .join(c1, occ("w1") === c1("t"))
      .withColumn("p", expr("(1000 * c_bg) DIV c_w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("_sp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("_sp DIV n_bigrams").as("lm_score_permille"))
  }

  /** HELD-OUT bigram LM scoring (r12) — the actual CCNet shape: the
    * reference LM is trained on a TRUSTED subset (CCNet uses a
    * Wikipedia-trained model; here any `trainDocs` frame) and scores
    * a DIFFERENT corpus, so a document's score measures similarity
    * to the reference domain, not to the corpus's own average (the
    * in-corpus [[bigramLmScore]] can't flag a corpus that is
    * uniformly junk). Unseen bigrams contribute probability 0 and
    * unseen head words score 0 — integer-exact OOV handling, no
    * smoothing constant to round differently across engines. Same
    * integer arithmetic as the in-corpus scorer: p = (1000·c_bg) DIV
    * c_w1 over TRAIN counts, doc score = Σp DIV n_bigrams.
    *
    * Scale shape: the train counts are vocab-bounded exchanges over
    * the (smaller) reference corpus; scoring is the same token-linear
    * two-join plan as [[bigramLmScore]] — LEFT joins so OOV rows
    * survive to the aggregate. */
  def bigramLmScoreHeldOut(trainDocs: DataFrame, scoreDocs: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    val occT = trainDocs.select(explode(TextOps.shinglesAll(col(textCol), 2)).as("bg"))
    val c2 = occT.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val c1 = trainDocs.select(explode(TextOps.words(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c_w1"))
    val occ = scoreDocs.select(col(idCol).as("doc_id"),
        explode(TextOps.shinglesAll(col(textCol), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    occ.join(c2, Seq("bg"), "left")
      .join(c1, occ("w1") === c1("t"), "left")
      .withColumn("p", when(col("c_w1").isNull || col("c_w1") === 0L, 0L)
        .otherwise(expr("(1000 * coalesce(c_bg, 0)) DIV c_w1")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("_sp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("_sp DIV n_bigrams").as("lm_score_permille"))
  }

  /** SKIP-GRAM CO-OCCURRENCE COUNTS — the word2vec/GloVe
    * preprocessing table: for every ordered token pair (w₁, w₂) with
    * w₂ at most `window` positions after w₁ in the same document, the
    * occurrence count; top `topN` pairs by (count DESC, pair ASC).
    * Generalizes bigrams (window = 1) to the sliding co-occurrence
    * window embedding trainers actually consume.
    *
    * Scale shape: pair generation is a PER-ROW expression — one
    * codegen'd HOF per offset d ∈ 1..window zips the token array with
    * itself shifted by d (`w[i] || ' ' || w[i+d]`), so NO self-join
    * of the token stream and no position explode. The count runs as
    * NOMINATE-then-RECOUNT (r10, the [[Sketches.heavyHitters]] shape,
    * after the 100× rehearsal measured the string-keyed aggregate at
    * 19× wall on 10× data — distinct-pair growth makes the partial
    * hash tables spill through their string keys):
    *  1. the corpus-wide exchange aggregates xxhash64(pair) — fixed
    *     8-byte keys through both the partial maps and the wire
    *     (the [[Dedup.ngramJaccard]] hashKeys argument);
    *  2. the top 3·topN hashes are nominees (margin for count ties;
    *     a collision only INFLATES a bucket, so a true top-N pair's
    *     bucket cannot rank below ~topN genuinely-heavier buckets);
    *  3. an exact per-STRING recount over the broadcast nominee set —
    *     re-deriving pairs costs one more codegen'd scan, and the
    *     recount exchange is nominee-bounded — makes the reported
    *     counts collision-proof; like heavy hitters, the sketch layer
    *     is result-invisible (the oracle replays the naive GROUP BY).
    * Global top-N is TakeOrdered; rank after limit. */
  def skipgramCounts(docs: DataFrame, idCol: String, textCol: String,
                     window: Int = 4, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1)
    // project the token split ONCE — referencing words(textCol) in
    // every offset's HOF re-splits the document `window` times
    // (measured 19.5 s → 4.1 s at the 10× corpus)
    val w = col("_w")
    // short docs: Spark's sequence(1, n) DESCENDS when n < 1 (it would
    // index position 0), so offsets past the doc length take an
    // explicit empty array — DuckDB's generate_series is empty there
    val pairsPerOffset = (1 to window).map { d =>
      when(size(w) > d,
        transform(sequence(lit(1), size(w) - d),
          i => concat(element_at(w, i), lit(" "), element_at(w, i + d))))
        .otherwise(array().cast("array<string>"))
    }
    def pairs = docs
      .select(TextOps.words(col(textCol)).as("_w"))
      .select(explode(flatten(array(pairsPerOffset: _*))).as("pair"))
    // TIE-COMPLETE nominee cut (r10 ADVICE): a fixed limit(3·topN)
    // chooses among count-TIED buckets by hash order, while the
    // oracle's final tie-break is pair ASC — a lexicographically
    // smaller tied pair could fail nomination and diverge the
    // declared top-N. Instead nominate every bucket whose count
    // reaches the 3·topN-th count: that threshold is ≤ the true
    // topN-th PAIR count (hash buckets only merge counts upward), so
    // every pair that can appear in the final top-N — including all
    // margin ties — is nominated. The threshold is a well-defined
    // value (min over the multiset of the 3·topN largest counts)
    // regardless of which tied buckets the limit observes, and it
    // rides the plan as a broadcast 1-row frame — no collect. The
    // bucket-count frame feeds BOTH the threshold branch and the
    // nominee join; it is PERSISTED (hash-bounded: one 16-byte row
    // per distinct pair hash — the exchange output we would otherwise
    // recompute) because the threshold's broadcast subquery executes
    // as a separate job, where ReuseExchange cannot serve the second
    // read and the whole pair scan + exchange ran twice (the r11
    // driver-measured 1.49 → 2.26 s regression, r11 verdict task 3).
    // Per-invocation frame, never unpersisted by the builder (it
    // feeds the returned lazy plan): MEMORY_AND_DISK is LRU-evictable
    // — the repeatedSpans nominee convention — so repeated Bench reps
    // accumulate evictable copies, not pinned ones.
    val bucketCounts = pairs.groupBy(xxhash64(col("pair")).as("h"))
      .agg(count(lit(1)).as("hn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = bucketCounts.orderBy(col("hn").desc).limit(3 * topN)
      .agg(min("hn").as("_thr"))
    val nominees = bucketCounts.join(broadcast(thr), col("hn") >= col("_thr"))
      .select("h")
    val top = pairs
      .join(broadcast(nominees), xxhash64(col("pair")) === col("h"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topN)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("pair"))).cast("int"))
      .select(col("rank"), col("pair"), col("n"))
  }

  /** TOP-N COLLOCATIONS by DICE COEFFICIENT — the corpus-level
    * "which word pairs travel together" report a tokenizer-merge or
    * phrase-mining stage starts from. For every bigram with at least
    * `minCount` occurrences: dice_permille = 2000·c(w₁w₂) DIV
    * (c(w₁)+c(w₂)), ranked (dice DESC, count DESC, bigram ASC).
    *
    * Dice over PMI is a deliberate determinism choice: PMI needs a log
    * (or an N·c(ab)/(c(a)·c(b)) ratio whose BIGINT product overflows
    * once N·c(ab) passes 2⁶³ — reachable at ~10 TB of text), while
    * Dice's numerator is bounded by 2000·min(c(w₁),c(w₂)) ≤ 2000·N,
    * inside int64 for any corpus below ~4·10¹⁵ tokens. All integer —
    * hash-exact across engines.
    *
    * Scale shape: the bigram count is the same token-linear shuffle as
    * [[bigramLmScore]]'s; the minCount filter then shrinks the
    * candidate table BEFORE both unigram-count joins (rare bigrams —
    * the vast majority — never join); global top-N is TakeOrdered
    * (per-partition heaps via orderBy+limit), with rank assigned after
    * the limit on ≤ N rows — no single-partition sort funnel. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Int = 5, topN: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c2 = docs.select(explode(TextOps.shinglesAll(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("n_bg"))
      .filter(col("n_bg") >= minCount)
    val c1 = docs.select(explode(TextOps.words(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_w"))
    val top = c2
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(c1.select(col("t").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(c1.select(col("t").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .withColumn("dice_permille", expr("(2000 * n_bg) DIV (n_w1 + n_w2)"))
      .orderBy(col("dice_permille").desc, col("n_bg").desc, col("bg"))
      .limit(topN)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("dice_permille").desc, col("n_bg").desc, col("bg")))
        .cast("int"))
      .select(col("rank"), col("bg"), col("n_bg"), col("n_w1"), col("n_w2"),
        col("dice_permille"))
  }

  /** CCNet-STYLE QUALITY BUCKETS — the per-language head/middle/tail
    * split of a pretraining corpus: every document is scored by the
    * corpus bigram LM ([[bigramLmScore]]), assigned its predicted
    * language ([[langId]]), and placed into one of `nBuckets`
    * equal-count quality terciles WITHIN its language — exactly SQL
    * `NTILE(n) OVER (PARTITION BY lang ORDER BY score, doc_id)`,
    * which is what the oracle runs.
    *
    * Scale shape: NTILE's naive plan is the classic stratum funnel —
    * one task sorts each language's entire corpus. Here the per-lang
    * rank comes from [[stratumRank]] (two-level bucketed ranking,
    * parallelism langs×buckets) over a composite BIGINT ordering key
    * `score·2³² + doc_id` (lexicographic (score, id) order as long as
    * ids stay under 2³²), and the NTILE bucket is then pure arithmetic
    * on (rank, per-lang count): with q = n DIV b and r = n % b the
    * first r buckets hold q+1 rows — no global sort anywhere. The
    * per-lang counts frame is ≤ |langs| rows, broadcast. */
  def qualityBuckets(docs: DataFrame, idCol: String, textCol: String,
                     nBuckets: Int = 3): DataFrame = {
    val lm = bigramLmScore(docs, idCol, textCol)
      .select(col("doc_id"), col("lm_score_permille"))
    val lang = langId(docs, idCol, textCol)
      .select(col("doc_id"), col("predicted_lang").as("lang"))
    val scored = lm.join(lang, "doc_id")
      .withColumn("_key",
        col("lm_score_permille") * lit(1L << 32) + col("doc_id"))
    // per-lang totals ride stratumRank's broadcast counts frame
    // (sizeCol) instead of a 4th aggregation pass over `scored` —
    // `scored` re-runs the LM-score + langid join per consumer, so
    // dropping the separate sizes subtree removes one full
    // per-document pass (r17 optimization round)
    val ranked = stratumRank(scored, "lang", "_key", rankCol = "_rank",
      sizeCol = Some("_n"))
    val bucket = expr(
      s"""CASE WHEN _rank <= (_n % $nBuckets) * (_n DIV $nBuckets + 1)
         |  THEN (_rank - 1) DIV (_n DIV $nBuckets + 1) + 1
         |  ELSE (_n % $nBuckets)
         |    + (_rank - (_n % $nBuckets) * (_n DIV $nBuckets + 1) - 1)
         |      DIV (_n DIV $nBuckets) + 1
         |END""".stripMargin)
    ranked
      .withColumn("bucket", bucket)
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("lm_score_permille").as("min_permille"),
        max("lm_score_permille").as("max_permille"))
  }

  /** BM25 top-k document retrieval for a fixed query-term set — the
    * lexical-retrieval stage of a RAG / data-curation pipeline
    * (Robertson-Spärck Jones BM25 with k1 = 6/5, b = 3/4).
    *
    * Determinism across engines is the whole design: the classic
    * formulation's `ln((N-df+.5)/(df+.5))` differs in the last ulp
    * between libm implementations, so this uses the ln-free rational
    * pair (monotone-equivalent term by term):
    *
    *   idf = (2(N−df)+1) / (2df+1)
    *   tfc = 44·tf·Σdl / (20·tf·Σdl + 6·Σdl + 18·dl·N)
    *
    * where tfc is tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with numerator
    * and denominator multiplied through by 20·Σdl — every operand an
    * exact BIGINT, each factor ONE correctly-rounded double division,
    * identical bits in every IEEE engine. Per-term scores are floored
    * to integer micros BEFORE the per-doc sum, so the sum is exact
    * integer arithmetic — order-independent, unlike a double sum whose
    * value depends on shuffle arrival order. (Int64→double casts stay
    * correctly rounded past 2^53 in both engines; only precision, not
    * determinism, degrades at extreme corpus sizes.)
    *
    * Two documented bounds of the rational form:
    *  - RANKING CAVEAT: dropping ln is monotone-equivalent PER TERM,
    *    so single-term rankings match textbook BM25 exactly; after the
    *    per-doc SUM, multi-term rankings can deviate from the log-idf
    *    formulation (the idf ratios enter linearly, not
    *    logarithmically). This is a deliberate BM25 VARIANT traded for
    *    bit-portability, not a drop-in ranking replica.
    *  - OVERFLOW BOUND: the BIGINT products 44·tf·Σdl and 18·dl·N must
    *    stay inside int64, i.e. tf·Σdl < ~2^57 — safe up to corpora of
    *    ~10^13 total tokens with tf ≤ 10^3; past that, non-ANSI Spark
    *    wraps silently while DuckDB raises, so compute the products in
    *    decimal(38,0) before the double cast if you ever run there.
    *
    * Scale shape: dl is a per-row expression (no explode); the token
    * stream is filtered to the query terms BEFORE the tf aggregate, so
    * the heavy shuffle carries only matching occurrences; df (≤ |terms|
    * rows) and the corpus stats (1 row) are broadcast; the dl join is a
    * doc-keyed equi-join AQE can broadcast while the match set is
    * small. Global top-k is TakeOrdered (per-partition heaps), with
    * rank assigned after the limit on ≤ k rows. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 50): DataFrame =
    bm25TopKFromScored(bm25Scores(docs, idCol, textCol,
      _.filter(col("token").isin(queryTerms: _*))), k)

  /** Rank stage of [[bm25TopK]], split out so a caller that issues
    * SEVERAL retrievals over one term universe (the declared bm25
    * queries share a 5-term set) can compute — and persist — the
    * scored (doc, token) frame ONCE and rank many ways; the frame is
    * matched-occurrence-sized (≤ |terms|·|docs| rows), never
    * token-stream-sized. */
  def bm25TopKFromScored(scored: DataFrame, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = scored.groupBy("doc_id")
      .agg(sum(col("score_micros")).as("bm25_micros"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_micros").desc, col("doc_id"))
      .limit(k)
    perDoc.withColumn("rank",
        row_number().over(Window.orderBy(col("bm25_micros").desc, col("doc_id")))
          .cast("int"))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("bm25_micros"))
  }

  /** The shared BM25 scoring core: token-filtered tf aggregate, df and
    * corpus stats broadcast, the ln-free rational idf·tfc per
    * (doc, token) floored to integer micros. `tokenFilter` narrows the
    * exploded token stream BEFORE the tf shuffle — an `isin` predicate
    * for a literal term set, a broadcast semi-join for a term TABLE.
    * Public so query layers can build the scored frame once and feed
    * both [[bm25TopKFromScored]] and [[bm25TopKPerQueryFromScored]]. */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 tokenFilter: DataFrame => DataFrame): DataFrame = {
    val dl = docs.select(col(idCol).as("doc_id"),
      size(TextOps.words(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("_n"), sum(col("dl")).as("_sumdl"))
    val tf = tokenFilter(docs.select(col(idCol).as("doc_id"),
        explode(TextOps.words(col(textCol))).as("token")))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfreq), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (lit(2L) * (col("_n") - col("df")) + lit(1L)).cast("double") /
          (lit(2L) * col("df") + lit(1L)))
      .withColumn("tfc",
        (lit(44L) * col("tf") * col("_sumdl")).cast("double") /
          (lit(20L) * col("tf") * col("_sumdl") + lit(6L) * col("_sumdl") +
            lit(18L) * col("dl") * col("_n")))
      .withColumn("score_micros",
        floor(col("idf") * col("tfc") * lit(1000000.0)).cast("long"))
  }

  /** BM25 top-k per QUERY from a query-terms TABLE — the composable
    * retrieval stage ([[bm25TopK]] hardcodes one literal term set;
    * this form joins a (query_id, token) frame, so a batch of queries
    * — or the output of an upstream pipeline stage — retrieves in ONE
    * corpus pass). Same rational arithmetic, same determinism
    * engineering, same caveats as [[bm25TopK]].
    *
    * Scale shape: the query-terms frame is broadcast twice (the
    * pre-shuffle token semi-join, then the per-query fan-out of
    * scored terms); df stays corpus-wide (query-independent) and each
    * (doc, token) is scored ONCE however many queries share the term.
    * The only per-query cost is the final (query_id, doc_id) rank —
    * partitioned by query_id, so k-selection never funnels. */
  def bm25TopKPerQuery(docs: DataFrame, idCol: String, textCol: String,
                       queryTerms: DataFrame, k: Int = 50): DataFrame = {
    val terms = queryTerms
      .select(col("query_id").cast("int").as("query_id"), col("token")).distinct()
    val distinctTerms = terms.select("token").distinct()
    val scored = bm25Scores(docs, idCol, textCol,
      _.join(broadcast(distinctTerms), Seq("token")))
    bm25TopKPerQueryFromScored(scored, queryTerms, k)
  }

  /** Per-query rank stage of [[bm25TopKPerQuery]] over a precomputed
    * scored frame (see [[bm25TopKFromScored]]). The scored frame must
    * cover every token the query table mentions. */
  def bm25TopKPerQueryFromScored(scored: DataFrame, queryTerms: DataFrame,
                                 k: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = queryTerms
      .select(col("query_id").cast("int").as("query_id"), col("token")).distinct()
    val perQueryDoc = scored.join(broadcast(terms), Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("score_micros")).as("bm25_micros"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("bm25_micros").desc, col("doc_id"))
    perQueryDoc.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms"), col("bm25_micros"))
  }

  def corpusStats(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"),
        size(TextOps.words(col("text"))).as("n_tokens"),
        col("n_chars"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))

  /** PII patterns shared by [[piiScrub]] and its oracle SQL — the
    * subset of regex syntax Java's engine and RE2 (DuckDB) interpret
    * identically: character classes, bounded/unbounded counts, no
    * backrefs or lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII SCRUB — the redaction pass every pretraining pipeline runs
    * before anything else: detect and replace email addresses and
    * (NANP-shaped) phone numbers with typed placeholder tokens,
    * reporting per-document match counts so downstream filters can
    * drop PII-dense documents entirely.
    *
    * Scale shape: pure per-row regex scan — zero shuffles, fully
    * codegen'd (`regexp_extract_all`/`regexp_replace` are native
    * expressions), embarrassingly parallel at any corpus size. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PhoneRe), lit(0))).as("n_phones"),
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("scrubbed"))

  /** BOILERPLATE LINE REMOVAL — the CCNet/RefinedWeb hygiene pass:
    * split every document into lines, count how many DISTINCT
    * documents each exact line occurs in, delete lines present in
    * more than `maxDocShare` of the corpus (nav menus, cookie
    * banners, footers), and reassemble the survivors in original
    * order. Returns (doc_id, clean text, n_lines, n_removed).
    *
    * Scale shape: line df-counting is a distinct+count keyed on the
    * line value — token-linear, map-side-combined, no broadcast of
    * the frequency table (the boilerplate verdict travels back by a
    * second shuffle join on the line, so a million-line boilerplate
    * set costs the same as ten). Reassembly groups by doc_id with a
    * sort_array over (pos, line) structs — per-doc work bounded by
    * one document's lines. Corpus size for the share threshold is a
    * 1-row broadcast. */
  /** TOPIC CLUSTERING of documents — k-means over hashed
    * bag-of-words vectors, the unsupervised corpus-map stage of a
    * curation pipeline (domain discovery, mixture balancing): each
    * document becomes a `buckets`-dim token-count vector (the
    * corpus-standard mod-P fold buckets tokens — exact integers cast
    * to double), k centers initialize from the k lowest doc_ids (the
    * oracle-checkable reference init) and run `iters` exact-decimal
    * Lloyd rounds through [[graft.cluster.KMeansNative.fitExact]] — the
    * SAME decimal-bridge trajectory the kmeans_fit_native oracle
    * proves — then every document assigns to its nearest final
    * center (compiled argmin, ties to the lowest cid) and the report
    * aggregates per cluster: size and dominant language.
    *
    * Scale shape: vector assembly is one (doc, bucket) map-side-
    * combined exchange + a doc-keyed dense-assemble; each Lloyd round
    * moves only k·d decimal partials to the driver (the proven
    * kmeans shape); assignment is a per-row compiled expression over
    * one re-scan; the report is k·langs-bounded. */
  def topicClusters(docs: DataFrame, idCol: String, langCol: String,
                    textCol: String, buckets: Int = 32, k: Int = 8,
                    iters: Int = 5,
                    trained: Option[Array[Array[Double]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = docVectors(docs, idCol, textCol, buckets)
    val centers = trained.getOrElse(trainTopicCenters(vecs, k, iters))
    val asg = vecs.select(col("doc_id"),
      graft.plans.expressions.vec_argmin(col("v"), centers)("cluster_id").as("cid"))
    val byLang = asg
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")), "doc_id")
      .groupBy("cid", "lang").agg(count(lit(1)).as("n"))
    val top = byLang
      .withColumn("rn", row_number().over(
        Window.partitionBy("cid").orderBy(col("n").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("lang").as("top_lang"), col("n").as("top_lang_docs"))
    byLang.groupBy("cid").agg(sum("n").as("n_docs"))
      .join(top, "cid")
      .select(col("cid").cast("int").as("cluster_id"), col("n_docs"),
        col("top_lang"), col("top_lang_docs"))
      .orderBy("cluster_id")
  }

  /** TOPIC KEYWORDS — cluster labeling: the top-m most DISTINCTIVE
    * tokens per topic cluster by integer lift
    * `(c_kt · 1000 · T) DIV (n_k · c_t)` (within-cluster rate over
    * corpus rate in permille — stopwords score ≈1000 everywhere and
    * never surface; a token concentrated in one cluster scores ≈
    * 1000·k). The human-readable face of [[topicClusters]]: "what IS
    * cluster 3", the report an operator reads before naming a data
    * slice. Tokens below `minCount` in-cluster occurrences are noise
    * and excluded.
    *
    * Shape: the assignment is the PER-ROW compiled argmin over the
    * broadcast centers (no doc-keyed join — cid is computed once per
    * document in a projection BELOW the token explode, so the token
    * stream never shuffles on doc_id), one (cid, token) exchange
    * (map-side combined, vocab×k-bounded cells), then vocab-bounded
    * arithmetic — cluster totals broadcast (k rows), corpus token
    * counts join on the word key, the 1-row grand total broadcasts,
    * rank is a window over the minCount-filtered survivors. The lift
    * numerator c_kt·1000·T stays under 2⁶³ while T < 3·10⁹ tokens per
    * run (document at the full-corpus scale the report would shard by
    * source first). */
  def topicKeywords(docs: DataFrame, idCol: String, textCol: String,
                    buckets: Int, k: Int, iters: Int,
                    minCount: Long = 5L, topM: Int = 5,
                    trained: Option[Array[Array[Double]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centers = trained.getOrElse(
      trainTopicCenters(docVectors(docs, idCol, textCol, buckets), k, iters))
    val ckt = docs
      .select(graft.plans.expressions.vec_argmin(
          graft.plans.expressions.hashed_bow(col(textCol), buckets),
          centers)("cluster_id").as("cid"),
        col(textCol).as("_t"))
      .select(col("cid"), explode(TextOps.words(col("_t"))).as("w"))
      .groupBy("cid", "w").agg(count(lit(1)).as("c_kt"))
    val nk = ckt.groupBy("cid").agg(sum("c_kt").as("n_k"))
    val ct = ckt.groupBy("w").agg(sum("c_kt").as("c_t"))
    val tt = ct.agg(sum("c_t").as("tt"))
    val scored = ckt.filter(col("c_kt") >= minCount)
      .join(broadcast(nk), "cid")
      .join(ct, "w")
      .crossJoin(broadcast(tt))
      .withColumn("lift_permille", expr("(c_kt * 1000 * tt) DIV (n_k * c_t)"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("cid")
        .orderBy(col("lift_permille").desc, col("w"))))
      .filter(col("rank") <= topM)
      .select(col("cid").cast("int").as("cluster_id"),
        col("rank").cast("int").as("rank"), col("w").as("token"),
        col("c_kt").as("n_in_cluster"), col("c_t").as("n_in_corpus"),
        col("lift_permille"))
      .orderBy("cluster_id", "rank")
  }

  /** Hashed bag-of-words document vectors for [[topicClusters]] and
    * the streaming serving twin: ONE compiled O(tokens) pass per row
    * ([[graft.plans.expressions.HashedBow]]) — no (doc, bucket)
    * exchange at all (the explode/group-by/dense-assemble formulation
    * this replaced shuffled a token-linear stream; the kernel makes
    * vector assembly a scan). Shuffle-free, so it composes with
    * Structured Streaming stateless (see `stream_topic_parity`). */
  def docVectors(docs: DataFrame, idCol: String, textCol: String,
                 buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.plans.expressions.hashed_bow(col(textCol), buckets).as("v"))

  /** First-k init + exact-decimal Lloyd over [[docVectors]] output. */
  def trainTopicCenters(vecs: DataFrame, k: Int, iters: Int): Array[Array[Double]] =
    graft.cluster.KMeansNative.fitExact(vecs, "v",
      graft.cluster.KMeansNative.firstKCenters(vecs, "doc_id", "v", k), iters)

  /** Per-source n-gram NOVELTY curve — the marginal-contribution
    * signal a data-mixing pipeline reads before adding a source to
    * the blend (the "how much NEW text does this slice buy"
    * question): every distinct word `n`-gram is attributed to its
    * FIRST source in source-name order (min(source) — a total,
    * engine-portable order), and each source reports its distinct
    * grams, the novel ones it introduces, novelty in integer
    * permille, and the cumulative distinct-gram count of the blend up
    * to it.
    *
    * Scale shape: the (source, gram) frame is distinct-reduced
    * map-side before its single gram-keyed exchange (both the
    * min-source attribution and the per-source totals ride the same
    * distinct stream); everything after is sources-bounded, and the
    * running sum is a window over ≤ |sources| rows. */
  def noveltyCurve(docs: DataFrame, sourceCol: String, textCol: String,
                   n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sg = docs.select(col(sourceCol).as("source"),
        explode(TextOps.shingles(col(textCol), n)).as("g"))
      .distinct()
    val firstSrc = sg.groupBy("g").agg(min("source").as("source"))
    val novel = firstSrc.groupBy("source").agg(count(lit(1)).as("n_novel"))
    val totals = sg.groupBy("source").agg(count(lit(1)).as("n_distinct_grams"))
    totals.join(novel, Seq("source"), "left")
      .select(col("source"), col("n_distinct_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_permille",
        expr("(1000 * n_novel) DIV n_distinct_grams"))
      .withColumn("cum_distinct", sum("n_novel").over(
        Window.orderBy("source").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .orderBy("source")
  }

  /** Pairwise source OVERLAP matrix — the sources² companion of
    * [[noveltyCurve]]: for every source pair with a non-empty shared
    * n-gram set, the shared distinct-gram count and its permille of
    * EACH side's distinct-gram universe (overlap is asymmetric: a
    * small source can sit entirely inside a large one). This is the
    * cross-source leakage report a blend designer reads next to the
    * novelty curve — which pairs of feeds are actually the same crawl.
    *
    * Scale shape: one gram-keyed exchange over the map-side-distinct
    * (source, gram) stream (the noveltyCurve exchange); per gram the
    * source SET is |sources|-bounded, its pair explosion |sources|²,
    * and the (a, b) counts map-side-combine to a sources²-bounded
    * exchange. Nothing pairwise ever touches gram frequency — the
    * self-join formulation this replaces is Σ freq(g)² in the worst
    * case. Totals broadcast. */
  def sourceOverlap(docs: DataFrame, sourceCol: String, textCol: String,
                    n: Int = 5): DataFrame = {
    // ONE gram-keyed exchange serves BOTH report branches (r17
    // optimization, guide §2.4 "two operations keyed the same way can
    // share one exchange"): collect_set dedupes (gram, source) inside
    // the aggregate, so the old separate corpus-wide `.distinct()`
    // exchange of the gram strings is gone, and per-source totals
    // fall out of the same per-gram source sets (each (g, source)
    // counted once — exactly the distinct-gram count) instead of a
    // third corpus-keyed pass. Row-identical output (probe-verified
    // and oracle-checked).
    val sg = docs.select(col(sourceCol).as("source"),
      explode(TextOps.shingles(col(textCol), n)).as("g"))
    val gb = sg.groupBy("g").agg(sort_array(collect_set(col("source"))).as("ss"))
    val totals = gb.select(explode(col("ss")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("c"))
    val pairs = gb
      .filter(size(col("ss")) > 1)
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(totals.select(col("source").as("source_a"), col("c").as("ca"))),
        "source_a")
      .join(broadcast(totals.select(col("source").as("source_b"), col("c").as("cb"))),
        "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        expr("(1000 * n_shared) DIV ca").as("shared_permille_a"),
        expr("(1000 * n_shared) DIV cb").as("shared_permille_b"))
      .orderBy("source_a", "source_b")
  }

  /** BPE merge learning (Sennrich et al., "Neural Machine Translation
    * of Rare Words with Subword Units", arXiv:1508.07909) — tokenizer
    * TRAINING as a declared query: starting from per-character
    * symbols, each round counts adjacent symbol pairs across the
    * vocabulary weighted by word frequency, merges the most frequent
    * pair (ties: count DESC, then pair string ASC — a total order),
    * and rewrites every word with the greedy leftmost-non-overlapping
    * pass ([[graft.plans.expressions.BpeMergeKernel]], compiled). The
    * output is the learned merge table — (round, lhs, rhs, merged,
    * pair_count) — exactly what a BPE tokenizer ships.
    *
    * Scale shape is the Lloyd-iteration story: ONE corpus-sized
    * token-count exchange up front, after which every round runs on
    * the persisted VOCABULARY frame (distinct words — bounded by
    * vocabulary, not corpus, growth) with a pair aggregate bounded by
    * vocab × word-length and a 1-row collect (the argmax pair — the
    * same k·d-bounded driver hand-off as Lloyd centers). 100 TB of
    * text changes the weights `n`, not the frame the rounds touch.
    * The rewrite chain re-evaluates earlier rounds' folds against the
    * cached base (O(rounds²) vocab-bounded passes — at 10 rounds,
    * noise). The vocab cache is released once the merge table (driver
    * literals, no lineage) is built. */
  def bpeLearnMerges(docs: DataFrame, idCol: String, textCol: String,
                     rounds: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = docs.select(explode(TextOps.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("syms"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocab = vocab0
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val arr = split(col("syms"), " ")
      val pairsCol = when(size(arr) >= 2,
        transform(sequence(lit(1), size(arr) - 1),
          i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
        .otherwise(array())
      val best = vocab.select(explode(pairsCol).as("p"), col("n"))
        .groupBy("p").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("p")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Array(a, b) = best(0).getString(0).split(" ", 2)
        learned += ((r, a, b, a + b, best(0).getLong(1)))
        vocab = vocab.select(
          graft.plans.expressions.bpe_merge_round(col("syms"), a, b).as("syms"),
          col("n"))
        r += 1
      }
    }
    vocab0.unpersist(blocking = false)
    learned.toSeq.toDF("round", "lhs", "rhs", "merged", "pair_count")
      .select(col("round").cast("int").as("round"), col("lhs"), col("rhs"),
        col("merged"), col("pair_count"))
      .orderBy("round")
  }

  /** BPE ENCODING with a learned merge table
    * ([[bpeLearnMerges]]'s output applied back to the corpus) — the
    * per-language compression report a tokenizer-training pipeline
    * checks before committing a vocab: words segment through the
    * merge chain (all `merges` folded into ONE projection of chained
    * compiled [[graft.plans.expressions.BpeMergeRound]] kernels over
    * the DISTINCT-word frame), and subword counts ride word
    * OCCURRENCE counts back up to (lang, n_docs, n_words,
    * n_bpe_tokens, bpe_per_kiloword = ⌊1000·n_bpe/n_words⌋).
    *
    * Scale shape: the corpus-sized token stream hits exactly one
    * map-side-combined exchange — the (lang, word) occurrence count;
    * everything after (distinct words, the merge chain, the
    * word-keyed join, the langs-bounded report) is vocabulary-sized.
    * The encode never re-reads raw text per merge: 10 merges = 10
    * fused kernel calls in one stage over distinct words. */
  def bpeEncodeReport(docs: DataFrame, langCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val occ = docs
      .select(col(langCol).as("lang"), explode(TextOps.words(col(textCol))).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val syms0 = trim(regexp_replace(col("w"), "(.)", "$1 "))
    val symsN = merges.foldLeft(syms0) { case (c, (a, b)) =>
      graft.plans.expressions.bpe_merge_round(c, a, b) }
    val enc = occ.select("w").distinct()
      .select(col("w"), size(split(symsN, " ")).cast("long").as("n_bpe"))
    val perLang = occ.join(enc, "w")
      .groupBy("lang")
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("n_bpe")).as("n_bpe_tokens"))
    val nd = docs.groupBy(col(langCol).as("lang")).agg(count(lit(1)).as("n_docs"))
    perLang.join(nd, "lang")
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe_tokens"),
        expr("(1000 * n_bpe_tokens) DIV n_words").as("bpe_per_kiloword"))
      .orderBy("lang")
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * documents scored by a hashed-n-gram likelihood ratio between a
    * TARGET slice and the RAW corpus, then the top-K selected — the
    * "make the pretraining mix look like the target domain" stage of
    * a training-data pipeline.
    *
    * Features are unigram + bigram occurrences (multiplicity kept)
    * hashed into `buckets` cells by the corpus-standard mod-P char
    * fold ([[TextOps.rollingFingerprint]]) — the paper's hashed
    * bag-of-n-grams. Per bucket, Laplace-smoothed occurrence rates
    * u = (c_t+1)/(N_t+B) under the target and v = (c_r+1)/(N_r+B)
    * under the raw corpus give the bucket score
    * s = ⌊10⁶ · (u / v)⌋ in integer micros; a document's weight is
    * Σ s over its feature OCCURRENCES — the paper's per-feature
    * log-ratio sum with the log dropped (logs differ in the last ulp
    * across libm implementations; the ratio itself is three IEEE ops
    * in pinned order — two divisions, one multiply — each correctly
    * rounded, so the floor is bit-identical in any IEEE engine, the
    * BM25 determinism idiom). Operand exactness holds while bucket
    * counts stay below 2^53 (~9·10¹⁵ occurrences — past any real
    * corpus). The paper then Gumbel-samples ∝ w; the deterministic
    * analogue declared here is top-K by (weight DESC, doc_id) —
    * resampling with the randomness replaced by the total order.
    *
    * Scale shape: the feature stream never leaves its scan partition
    * un-aggregated — bucket stats are ONE map-side-combined exchange
    * whose result is bounded at `buckets` rows and COLLECTED (the
    * bloom-words bounded-collect idiom; a declarative totals
    * re-aggregate would make Catalyst re-scan the corpus a third
    * time), totals and the score table computed driver-side with the
    * same pinned IEEE ops, then ≤ `buckets` (bucket, s) rows
    * broadcast back onto the re-scanned stream — the whole job is
    * TWO corpus scans, one buckets-bounded exchange, one doc-keyed
    * exchange; the global top-K is TakeOrdered (per-partition
    * heaps), rank assigned after the limit on ≤ K rows. */
  def dsirImportance(docs: DataFrame, idCol: String, textCol: String,
                     targetFilter: Column, buckets: Int = 4096,
                     topK: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = explode(concat(
      TextOps.words(col(textCol)),
      TextOps.shinglesAll(col(textCol), 2))).as("f")
    val occ = docs
      .select(col(idCol).as("doc_id"), targetFilter.as("is_t"), feats)
      .select(col("doc_id"), col("is_t"),
        pmod(TextOps.rollingFingerprint(col("f")), lit(buckets.toLong)).as("bucket"))
    val bs = occ.groupBy("bucket").agg(
        count(lit(1)).as("c_r"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nR = bs.map(_._2).sum
    val nT = bs.map(_._3).sum
    val bw = bs.toSeq.map { case (bk, cR, cT) =>
      val u = (cT + 1).toDouble / (nT + buckets).toDouble
      val v = (cR + 1).toDouble / (nR + buckets).toDouble
      (bk, math.floor(1e6 * (u / v)).toLong)
    }.toDF("bucket", "s")
    val dw = occ.join(broadcast(bw), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"), sum("s").as("weight_micros"))
    dw.orderBy(col("weight_micros").desc, col("doc_id")).limit(topK)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("weight_micros").desc, col("doc_id"))).cast("int"))
      .select(col("rank"), col("doc_id"), col("n_features"), col("weight_micros"))
      .orderBy("rank")
  }

  /** Exact repeated-substring spans (the signal behind Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 — their suffix-array ExactSubstr dedup): per
    * document, the maximal spans covered by character `gramLen`-grams
    * that occur MORE THAN ONCE in the corpus (any document, any
    * position, the same document included). Two verbatim occurrences
    * of a ≥ gramLen-char passage are covered in both places, so
    * `covered_chars` is the per-doc budget an ExactSubstr pass would
    * cut.
    *
    * The suffix array is re-expressed as the repo's nominate-then-
    * verify cascade (the skip-gram idiom): pass 1 explodes per-
    * position O(n) ROLLING gram fingerprints
    * ([[graft.plans.expressions.GramKernel]], 8 bytes/position) and
    * map-side-combines them into a fingerprint→count exchange; fps
    * with count > 1 nominate (no false negatives: equal substrings
    * hash equally), and the actual substring is materialized ONLY for
    * nominated positions. Hash-collision candidates die in the
    * substring-keyed count>1 verify (exact — the result equals the
    * all-substrings computation the oracle runs). Verified positions
    * (repeat-bounded, not corpus-bounded) merge into maximal spans
    * per doc: islands over the sorted positions (gap > gramLen splits
    * — lag+sum, all integer), then per-island [min, max+gramLen)
    * extents. Only documents with at least one repeated gram appear.
    *
    * The nominate→candidate hand-off SIZE-DISPATCHES (the
    * embeddingCosineAuto idiom; both paths are result-identical,
    * spec-pinned): a real pretraining corpus is repetition-SPARSE, so
    * the nominee set is tiny and broadcasts back onto a re-scan where
    * explode → broadcast-join → substr fuse into one codegen stage —
    * the position stream never hits a second exchange. Past
    * `maxBroadcastNominees` (a repetition-DENSE corpus — the regime
    * where a nominee broadcast becomes a multi-hundred-MB hash
    * relation on every executor), nominees instead shuffle-join the
    * fingerprint stream (16 B/position) and survivors attach their
    * substring by a doc-keyed join against the raw text — the text
    * side is corpus-BYTES-sized, n bytes against n position rows, so
    * it is never the wide side of that exchange. The nominee frame is
    * persisted (nominee-bounded, LRU-evictable) so counting it for
    * the dispatch doesn't re-run the nominate exchange. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    gramLen: Int = 25,
                    maxBroadcastNominees: Long = 8000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val grams = graft.plans.expressions.gram_fingerprints(col("text"), gramLen)
    val pos1 = d.select(col("doc_id"), posexplode(grams).as(Seq("pos", "fp")))
    val nom = pos1.groupBy("fp").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNom = nom.count()
    val cand =
      if (nNom <= maxBroadcastNominees)
        d.select(col("doc_id"), col("text"), posexplode(grams).as(Seq("pos", "fp")))
          .join(broadcast(nom), "fp")
          .select(col("doc_id"), col("pos"),
            expr(s"substr(text, pos + 1, $gramLen)").as("sub"))
      else
        pos1.join(nom, "fp").select("doc_id", "pos")
          .join(d, "doc_id")
          .select(col("doc_id"), col("pos"),
            expr(s"substr(text, pos + 1, $gramLen)").as("sub"))
    val ver = cand
      .withColumn("sc", count(lit(1)).over(Window.partitionBy("sub")))
      .filter(col("sc") > 1)
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val spans = ver
      .withColumn("nw", when(lag("pos", 1).over(wd).isNull ||
        col("pos") > lag("pos", 1).over(wd) + gramLen, 1L).otherwise(0L))
      .withColumn("island", sum("nw").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("st"),
        (max("pos") + gramLen).cast("long").as("en"),
        count(lit(1)).as("ng"))
    spans.groupBy("doc_id")
      .agg(sum("ng").as("n_rep_grams"), count(lit(1)).as("n_spans"),
        sum(col("en") - col("st")).as("covered_chars"),
        max(col("en") - col("st")).as("max_span_chars"))
      .orderBy("doc_id")
  }

  /** TEMPERATURE-BASED source mixing — the multilingual-pretraining
    * resampling stage (mC4 / XLM-R style: sample source s with
    * probability ∝ qₛ^α, α < 1, so low-resource sources are
    * up-weighted relative to their natural share qₛ = tokensₛ/total).
    *
    * α is expressed as a number of SQRT APPLICATIONS (α = 2^−a):
    * sqrt is the one fractional power IEEE 754 requires correctly
    * rounded, so qₛ^α is bit-identical in any engine, while pow(x, α)
    * for general α differs across libm implementations — the same
    * determinism reasoning that keeps ln out of the BM25 scores. The
    * smoothed weights are integer-normalized (floor to micros, then
    * permille by integer division over the micro-sum), and the
    * per-source sampling budget is `targetDocs · weight DIV 1000`.
    *
    * One source-keyed exchange (sources-bounded cells after map-side
    * partials); the two 1-row totals broadcast. The report is the
    * manifest a zero-shuffle admission filter (hashModSample per
    * source at rate weight/share) consumes downstream. */
  def temperatureMix(docs: DataFrame, sourceCol: String, textCol: String,
                     targetDocs: Long, sqrtApplications: Int = 1): DataFrame = {
    require(sqrtApplications >= 1 && targetDocs > 0,
      "need >= 1 sqrt application (alpha = 2^-a) and a positive target")
    val per = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.words(col(textCol)))).cast("long").as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("_tt"))
    val q = col("n_tokens").cast("double") / col("_tt").cast("double")
    val r = (1 to sqrtApplications).foldLeft(q)((c, _) => sqrt(c))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("r", floor(r * 1000000.0d).cast("long"))
    val denom = scored.agg(sum("r").as("_rs"))
    scored.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(1000 * n_tokens) DIV _tt").as("share_permille"),
        expr("(1000 * r) DIV _rs").as("weight_permille"),
        expr(s"($targetDocs * ((1000 * r) DIV _rs)) DIV 1000").as("target_docs"))
      .orderBy("source")
  }

  /** MULTI-EPOCH ADMISSION — [[temperatureMix]]'s weights turned into
    * an actual per-epoch sampling plan: each source's admission rate
    * is its mixing budget over its size (capped at 1000‰), and a
    * document enters epoch e iff its epoch-salted Lehmer hash lands
    * under the rate — so every epoch draws a DIFFERENT ≈rate-sized
    * subset (the "sample fresh data each epoch" discipline that keeps
    * repeated epochs from memorizing one fixed slice), deterministic
    * and replayable from (doc_id, epoch) alone. The report counts
    * admitted docs/tokens per (epoch, source) — what a training
    * scheduler consumes.
    *
    * ZERO-shuffle admission (the hashModSample contract: a pure
    * filter, exact integer arithmetic) + one (epoch, source)-bounded
    * report aggregate; the rate frame (sources-bounded) broadcasts. */
  def epochAdmission(docs: DataFrame, idCol: String, sourceCol: String,
                     textCol: String, targetDocs: Long, epochs: Int,
                     sqrtApplications: Int = 1): DataFrame =
    admittedDocs(docs, idCol, sourceCol, textCol, targetDocs, epochs,
        sqrtApplications)
      .groupBy("epoch", "source")
      .agg(min("rate_permille").as("rate_permille"),
        count(lit(1)).as("n_admitted"),
        sum("n_toks").as("admitted_tokens"))
      .orderBy("epoch", "source")

  /** The admitted (doc, epoch) stream behind [[epochAdmission]] and
    * [[epochOverlap]] — rate-bounded (≈ Σ rates · n rows), never
    * corpus × epochs. */
  /** (source, rate_permille) — [[temperatureMix]]'s budgets as
    * admission rates, shared by the batch admission family and the
    * streaming parity twin. */
  def admissionRates(docs: DataFrame, sourceCol: String, textCol: String,
                     targetDocs: Long, sqrtApplications: Int = 1): DataFrame =
    temperatureMix(docs, sourceCol, textCol, targetDocs, sqrtApplications)
      .select(col("source"),
        least(lit(1000L), expr("(target_docs * 1000) DIV n_docs")).as("rate_permille"))

  private def admittedDocs(docs: DataFrame, idCol: String, sourceCol: String,
                           textCol: String, targetDocs: Long, epochs: Int,
                           sqrtApplications: Int): DataFrame = {
    require(epochs >= 1, "epochs >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = admissionRates(docs, sourceCol, textCol, targetDocs, sqrtApplications)
    val mults = epochMultipliers(epochs).toDF("epoch", "m")
    val h = pmod(pmod(col("doc_id"), lit(SampleHashP)) * col("m"), lit(SampleHashP))
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(sourceCol).as("source"),
        size(TextOps.words(col(textCol))).cast("long").as("n_toks"))
      .join(broadcast(rates), "source")
      .crossJoin(broadcast(mults))
      .filter(h % 1000 < col("rate_permille"))
  }

  /** SAMPLE-DRIFT audit — is the admitted sample REPRESENTATIVE?
    * Hash admission is length-blind by construction; this is the
    * audit that proves it (and catches any admission rule that
    * isn't): per source, the token-length histogram of epoch 1's
    * admitted set vs the full corpus, compared as an L1 distance over
    * integer-permille bucket shares (Σ|p_b − q_b|, 0 = identical
    * distributions, 2000 = disjoint). A biased sampler (e.g. one
    * keyed on a length-correlated field) shows immediately; the
    * Lehmer hash should sit near the binomial noise floor.
    *
    * Shape: two (source, bucket)-bounded aggregates over one corpus
    * scan each (the admitted side is the rate-filtered scan), a
    * sources×buckets-bounded full-outer join, and a sources-bounded
    * report. Nothing corpus-sized ever shuffles. */
  def sampleDrift(docs: DataFrame, idCol: String, sourceCol: String,
                  textCol: String, targetDocs: Long, bucketWords: Int = 16,
                  sqrtApplications: Int = 1): DataFrame = {
    val adm = admittedDocs(docs, idCol, sourceCol, textCol, targetDocs,
        epochs = 1, sqrtApplications)
      .select(col("source"), (col("n_toks") / bucketWords).cast("long").as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("c_s"))
    val corp = docs
      .select(col(sourceCol).as("source"),
        (size(TextOps.words(col(textCol))) / bucketWords).cast("long").as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("c_c"))
    // LEFT join + zero-share fallback: a source whose rate floors to
    // 0‰ admits nothing, and the audit must report it at maximal
    // drift (every sample share 0 → L1 = Σ corpus shares ≈ 1000),
    // not silently drop the row — the sampler being broken for a
    // source is exactly what this gate exists to surface
    val tot = corp.groupBy("source").agg(sum("c_c").as("n_corpus"))
      .join(adm.groupBy("source").agg(sum("c_s").as("n_sample")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_sample"))
    val sampleShare = when(col("n_sample") === 0L, lit(0L))
      .otherwise(expr("(1000 * coalesce(c_s, 0)) DIV n_sample"))
    corp.join(adm, Seq("source", "b"), "full_outer")
      .join(broadcast(tot), "source")
      .select(col("source"), col("n_corpus"), col("n_sample"),
        abs(expr("(1000 * coalesce(c_c, 0)) DIV n_corpus") - sampleShare)
          .as("d"))
      .groupBy("source")
      .agg(min("n_corpus").as("n_corpus"), min("n_sample").as("n_sample"),
        sum("d").as("l1_drift_permille"))
      .orderBy("source")
  }

  /** SPLIT-DRIFT audit (r11 verdict task 10 — the adversarial-audit
    * habit applied to the train/val/test split): is each split
    * REPRESENTATIVE of the corpus? A doc-id hash split is blind to
    * content by construction; this is the audit that proves it — and
    * catches any split rule that isn't (a split keyed on a
    * length-correlated field lights up `l1_len_permille`; one keyed
    * on — or leaking — language lights up `l1_lang_permille`). Per
    * split: the L1 distance between the split's and the corpus's
    * token-length-bucket shares, and between their language shares,
    * both as integer permille (0 = identical, 2000 = disjoint; an
    * honest hash split sits at the binomial noise floor, shrinking
    * with corpus size). Together with `pipeline_split_manifest` (the
    * sizes) and `dedup_split_leakage` (near-dup containment across
    * splits) this closes the split-audit triangle.
    *
    * Shape: ONE corpus scan into a (split × lang × bucket)-bounded
    * cell frame (persisted — every downstream branch is a
    * re-aggregation of those few hundred rows, never a re-scan); the
    * share grids are splits×buckets / splits×langs crossJoins of
    * broadcast-sized frames. All-integer DIV arithmetic — hash-exact
    * across engines. `split` is any deterministic assignment Column,
    * so the audit can gate a proposed split rule BEFORE it ships. */
  def splitDrift(docs: DataFrame, langCol: String, textCol: String,
                 split: Column, bucketWords: Int = 16): DataFrame = {
    val cells = docs
      .select(split.as("split"), col(langCol).as("lang"),
        (size(TextOps.words(col(textCol))) / bucketWords).cast("long").as("b"))
      .groupBy("split", "lang", "b").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val splitTot = cells.groupBy("split").agg(sum("c").as("n_split"))
    val nTot = cells.agg(sum("c").as("n_all"))
    def l1Over(dim: String, outCol: String): DataFrame = {
      val corp = cells.groupBy(dim).agg(sum("c").as("c_all"))
      val per = cells.groupBy("split", dim).agg(sum("c").as("c_s"))
      splitTot.crossJoin(corp)
        .join(per, Seq("split", dim), "left")
        .crossJoin(broadcast(nTot))
        .select(col("split"),
          abs(expr("(1000 * coalesce(c_s, 0)) DIV n_split") -
            expr("(1000 * c_all) DIV n_all")).as("d"))
        .groupBy("split").agg(sum("d").as(outCol))
    }
    splitTot
      .join(l1Over("b", "l1_len_permille"), "split")
      .join(l1Over("lang", "l1_lang_permille"), "split")
      .select(col("split"), col("n_split").as("n_docs"),
        col("l1_len_permille"), col("l1_lang_permille"))
      .orderBy("split")
  }

  /** CROSS-EPOCH overlap audit — the check that [[epochAdmission]]'s
    * salt actually decorrelates epochs: for every epoch pair a < b,
    * how many documents were admitted into BOTH, as a count and as
    * Jaccard permille of the two admitted sets. An unsalted sampler
    * scores 1000‰ on every pair (each epoch re-draws the same slice —
    * the memorization failure mode); an independent per-epoch draw at
    * rate r scores ≈ r/(2−r). Only the rate-bounded admitted stream
    * is joined (doc-keyed, pair output epochs²-bounded). */
  def epochOverlap(docs: DataFrame, idCol: String, sourceCol: String,
                   textCol: String, targetDocs: Long, epochs: Int,
                   sqrtApplications: Int = 1): DataFrame = {
    val adm = admittedDocs(docs, idCol, sourceCol, textCol, targetDocs,
      epochs, sqrtApplications).select("doc_id", "epoch")
    val sizes = adm.groupBy("epoch").agg(count(lit(1)).as("n"))
    val both = adm.as("a")
      .join(adm.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("a.epoch") < col("b.epoch"))
      .groupBy(col("a.epoch").as("epoch_a"), col("b.epoch").as("epoch_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes).withColumnRenamed("epoch", "epoch_a")
        .withColumnRenamed("n", "n_a"), "epoch_a")
      .join(broadcast(sizes).withColumnRenamed("epoch", "epoch_b")
        .withColumnRenamed("n", "n_b"), "epoch_b")
      .select(col("epoch_a"), col("epoch_b"), col("n_a"), col("n_b"),
        col("n_both"),
        expr("(1000 * n_both) DIV (n_a + n_b - n_both)").as("jaccard_permille"))
      .orderBy("epoch_a", "epoch_b")
  }

  /** WINNOW-SAMPLED repeated spans — the dense-regime companion to
    * [[repeatedSpans]] (r10 verdict task 5): the exact operator's
    * nominate exchange carries 8 bytes for EVERY gram position, which
    * on a repetition-dense corpus (18–30% of positions repeating in
    * the 100× rehearsal) is the whole cost. Here the position stream
    * is first winnow-SELECTED inside the compiled kernel
    * ([[graft.plans.GramKernel.computeWinnowedPos]] — zero shuffle
    * spent on sampling, ~2/(w+1) density), and the
    * nominate → dispatch → substring-verify → island cascade runs
    * over selected positions only.
    *
    * DETECTION GUARANTEE (spec-pinned): selection is value-min over
    * w-gram windows, a pure function of content, so every repeated
    * substring of length ≥ gramLen + window − 1 selects a
    * content-identical gram in each occurrence and is reported in
    * every occurrence's doc. Within a contiguous repeated region
    * every w consecutive grams select ≥ 1 position, so the island
    * gap widens to gramLen + window − 1 and a region stays one span;
    * extents are sampled (span endpoints snap to selected grams), so
    * counts/coverage are the sampled statistics, not the exact
    * operator's — both are deterministic pure functions of the corpus
    * and the oracle replays this exact cascade. */
  def repeatedSpansSampled(docs: DataFrame, idCol: String, textCol: String,
                           gramLen: Int = 25, window: Int = 8,
                           maxBroadcastNominees: Long = 8000000L): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val pos1 = winnowedPositions(d, gramLen, window)
    val nom = pos1.groupBy("fp").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNom = nom.count()
    sampledSpanCascade(d, nom, nNom, gramLen, window, maxBroadcastNominees)
  }

  /** Density = Σ{c>1} c / Σ c over a selected-fp counts frame, in
    * permille — the single arithmetic both [[repeatedSpansAuto]]'s
    * dispatch and the standalone probe below compute, so the spec's
    * boundary measurements and the dispatch cannot drift. */
  private def repeatDensityPermille(counts: DataFrame): Long = {
    val probe = counts.agg(sum("c").as("t"),
      sum(when(col("c") > 1, col("c")).otherwise(0L)).as("r")).first
    val total = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    val repeated = if (probe.isNullAt(1)) 0L else probe.getLong(1)
    if (total == 0L) 0L else 1000L * repeated / total
  }

  /** Standalone winnow-repeat density probe (r12 verdict task 9): the
    * exact number [[repeatedSpansAuto]] dispatches on, as a
    * measurable surface — the boundary spec measures a corpus with
    * this, then pins the dispatch's ≤/> semantics AT that measured
    * threshold. One fp-keyed count exchange, like the dispatch's own
    * pass 1. */
  private[graft] def winnowRepeatDensityPermille(docs: DataFrame, idCol: String,
      textCol: String, gramLen: Int = 25, window: Int = 8): Long = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    repeatDensityPermille(
      winnowedPositions(d, gramLen, window).groupBy("fp").agg(count(lit(1)).as("c")))
  }

  /** The winnow-selected (pos, fp) stream — [[repeatedSpansSampled]]'s
    * pass 1, also the density probe [[repeatedSpansAuto]] dispatches
    * on. Zero shuffle: selection happens inside the compiled kernel. */
  private def winnowedPositions(d: DataFrame, gramLen: Int, window: Int): DataFrame = {
    val packed = graft.plans.expressions.gram_winnowed_pos(col("text"), gramLen, window)
    d.select(col("doc_id"), explode(packed).as("pk"))
      .withColumn("pos", shiftright(col("pk"), 31).cast("int"))
      .withColumn("fp", col("pk").bitwiseAND(lit((1L << 31) - 1)))
      .drop("pk")
  }

  /** DENSITY-DISPATCHED repeated spans (r11 verdict task 2 — the
    * [[graft.operators.Dedup.embeddingCosineAuto]] idiom applied to
    * ExactSubstr): measure the corpus's position-repeat density on
    * the winnow-SELECTED gram stream (~2/(w+1) of the positions — one
    * fp-keyed count exchange, the sampled twin's own pass 1), then
    *  - density ≤ `denseThresholdPermille` (repetition-SPARSE, the
    *    real-pretraining-corpus regime): run [[repeatedSpans]] — the
    *    EXACT cascade; the probe's cost is the bounded ~2/(w+1)
    *    overhead on top of the full nominate it precedes;
    *  - density above it (repetition-DENSE — boilerplate floods,
    *    synthetic/closed-vocabulary corpora): the exact nominate's
    *    8 B/EVERY-position exchange is the whole cost (15× wall at
    *    the 100× rehearsal), so continue with the SAMPLED cascade,
    *    REUSING the already-persisted nominee frame — in the regime
    *    where cost matters, the probe is not overhead but pass 1.
    *
    * Density = Σ{c>1} c / Σ c over selected-fp counts, in permille —
    * selection is a pure content function, so repeated content
    * selects content-identical grams and the selected-stream density
    * tracks the all-position density (measured: driver fixtures
    * 93–120‰, 10× rehearsals 115–154‰, the dense 100× corpus 242‰ —
    * the default threshold 180 splits exactly there). Both branches
    * are deterministic pure functions of the corpus; the dispatch
    * law (exact below, sampled above, identical where the branches
    * agree by construction) is spec-pinned. */
  def repeatedSpansAuto(docs: DataFrame, idCol: String, textCol: String,
                        gramLen: Int = 25, window: Int = 8,
                        denseThresholdPermille: Long = 180L,
                        maxBroadcastNominees: Long = 8000000L): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val counts = winnowedPositions(d, gramLen, window)
      .groupBy("fp").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val densityPermille = repeatDensityPermille(counts)
    if (densityPermille <= denseThresholdPermille) {
      counts.unpersist()
      repeatedSpans(docs, idCol, textCol, gramLen, maxBroadcastNominees)
    } else {
      val nom = counts.filter(col("c") > 1).select("fp")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nNom = nom.count()
      counts.unpersist()
      sampledSpanCascade(d, nom, nNom, gramLen, window, maxBroadcastNominees)
    }
  }

  /** The sampled-span cascade below the nominate exchange — shared by
    * [[repeatedSpansSampled]] and [[repeatedSpansAuto]]'s dense
    * branch: nominee dispatch (broadcast vs shuffle), substring
    * verify, widened-gap islands, per-doc report. */
  private def sampledSpanCascade(d: DataFrame, nom: DataFrame, nNom: Long,
                                 gramLen: Int, window: Int,
                                 maxBroadcastNominees: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = graft.plans.expressions.gram_winnowed_pos(col("text"), gramLen, window)
    def unpack(df: DataFrame): DataFrame = df
      .select(col("*"), explode(col("_pk")).as("pk")).drop("_pk")
      .withColumn("pos", shiftright(col("pk"), 31).cast("int"))
      .withColumn("fp", col("pk").bitwiseAND(lit((1L << 31) - 1)))
      .drop("pk")
    val pos1 = winnowedPositions(d, gramLen, window)
    val cand =
      if (nNom <= maxBroadcastNominees)
        unpack(d.select(col("doc_id"), col("text"), packed.as("_pk")))
          .join(broadcast(nom), "fp")
          .select(col("doc_id"), col("pos"),
            expr(s"substr(text, pos + 1, $gramLen)").as("sub"))
      else
        pos1.join(nom, "fp").select("doc_id", "pos")
          .join(d, "doc_id")
          .select(col("doc_id"), col("pos"),
            expr(s"substr(text, pos + 1, $gramLen)").as("sub"))
    val ver = cand
      .withColumn("sc", count(lit(1)).over(Window.partitionBy("sub")))
      .filter(col("sc") > 1)
      .select(col("doc_id"), col("pos"))
    val gap = gramLen + window - 1
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val spans = ver
      .withColumn("nw", when(lag("pos", 1).over(wd).isNull ||
        col("pos") > lag("pos", 1).over(wd) + gap, 1L).otherwise(0L))
      .withColumn("island", sum("nw").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("st"),
        (max("pos") + gramLen).cast("long").as("en"),
        count(lit(1)).as("ng"))
    spans.groupBy("doc_id")
      .agg(sum("ng").as("n_rep_grams"), count(lit(1)).as("n_spans"),
        sum(col("en") - col("st")).as("covered_chars"),
        max(col("en") - col("st")).as("max_span_chars"))
      .orderBy("doc_id")
  }

  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                             maxDocShare: Double = 0.3): DataFrame = {
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_corpus"))
    val lines = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val df = lines.filter(col("line") =!= "")
      .select(col("doc_id"), col("line")).distinct()
      .groupBy("line").agg(count(lit(1)).as("line_docs"))
    val boiler = df.crossJoin(broadcast(nDocs))
      .filter(col("line_docs") > col("n_corpus") * maxDocShare)
      .select(col("line"), lit(1).as("_boiler"))
    lines.join(boiler, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_boiler").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(
            array_sort(collect_list(when(col("_boiler").isNull,
              struct(col("pos"), col("line"))))),
            x => x("line")), "\n").as("clean"))
      .select(col("doc_id"), col("n_lines"), col("n_removed"), col("clean"))
  }
}
