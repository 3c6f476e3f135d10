package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection operators for assembling a training mix out of a
  * scored corpus: perplexity-style bucketing (CCNet's head/middle/tail
  * split), token-budget-capped selection, and per-source mixture
  * planning (how many epochs of each source hit a target blend).
  *
  * All three stay in the exact-integer / exact-ratio domain wherever a
  * value crosses an aggregation (token counts sum as longs; the only
  * doubles are single divisions of integers or already-hash-gated
  * quality ratios), so results are partition-order-independent and
  * replay bit-for-bit in an external engine.
  */
object SelectionOps {

  /** Deterministic demo weights for [[linearQualityScore]]: a fixed
    * Knuth-multiplicative spread into [-1001, 1001], the same literal
    * vector on the Spark side and in the DuckDB oracle (the
    * htmlPatterns shared-constant discipline).  Real deployments swap
    * in trained weights; the SHAPE of the op is what scales.
    */
  def demoWeights(d: Int): Array[Int] =
    Array.tabulate(d)(i => ((i * 2654435761L) % 2003L - 1001L).toInt)

  /** Fasttext-style hashed-bag-of-tokens linear classifier — THE
    * standard learned quality filter for pre-training corpora (GPT-3 /
    * LLaMA / FineWeb-Edu all gate on one): each token hashes into one
    * of `weights.length` buckets, the document's score is the sum of
    * its tokens' bucket weights plus `bias`, and the keep decision
    * thresholds the score.
    *
    * Engineered for the engine's determinism bar: weights are INTEGER,
    * the token hash is the portable md5-60-bit bucket
    * ([[DedupOps.md5Hash60]] — same bytes in any engine), and the
    * score is an integer left-fold, so `score`/`keep` are bit-exact
    * everywhere and only the reporting `prob` (one logistic of an
    * exact integer) is float at all.  A pure per-row projection: the
    * weight vector ships as a literal array into the plan (a few KiB —
    * the broadcast-free analog of a tiny dim join), nothing shuffles,
    * and the whole expression stays in whole-stage codegen except the
    * HOF fold itself.  At 100 TB this is scan-bound, exactly like the
    * rule-based [[TextOps]] quality score it complements.
    */
  def linearQualityScore(
      df: DataFrame, idCol: String, textCol: String,
      weights: Array[Int], bias: Long = 0L,
      scale: Double = 1000.0): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val d = weights.length
    val wLit = array(weights.map(w => lit(w.toLong)): _*)
    val toks = TextOps.tokens(col(textCol))
    val score = aggregate(
      transform(toks, tk => element_at(wLit,
        // element_at is 1-based; md5Hash60 is non-negative so pmod = %
        pmod(DedupOps.md5Hash60(tk), lit(d.toLong)).cast("int") + lit(1))),
      lit(bias), (acc, x) => acc + x)
    // divide-then-negate-then-exp, in exactly that order — the oracle
    // replays the same IEEE sequence (negation is exact, so the one
    // rounding point is the division)
    df.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      score.as("score"),
      (lit(1.0) / (lit(1.0) +
        exp(-(score.cast("double") / lit(scale))))).as("prob"),
      (score >= 0L).cast("long").as("keep"))
  }

  /** CCNet-style per-language corpus split (Wenzek et al. 2020,
    * arXiv:1911.00359): rank each document within its language by a
    * model score and cut the ranking into `nBuckets` equal parts —
    * bucket 1 = "head" (most in-distribution), last = "tail".  The
    * score here is [[TextOps.tokenRarityStats]]' `avg_token_freq`
    * (mean corpus frequency of the document's tokens — integer-exact,
    * so cross-engine ties are impossible to mis-order): high mean
    * frequency = common language = the low-perplexity head, directly
    * analogous to CCNet's LM-perplexity ranking without a float score
    * that could diverge between engines.  Ties break on `id` so the
    * ntile assignment is a pure function of the data.
    *
    * Scale shape: one token-keyed hash agg (the rarity stats) plus ONE
    * window partitioned by language.  The window sorts each language
    * once — the exact-ntile cost.  The oracle path keeps exact ntile.
    *
    * `approxCutpoints = true` is the EXTREME-skew escape hatch, not a
    * throughput win (SCALE.md §Selection, measured r14): instead of
    * sorting each language, ONE mergeable `percentile_approx` sketch
    * aggregation derives nBuckets−1 score cut-points per language,
    * broadcast back as a tiny O(languages × nBuckets) table; the
    * bucket is then a shuffle-free per-row comparison against the
    * cuts.  The sketch path traverses the per-doc frame twice (hence
    * the persist below), which costs MORE than the exact path's
    * single per-language sort until one language's per-doc rows
    * exceed a task's sort capacity (~10⁸ rows) — keep the default
    * exact path unless the hot language is at that scale.  Semantics degrade ONLY at
    * the cut edges: ntile splits equal scores by rank (equal-count
    * buckets), the cut-point form assigns every tied score to one
    * bucket (equal-range buckets), so bucket populations can deviate
    * by the tie mass around each cut plus the sketch's rank error
    * (`approxAccuracy`, percentile_approx's 1/accuracy rank bound).
    * Head/middle/tail membership — the downstream decision — agrees
    * except inside those edge bands (OpsSpec measures the agreement).
    */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String, langCol: String,
      nBuckets: Int = 3, approxCutpoints: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, s"perplexityBuckets: nBuckets=$nBuckets must be >= 2")
    val rarity = TextOps.tokenRarityStats(df, idCol, textCol)
      .select(col("doc_id"), col("n_tokens"), col("avg_token_freq"))
    val langs = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
    val joined = rarity.join(langs, "doc_id")
    val bucketed = if (!approxCutpoints) {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("avg_token_freq").desc, col("doc_id"))
      joined.withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
    } else {
      // ascending interior quantiles q_1 ≤ … ≤ q_{nBuckets-1}; bucket 1
      // (head) = highest scores, so bucket = n − #{cuts the score
      // clears}: ≥ every cut → 1, below every cut → n, monotone in
      // between.  The agg is one sketch pass; the join is a broadcast.
      // The per-doc score frame is referenced TWICE (sketch agg + the
      // join back) — persisted so the token-keyed rarity aggregation
      // runs once, not per reference (the selectionPipeline stage
      // discipline; the cache is the REDUCED ~per-doc frame, far
      // smaller than the corpus, released via unpersistAll).  The
      // first sf10 A/B caught the unpersisted form re-deriving the
      // rarity pass and losing to the exact window it replaces.
      val j = DedupOps.registerPersist(joined)
      val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
      val cuts = j.groupBy(col("lang")).agg(
        percentile_approx(col("avg_token_freq"),
          array(probs.map(lit): _*), lit(approxAccuracy)).as("__cuts"))
        .withColumnRenamed("lang", "__cut_lang")
      // null-safe join: groupBy keeps a null-lang group and the exact
      // ntile path windows it like any other language, so a plain
      // equi-join (null never equals null) would silently drop those
      // docs from the approx path only — a survivor-set divergence
      // beyond the documented cut-edge blur.
      j.join(broadcast(cuts), col("lang") <=> col("__cut_lang"))
        .withColumn("bucket",
          (lit(nBuckets) - size(filter(col("__cuts"),
            c => col("avg_token_freq").cast("double") >= c))).cast("long"))
        .drop("__cuts", "__cut_lang")
    }
    bucketed
      .withColumn("band",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === nBuckets, "tail")
          .otherwise("middle"))
      .select("doc_id", "lang", "n_tokens", "avg_token_freq", "bucket", "band")
  }

  /** Token-budget-capped selection: within each `partCol` group, rank
    * documents by `scoreCol` (descending, ties on `idCol`) and keep a
    * document iff it STARTS inside the group's token budget — the
    * running token sum of all better-ranked documents is `< budget`.
    * The greedy prefix rule every "take the best N tokens per
    * language" data-selection recipe uses; the last kept document may
    * overrun the budget (standard — a document is atomic).
    *
    * `cum_tokens` (running total INCLUDING the row) rides along so the
    * caller can see the realized budget.  All running sums are integer.
    *
    * Scale shape: ONE window per group — same exact-sort cost and the
    * same approximate escape hatch as [[perplexityBuckets]]: at
    * extreme scale, pre-bucket by a coarse score quantile, take whole
    * buckets while they fit, and sort only the boundary bucket.
    */
  def budgetSelect(
      df: DataFrame, idCol: String, partCol: String, scoreCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budgetSelect: budget=$budget must be positive")
    val w = Window.partitionBy(col("part"))
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"), col(partCol).as("part"),
        col(scoreCol).as("score"), col(tokenCol).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("id", "part", "score", "n_tokens", "cum_tokens")
  }

  /** Per-source mixture plan: given target sampling proportions and a
    * total token budget, compute how many epochs (repeat factor) of
    * each source realize the blend — the DoReMi/Pile-style "domain
    * weights → concrete epochs" step.  `epochs` is
    * `min(needed / available, maxEpochs)`: one double division of two
    * exact integers, then a min — bit-replayable.  Sources missing
    * from `targets` get share 0 (excluded); shares need not sum to 1
    * (they are normalized by the caller's convention, passed through
    * verbatim as `target_share`).
    *
    * Scale shape: a per-source integer agg (hash agg, no sort) plus a
    * broadcast of the tiny plan table.  Nothing here grows with corpus
    * size except the one aggregation.
    */
  def mixturePlan(
      df: DataFrame, sourceCol: String, tokenCol: String,
      targets: Map[String, Double], totalBudget: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(totalBudget > 0, s"mixturePlan: totalBudget=$totalBudget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = targets.toSeq.toDF("source", "target_share")
    df.select(col(sourceCol).as("source"), col(tokenCol).cast("long").as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .join(broadcast(shares), Seq("source"), "inner")
      .withColumn("needed_tokens",
        round(col("target_share") * totalBudget).cast("long"))
      // a zero-token source can realize no tokens at any repeat count:
      // 0 epochs, not a division blow-up (ANSI throws) or a cap
      .withColumn("epochs",
        when(col("n_tokens") > 0,
          least(col("needed_tokens").cast("double") / col("n_tokens"),
            lit(maxEpochs)))
          .otherwise(lit(0.0)))
      .select("source", "n_docs", "n_tokens", "target_share",
        "needed_tokens", "epochs")
  }

  /** Materialize a [[mixturePlan]]: emit each document
    * `floor(epochs)` times, plus ONE extra copy for the deterministic
    * hash-fraction of ids that realizes the fractional epoch — so the
    * expected per-source token volume is `epochs × n_tokens` while
    * every copy decision is a pure function of (id, salt), exactly
    * like [[SampleOps.hashSplit]] membership.  Output is one row per
    * (id, copy) with `copy ∈ [0, n_copies)`: the repeat-expanded
    * corpus a shuffler/packer consumes downstream.
    *
    * Scale shape: a broadcast join of the (tiny) plan + a pure
    * projection with a bounded `sequence` fan-out (≤ ⌈maxEpochs⌉ rows
    * per doc) — no shuffle, no skew surface.  Rows whose source has
    * `n_copies = 0` are filtered BEFORE the sequence (Spark's
    * `sequence(0, -1)` would run descending, not empty).
    */
  /** The composed data-selection pipeline, end to end: quality gate →
    * perplexity buckets on the survivors (keep head+middle) →
    * per-language token-budget selection → mixture plan over the
    * selected docs → fractional-epoch materialization → GPT-style
    * sequence packing of the copies → per-sequence manifest.  Every
    * stage is individually oracled; this composition gates the GLUE
    * (stage ordering, column plumbing, id synthesis for copies) the
    * same way — deterministic by construction, so the whole chain
    * replays as one DuckDB CTE pipeline (q_selection_e2e).
    *
    * Copies get the synthetic id `id · 8 + copy` (epochs are capped
    * ≤ 4, so copy < 8 and the mapping is injective) — the packing
    * order interleaves copies right after their document, which keeps
    * the layout a pure function of the inputs.
    */
  def selectionPipeline(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      sourceCol: String, budgetPerLang: Long,
      targets: Map[String, Double], totalBudget: Long,
      seqLen: Long, salt: String,
      approxBuckets: Boolean = false): DataFrame =
    selectionPipelineCore(docs, idCol, textCol, langCol, sourceCol,
      budgetPerLang, targets, totalBudget, seqLen, salt,
      (_, df) => DedupOps.registerPersist(df), approxBuckets)

  private def selectionPipelineCore(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      sourceCol: String, budgetPerLang: Long,
      targets: Map[String, Double], totalBudget: Long,
      seqLen: Long, salt: String,
      boundary: (String, DataFrame) => DataFrame,
      approxBuckets: Boolean = false): DataFrame = {
    // each stage frame is referenced 2-3× downstream (buckets + the
    // survivor join; selection + the picked join; plan + copies + the
    // token re-join) — without a persist the LAZY plan re-derives the
    // whole upstream per reference, which the r12 staged-timing run
    // measured as a 2.3× wall-time tax at sf10 (45.5 s → 20 s).  The
    // default boundary is therefore registerPersist (released by the
    // standard unpersistAll); the timed flavor's boundary adds
    // count+clock on top.
    val scored = boundary("quality_gate", TextOps.qualityMetrics(docs, textCol)
      .filter(col("quality_score") >= 0.5)
      .select(col(idCol), col(langCol), col(sourceCol), col(textCol),
        col("quality_score"),
        TextOps.bpeTokenEstimate(col(textCol)).as("tok")))
    val buckets = perplexityBuckets(scored, idCol, textCol, langCol,
        approxCutpoints = approxBuckets)
      .filter(col("bucket") <= 2)
      .select(col("doc_id").as("__bucket_id"))
    val surviving = boundary("perplexity_buckets", scored.join(buckets,
      col(idCol) === col("__bucket_id")).drop("__bucket_id"))
    val selected = budgetSelect(
        surviving, idCol, langCol, "quality_score", "tok", budgetPerLang)
      .select(col("id").as("__sel_id"))
    val picked = boundary("budget_select", surviving.join(selected,
      col(idCol) === col("__sel_id")).drop("__sel_id"))
    val plan = mixturePlan(picked, sourceCol, "tok", targets, totalBudget)
    val copies = boundary("mixture",
      materializeMixture(picked, idCol, sourceCol, plan, salt))
    val withTok = copies
      .join(picked.select(col(idCol).as("id"), col("tok")), "id")
      .select((col("id") * 8 + col("copy")).as("cid"), col("tok"))
    PackingOps.shardManifest(
      PackingOps.packSequences(withTok, "cid", "tok", seqLen), "cid")
  }

  /** [[selectionPipeline]] with per-stage timing attribution: each
    * stage boundary is persisted and counted, so the count's elapsed
    * time is that stage's INCREMENTAL cost (its inputs are already
    * cached) — the PipelineDemo discipline, for the number a user
    * quotes (e2e wall-time) to be attributable by stage at sf10.
    * Returns (final frame, stage → seconds incl. the terminal
    * `seq_pack_manifest` materialization).  The final frame is
    * collected-from as usual; intermediate caches are released before
    * returning.  Same result as the plain form (PipelineSpec pins it)
    * — the boundaries only change WHERE materialization happens.
    */
  def selectionPipelineTimed(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      sourceCol: String, budgetPerLang: Long,
      targets: Map[String, Double], totalBudget: Long,
      seqLen: Long, salt: String,
      approxBuckets: Boolean = false): (DataFrame, Seq[(String, Double)]) = {
    val secs = Seq.newBuilder[(String, Double)]
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    // inclusive stage clock (the PipelineDemo convention): each stage
    // owns everything since the previous boundary, so construction-
    // time work (mixture-plan collects, packSequences' offset pass)
    // is attributed and the map sums to ≈ the e2e wall time
    var mark = System.nanoTime()
    def stamp(name: String): Unit = {
      val now = System.nanoTime()
      secs += name -> (now - mark) / 1e9
      mark = now
    }
    def boundary(name: String, df: DataFrame): DataFrame = {
      val p = df.persist()
      cached += p
      p.count()
      stamp(name)
      p
    }
    try {
      val out = selectionPipelineCore(docs, idCol, textCol, langCol,
        sourceCol, budgetPerLang, targets, totalBudget, seqLen, salt,
        boundary, approxBuckets)
        .persist() // caller-released, like PipelineDemo's `out`
      out.count()
      stamp("seq_pack_manifest")
      (out, secs.result())
    } finally {
      cached.foreach(_.unpersist())
    }
  }

  def materializeMixture(
      df: DataFrame, idCol: String, sourceCol: String,
      plan: DataFrame, salt: String): DataFrame = {
    val joined = df
      .select(col(idCol).as("id"), col(sourceCol).as("source"))
      .join(broadcast(plan.select(col("source"), col("epochs"))), "source")
    val nFull = floor(col("epochs")).cast("long")
    val frac = col("epochs") - floor(col("epochs"))
    val extra = when(
      SampleOps.hashBucket(col("id"), salt) <
        frac * SampleOps.DefaultBuckets, 1L).otherwise(0L)
    joined
      .withColumn("n_copies", nFull + extra)
      .filter(col("n_copies") > 0)
      .select(col("id"), col("source"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"))
  }

  /** DSIR-style importance weights over hashed n-gram features — the
    * data-selection move of Xie et al. 2023 ("Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much its feature distribution looks like a small
    * TARGET domain (here `targetFilter`, e.g. the high-quality or
    * in-domain slice), then resample the raw corpus proportionally.
    *
    * Features are word bigrams hashed into `nBuckets` buckets
    * ([[DedupOps.md5Hash60]] — the portable hash).  Where the paper
    * scores `Σ log p_target(b)/p_raw(b)`, this implementation scores
    * the frequency-MASS ratio
    * `w = (Σ_g tf·ct_b + 1) / (Σ_g tf·cr_b + 1)` (ct/cr = bucket
    * counts in target/raw): every sum is an exact integer, the single
    * division happens once per document, and the score is therefore
    * bit-identical across engines and partitionings — the engine's
    * determinism bar, which a float log-sum cannot meet (its value
    * depends on addition order).  Both are monotone in "target-like
    * grams per raw-common gram"; the log-sum's per-feature weighting
    * differs, so this is a surrogate, documented as such.
    *
    * Scale shape: ONE explode+groupBy over (doc, bucket) — the same
    * shuffle tf-idf pays; the bucket frequency table is ≤ `nBuckets`
    * rows, broadcast into the final join; target membership rides
    * along as a 0/1 flag so the target pass costs no second scan.
    */
  def dsirWeights(
      df: DataFrame, idCol: String, textCol: String,
      targetFilter: org.apache.spark.sql.Column,
      nBuckets: Int = 1024): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val grams = df.select(col(idCol).as("doc_id"),
        targetFilter.cast("long").as("is_target"), toks.as("__toks"))
      .select(col("doc_id"), col("is_target"),
        explode(TextOps.wordNgramsOf(col("__toks"), 2)).as("gram"))
      .select(col("doc_id"), col("is_target"),
        (DedupOps.md5Hash60(col("gram")) % nBuckets).as("bucket"))
    // persisted: BOTH the bucket-frequency aggregate and the final
    // join consume this frame — without the pin the plan re-tokenizes
    // and re-explodes the whole corpus for the frequency side (the
    // explain showed two full document scans); released by
    // DedupOps.unpersistAll with the rest of the family
    val perDocBucket = DedupOps.registerPersist(grams
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count("*").as("tf")))
    // bucket frequency table: total occurrences in target vs raw (raw
    // includes the target slice, as in the paper's raw distribution)
    val bucketFreq = perDocBucket
      .groupBy("bucket")
      .agg(sum(col("tf") * col("is_target")).as("ct"), sum("tf").as("cr"))
    perDocBucket
      .join(broadcast(bucketFreq), "bucket")
      .groupBy("doc_id", "is_target")
      .agg(sum("tf").cast("long").as("n_grams"),
        sum(col("tf") * col("ct")).cast("long").as("sum_t"),
        sum(col("tf") * col("cr")).cast("long").as("sum_r"))
      .withColumn("w",
        (col("sum_t").cast("double") + 1.0) / (col("sum_r").cast("double") + 1.0))
  }
}
