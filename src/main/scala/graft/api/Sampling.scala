package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library API for dataset sampling and mixture design — the two
  * selection steps of a training-data pipeline: draw a deterministic,
  * reproducible subset per stratum, and compute per-source sampling
  * weights for a target data mixture.
  *
  * Everything is hash- or count-based (no RNG state), so results are
  * identical across engines, re-runs, and cluster sizes.
  */
object Sampling {

  /** Exactly `k` rows per stratum, chosen by md5-hash order of the id —
    * a deterministic stratified sample (same rows every run, any
    * cluster). Returns the input columns plus `sample_rank` (1..k within
    * the stratum).
    *
    * Scale shape: one ranked window per stratum with a `row_number <= k`
    * gate, so Spark's WindowGroupLimit prunes each partition to k rows
    * BEFORE the window shuffle — the full stratum never moves. Skewed
    * strata cost a scan, not a shuffle.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    // filter on the RAW row_number, cast after: InferWindowGroupLimit
    // pattern-matches a rank-like filter directly over the window and a
    // cast in between defeats it (the q88 lesson; PlanSpec locks q93)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .withColumn("sample_rank", col("__rn").cast("long")).drop("__rn")
  }

  /** Per-group quota cap by score: keep the `k` BEST rows of every
    * group (score descending, ties to the lowest id) — the source/domain
    * balancing step of a curation pipeline ("no domain contributes more
    * than k documents, and what it does contribute is its best"). The
    * score-ranked sibling of [[stratifiedSample]] (hash-ranked): same
    * rank-1..k window gate, so InferWindowGroupLimit prunes every
    * partition to k rows BEFORE the per-group shuffle — a skewed
    * mega-domain costs its scan, never a full sort. Returns the input
    * rows plus `quota_rank` (1 = best kept).
    */
  def scoreQuotaCap(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    // raw row_number in the filter: a cast in between defeats
    // InferWindowGroupLimit (the q88 lesson; PlanSpec locks q93/q145)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .withColumn("quota_rank", col("__rn").cast("long")).drop("__rn")
  }

  /** Normalized temperature weights per group (one row per group,
    * unrounded): n_g, w_raw = n_g^alpha, w_norm = w_raw / Σ w_raw,
    * n_total — the SHARED formula behind [[mixtureWeights]] and
    * [[mixtureSample]] (one copy, so the draw realizes exactly the
    * weights the report shows). alpha = 0.5 routes through sqrt
    * (correctly rounded by IEEE 754, unlike pow(x, 0.5) which carries a
    * 1-ulp allowance) so DuckDB twins compute bit-identical weights.
    */
  /** Weight-proportional `k`-sample WITHOUT replacement per group —
    * Efraimidis–Spirakis exponential races (Inf. Proc. Lett. 97(5),
    * 2006): each row draws `priority = −ln(u) / w` (an Exp(w) variate —
    * the race a row with twice the weight wins twice as often), and the
    * k SMALLEST priorities per group are the sample. `u` is the
    * deterministic Knuth multiplicative-hash uniform shifted to the
    * half-integer grid `(m + 0.5) / 2³²` — never exactly 0 or 1, so the
    * log is always finite, and the draw is reproducible on any engine,
    * cluster, or re-run with no RNG state. Rows with a non-positive or
    * null weight are dropped (they have no race rate).
    *
    * Returns the input columns plus (u, priority, sample_rank), rank
    * 1..k by ascending priority. Scale shape: identical to
    * [[stratifiedSample]] — one ranked window per group whose
    * `row_number <= k` gate lets WindowGroupLimit cap every partition at
    * k rows before the shuffle; the corpus never moves wholesale.
    */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val x = pmod(col(idCol).cast("long"), lit(4294967296L))
    val lo = pmod(x, lit(65536L))
    val hi = ((x - lo) / lit(65536L)).cast("long") // exact: x - lo is a multiple of 2^16
    val u = (pmod(pmod(hi * 2654435761L, lit(65536L)) * 65536L + lo * 2654435761L,
      lit(4294967296L)).cast("double") + 0.5) / 4294967296.0
    val w = Window.partitionBy(col(groupCol)).orderBy(col("priority"), col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("u", u)
      .withColumn("priority", (lit(0.0) - log(col("u"))) / col(weightCol).cast("double"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  private def normWeights(df: DataFrame, groupCol: String,
      alpha: Double): DataFrame = {
    val wAll = Window.orderBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRaw =
      if (alpha == 0.5) sqrt(col("n_g").cast("double"))
      else pow(col("n_g").cast("double"), alpha)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"))
      .withColumn("w_raw", wRaw)
      .withColumn("w_norm", col("w_raw") / sum(col("w_raw")).over(wAll))
      .withColumn("n_total", sum(col("n_g")).over(wAll))
  }

  /** Overflow-free Knuth multiplicative-hash uniform in [0, 1):
    * `u = (id · 2654435761) mod 2³² / 2³²`, computed via 16-bit split
    * mulmod — `(x·K) mod 2³² = ((x_hi·K mod 2¹⁶)·2¹⁶ + x_lo·K) mod 2³²`
    * with every intermediate ≤ ~1.7e14 — so ids up to Long.MaxValue
    * never overflow Spark's ANSI multiply (a naive `id · K` dies at
    * id ≈ 3.5e9, squarely inside the 100 TB design range), and pmod
    * keeps negative ids in [0, 1) too. Pure integer arithmetic: the
    * same rows are drawn on every engine.
    */
  private def knuthU(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val x = pmod(id.cast("long"), lit(4294967296L))
    val lo = pmod(x, lit(65536L))
    val hi = ((x - lo) / lit(65536L)).cast("long") // exact: x - lo is a multiple of 2^16
    (pmod(pmod(hi * 2654435761L, lit(65536L)) * 65536L + lo * 2654435761L,
      lit(4294967296L)).cast("double") / 4294967296.0).as("u")
  }

  /** Mixture-weighted deterministic subsample — the draw that REALIZES
    * [[mixtureWeights]]: keep each row of group g with probability
    * `p_g = min(1, targetFraction · N · w_g / n_g)` (so the kept corpus
    * is ≈ targetFraction of the input, distributed across groups by the
    * temperature weights — small high-quality sources keep more of
    * themselves), decided by a DETERMINISTIC per-row uniform
    * `u(id) = (id · 2654435761) mod 2³² / 2³²` (Knuth multiplicative
    * hash: exact integer arithmetic, so the same rows are kept on every
    * engine, cluster, and re-run). Returns the input columns plus
    * (keep_prob, u). Use `alpha = 0.5`: sqrt is correctly rounded under
    * IEEE 754, making `p_g` bit-identical across engines (general pow
    * may differ in the last ulp, which could flip a row whose u lands
    * within 1e-16 of the threshold).
    *
    * Scale shape: one tiny group-count agg (one row per source,
    * broadcast back), then a narrow per-row filter — no shuffle of the
    * corpus at all.
    */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, targetFraction: Double): DataFrame =
    mixtureSampleScored(df, groupCol, idCol, alpha, targetFraction)
      .filter(col("u") < col("keep_prob"))

  /** The unfiltered twin of [[mixtureSample]]: EVERY row with its
    * (keep_prob, u) — the frame a delivery audit needs, because the
    * realized-vs-design comparison must see the rows the sampler
    * dropped. Same plan shape (broadcast prob row per source, narrow
    * per-row hash).
    */
  def mixtureSampleScored(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, targetFraction: Double): DataFrame = {
    val probs = normWeights(df, groupCol, alpha)
      .select(col(groupCol),
        least(lit(1.0),
          lit(targetFraction) * col("n_total") * col("w_norm") / col("n_g"))
          .as("keep_prob"))
    df.join(broadcast(probs), groupCol)
      .withColumn("u", knuthU(col(idCol)))
  }

  /** Deterministic training-order shuffle for one epoch: every row gets
    * a `shard` (id mod `shards` — stable across epochs, so shard-level
    * file layout persists) and a `pos` within its shard drawn from
    * md5(epoch ":" id) — a different, fully reproducible permutation
    * per epoch with no RNG state (same order on any engine, cluster
    * size, or re-run; changing `epoch` reshuffles every shard).
    *
    * Scale shape: no global sort anywhere — each shard's permutation is
    * an independent window partition, so `shards` bounds the per-task
    * sort at corpus/shards rows and shards proceed in parallel (pick
    * shards ≥ cluster parallelism; writers then emit one training file
    * per shard, which is exactly how epoch data loaders consume it).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(concat_ws(":", lit(epoch), col(idCol).cast("string"))), col(idCol))
    df.withColumn("shard", pmod(col(idCol).cast("long"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Temperature-based mixture weights per group (the multinomial
    * sampling distribution over sources used to up-weight small
    * high-quality sources): `weight(g) = n_g^alpha / Σ n^alpha`, with
    * `alpha = 1` proportional sampling and `alpha → 0` uniform.
    * Returns (groupCol, n_docs, weight, expected_draws) where
    * `expected_draws = weight · totalDraws`.
    *
    * The group-count frame is one row per source — trivially small at
    * any corpus scale — so the normalizing sum runs in a single ordered
    * window partition (deterministic left-to-right summation on both
    * engines); weights are rounded to 6 decimals (pow may differ in the
    * last ulp across libm implementations). NOTE: because each `weight`
    * is rounded independently, the displayed weights need not sum to
    * exactly 1 — `expected_draws` is therefore computed from the
    * UNROUNDED weight (rounded only at the end), so draw budgets don't
    * accumulate per-group rounding error; callers needing the per-group
    * integers to sum exactly to `totalDraws` should apportion the
    * (tiny) remainder themselves, e.g. largest-remainder over this
    * output.
    */
  def mixtureWeights(df: DataFrame, groupCol: String, alpha: Double,
      totalDraws: Long): DataFrame =
    normWeights(df, groupCol, alpha)
      .select(col(groupCol), col("n_g").as("n_docs"),
        round(col("w_norm"), 6).as("weight"),
        round(col("w_norm") * totalDraws, 2).as("expected_draws"))

  /** Bucket count of the DSIR feature hash: 3 hex chars of md5 = 4096
    * buckets, identical in any engine with md5 — no murmur-seed drift.
    */
  val DsirBuckets = 4096

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its hashed n-gram features are under the
    * TARGET distribution (rows where `targetFlag` is true) than under
    * the RAW distribution (all rows). Features are unigram + adjacent-
    * bigram occurrences hashed into [[DsirBuckets]] buckets; both
    * distributions get add-one smoothing over the full bucket space.
    *
    * Returns (idCol, n_feats, w_micros): w_micros is the log-likelihood
    * ratio × 10⁶ held as an INTEGER — each bucket's log-ratio is
    * floored onto the micro grid once (≤ 4096 distinct `ln` calls, so
    * cross-engine libm 1-ulp drift has no sum to accumulate in) and
    * per-doc totals are exact integer sums, order-independent and
    * hash-stable. Resampling = any deterministic top-k / threshold cut
    * over w_micros downstream.
    *
    * Scale shape: feature explode is narrow; the bucket histogram is a
    * 4096-key hash aggregate (map-side partials absorb stopword-bucket
    * skew); the per-doc × bucket aggregate shuffles once on doc id; the
    * 4096-row log-ratio table broadcasts into the scoring join. Nothing
    * wide ever carries text.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetFlag: Column): DataFrame = {
    // Self-scoring runs train and score over the SAME corpus: fuse them on
    // one checkpointed (doc, bucket, n) frame so the text tokenizes and
    // hashes once, not once per phase. The bucket histogram is the same
    // sum either way (r_b = Σ per-doc n), so results are bit-identical to
    // dsirScoreAgainst(docs, dsirBucketTable(docs)).
    val id = col(idCol)
    val perDoc = dsirFeatures(docs.withColumn("is_target", targetFlag),
        textCol, Seq(idCol, "is_target"))
      .groupBy(id, col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val buckets = perDoc.groupBy(col("bucket")).agg(
      sum(col("n")).as("r_b"),
      sum(when(col("is_target"), col("n")).otherwise(0L)).as("t_b"))
    val tot = buckets.agg(sum(col("r_b")).as("r_tot"), sum(col("t_b")).as("t_tot"))
    val B = lit(DsirBuckets.toDouble)
    val table = buckets.crossJoin(tot).select(col("bucket"),
      floor(log(((col("t_b") + lit(1.0)) * (col("r_tot") + B)) /
          ((col("r_b") + lit(1.0)) * (col("t_tot") + B))) * lit(1000000.0))
        .cast("long").as("lr_micros"))
    perDoc
      .join(broadcast(table), Seq("bucket"), "left")
      .groupBy(id)
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * coalesce(col("lr_micros"), lit(0L))).as("w_micros"))
  }

  /** The hashed unigram+bigram feature-occurrence frame behind DSIR:
    * one row per feature occurrence with its 3-hex-char md5 bucket,
    * carrying the named pass-through columns.
    */
  private def dsirFeatures(docs: DataFrame, textCol: String,
      passthrough: Seq[String]): DataFrame = {
    val d = docs.select(passthrough.map(col) :+ split(col(textCol), " ").as("toks"): _*)
    d.select(passthrough.map(col) :+ explode(concat(
        filter(col("toks"), t => t =!= ""),
        when(size(col("toks")) >= 2,
            expr("transform(sequence(1, size(toks) - 1), " +
              "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .otherwise(expr("array()")))).as("feat"): _*)
      .withColumn("bucket", substring(md5(col("feat")), 1, 3))
  }

  /** Train the DSIR bucket table from a reference corpus: one row per
    * occupied feature bucket with its add-one-smoothed log-likelihood
    * ratio in integer micro-nats (≤ [[DsirBuckets]] rows — broadcast
    * size by construction). Train once on the reference corpus, then
    * score any frame — or any micro-batch stream — against it with
    * [[dsirScoreAgainst]].
    */
  def dsirBucketTable(docs: DataFrame, textCol: String,
      targetFlag: Column): DataFrame = {
    val feats = dsirFeatures(docs.withColumn("is_target", targetFlag),
      textCol, Seq("is_target"))
    val buckets = feats.groupBy(col("bucket")).agg(
      count(lit(1)).as("r_b"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t_b"))
    val tot = buckets.agg(sum(col("r_b")).as("r_tot"), sum(col("t_b")).as("t_tot"))
    val B = lit(DsirBuckets.toDouble)
    buckets.crossJoin(tot).select(col("bucket"),
      floor(log(((col("t_b") + lit(1.0)) * (col("r_tot") + B)) /
          ((col("r_b") + lit(1.0)) * (col("t_tot") + B))) * lit(1000000.0))
        .cast("long").as("lr_micros"))
  }

  /** Score documents against a trained [[dsirBucketTable]]: exact
    * integer per-doc sums of bucket log-ratios (features hashing to
    * buckets ABSENT from the table contribute 0 — the neutral prior
    * for mass unseen at training time). The table broadcasts; only
    * (doc, bucket) counts shuffle.
    */
  def dsirScoreAgainst(docs: DataFrame, idCol: String, textCol: String,
      bucketTable: DataFrame): DataFrame = {
    val id = col(idCol)
    dsirFeatures(docs, textCol, Seq(idCol))
      .groupBy(id, col("bucket")).agg(count(lit(1)).as("n"))
      .join(broadcast(bucketTable), Seq("bucket"), "left")
      .groupBy(id)
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * coalesce(col("lr_micros"), lit(0L))).as("w_micros"))
  }
}
