package graft.operators

import graft.Util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle bindings for the [[graft.api.Sampling]] and PII surface — the
  * dataset-selection steps of a training-data pipeline (deterministic
  * stratified sampling, mixture-weight design + weighted subsampling,
  * sequence packing, PII redaction, epoch shuffle), each hash-checked
  * against a DuckDB twin. Everything is hash-/count-based (no RNG), so
  * both engines agree exactly; the float ops are either correctly
  * rounded by IEEE (sqrt, dyadic-rational division — bit-identical
  * cross-engine) or rounded to 6 decimals for display (pow in q96's
  * general-alpha path).
  */
object SamplingOps {

  /** q93: deterministic stratified sample — exactly 5 docs per source,
    * chosen by md5-hash order of doc_id ([[graft.api.Sampling.stratifiedSample]]).
    * md5 over the decimal id string is engine-exact, so the SAME rows
    * are drawn every run on every engine — reproducible subsets with no
    * RNG state. Scale: one ranked window per stratum with a partial
    * WindowGroupLimit, so skewed strata cost a scan, not a shuffle.
    */
  def q93StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Sampling.stratifiedSample(
        table(spark, dir, "documents").select($"doc_id", $"source"),
        "source", "doc_id", k = 5)
      .select($"source", $"sample_rank", $"doc_id")
      .orderBy($"source", $"sample_rank")
  }

  val q93Sql: String =
    """SELECT source, sample_rank, doc_id FROM (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
      |  FROM documents)
      |WHERE sample_rank <= 5 ORDER BY source, sample_rank""".stripMargin

  /** q94: PII redaction ([[graft.api.Text.redactPii]]) — emails, IPv4,
    * phone-shaped 3-3-4 digit groups, then bare digit runs, as a chain
    * of global regexp_replace passes. Every row gets a deterministic
    * synthetic PII suffix (email/phone/IP built from doc_id) so all four
    * patterns fire on all rows; the md5 of the redacted text catches ANY
    * cross-engine regex divergence (the docstring's RE2-vs-Java parity
    * claim, now hash-verified). Benign numeric text must NOT collapse:
    * the match counters pin one <PHONE> and one <IP> per row.
    */
  def q94RedactPii(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withPii = table(spark, dir, "documents")
      .filter($"text".isNotNull)
      .select($"doc_id", concat($"text",
        lit(" contact user"), $"doc_id".cast("string"),
        lit("@example.com or (555) 123-4567 at 10.0.0."),
        pmod($"doc_id", lit(255)).cast("string")).as("t"))
    withPii.select(
        $"doc_id",
        md5(graft.api.Text.redactPii($"t")).as("redacted_md5"),
        graft.api.Text.piiMatchCount($"t", graft.api.Text.PiiPatterns(0)._1).as("n_email"),
        graft.api.Text.piiMatchCount($"t", graft.api.Text.PiiPatterns(2)._1).as("n_phone"))
      .orderBy($"doc_id")
  }

  val q94Sql: String = {
    // the same pattern chain, RE2 dialect ('g' = global, as in the
    // library's single-pass global replaces)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "\\+?\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\\b|\\+[0-9]{7,15}\\b"
    val num = "[0-9]+"
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com or (555) 123-4567 at 10.0.0.' || (doc_id % 255) AS t
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id,
       |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
       |    '$email', '<EMAIL>', 'g'),
       |    '$ip', '<IP>', 'g'),
       |    '$phone', '<PHONE>', 'g'),
       |    '$num', '<NUM>', 'g')) AS redacted_md5,
       |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phone
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** q95: sequence packing ([[graft.api.Text.sequencePacking]]) — lay
    * documents out contiguously per source shard in doc_id order and
    * compute each doc's start offset, 512-token context window, and
    * whether it straddles a window boundary. The prefix sum is
    * sequential WITHIN a shard by construction (why packers shard
    * first); shards run in parallel.
    */
  def q95SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Text.sequencePacking(table(spark, dir, "documents"),
        "source", "doc_id", "text", windowTokens = 512)
      .orderBy($"doc_id")
  }

  val q95Sql: String =
    """SELECT doc_id, source, n_tokens,
      |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off,
      |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 512 AS bin,
      |  (CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |     + n_tokens - 1) // 512
      |    <> CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 512
      |    AS spans_boundary
      |FROM (SELECT doc_id, source,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q96: temperature-based mixture weights per source
    * ([[graft.api.Sampling.mixtureWeights]], alpha = 0.5 up-weights
    * small sources): weight = n^alpha / Σ n^alpha over the tiny
    * one-row-per-source frame, expected draws from the UNROUNDED weight
    * (rounded once at the end — the ADVICE apportionment fix).
    */
  def q96MixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Sampling.mixtureWeights(table(spark, dir, "documents"),
        "source", alpha = 0.5, totalDraws = 1000000L)
      .orderBy($"source")
  }

  val q96Sql: String =
    """WITH g AS (
      |  SELECT source, COUNT(*) AS n_docs, sqrt(COUNT(*)) AS w_raw
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs,
      |  round(w_raw / SUM(w_raw) OVER (ORDER BY source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) AS weight,
      |  round(w_raw / SUM(w_raw) OVER (ORDER BY source
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) * 1000000, 2) AS expected_draws
      |FROM g ORDER BY source""".stripMargin

  /** q97: deterministic epoch shuffle ([[graft.api.Sampling.epochShuffle]])
    * — the training-order permutation for epoch 3 over 16 shards:
    * shard = id mod 16 (layout-stable), within-shard order =
    * md5("3:" || id) (reshuffles every epoch, reproducible everywhere).
    * No global sort: each shard permutes independently.
    */
  def q97EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Sampling.epochShuffle(
        table(spark, dir, "documents").select($"doc_id"),
        "doc_id", epoch = 3, shards = 16)
      .select($"shard", $"pos", $"doc_id")
      .orderBy($"shard", $"pos")
  }

  val q97Sql: String =
    """SELECT shard, pos, doc_id FROM (
      |  SELECT doc_id, doc_id % 16 AS shard,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id % 16
      |      ORDER BY md5('3:' || doc_id), doc_id) AS pos
      |  FROM documents)
      |ORDER BY shard, pos""".stripMargin

  /** q100: mixture-weighted deterministic subsample
    * ([[graft.api.Sampling.mixtureSample]], α = 0.5, target 25%) — the
    * draw that realizes q96's mixture: per-source keep probability
    * min(1, 0.25·N·w_g/n_g), decided by the exact Knuth-hash uniform so
    * both engines keep the SAME rows (integer arithmetic; sqrt and the
    * probability expression are bit-identical cross-engine).
    */
  def q100MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Sampling.mixtureSample(
        table(spark, dir, "documents").select($"doc_id", $"source"),
        "source", "doc_id", alpha = 0.5, targetFraction = 0.25)
      .select($"doc_id", $"source", round($"keep_prob", 6).as("keep_prob"), $"u")
      .orderBy($"doc_id")
  }

  val q100Sql: String =
    """WITH g AS (
      |  SELECT source, COUNT(*) AS n_g, sqrt(COUNT(*)) AS w_raw
      |  FROM documents GROUP BY source),
      |p AS (
      |  SELECT source,
      |    least(1.0, (0.25 * CAST(SUM(n_g) OVER (ORDER BY source
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE))
      |      * (w_raw / SUM(w_raw) OVER (ORDER BY source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |      / n_g) AS keep_prob
      |  FROM g)
      |SELECT doc_id, source, round(keep_prob, 6) AS keep_prob, u
      |FROM (
      |  -- 16-bit split mulmod (overflow-free for any BIGINT id) with a
      |  -- pmod-safe first reduction (negative ids), mirroring knuthU
      |  SELECT doc_id, source,
      |    CAST(((((x // 65536) * 2654435761) % 65536) * 65536
      |          + (x % 65536) * 2654435761) % 4294967296 AS DOUBLE)
      |      / 4294967296 AS u
      |  FROM (SELECT doc_id, source,
      |          ((doc_id % 4294967296) + 4294967296) % 4294967296 AS x
      |        FROM documents)) d
      |JOIN p USING (source)
      |WHERE u < keep_prob ORDER BY doc_id""".stripMargin

  /** q129: DSIR importance weights — each doc scored by the add-one-
    * smoothed log-likelihood ratio of its hashed unigram+bigram feature
    * occurrences under the `lang='en'` target distribution vs the whole
    * corpus ([[graft.api.Sampling.dsirWeights]]). Weights are held in
    * integer micro-nats (per-bucket `ln` floored onto the 10⁻⁶ grid,
    * then exact integer sums), so the result hash-matches DuckDB with
    * no float summation-order exposure. The bucket table is 4096 rows →
    * broadcast into the scoring join; only (doc, bucket) counts ever
    * shuffle.
    */
  def q129DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Sampling.dsirWeights(
        table(spark, dir, "documents"), "doc_id", "text", $"lang" === "en")
      .orderBy($"doc_id")
  }

  val q129Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang = 'en' AS is_target,
      |    string_split(text, ' ') AS toks
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, is_target, unnest(list_concat(
      |    list_filter(toks, t -> t <> ''),
      |    list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1]))) AS feat
      |  FROM d),
      |fb AS (SELECT doc_id, is_target, substr(md5(feat), 1, 3) AS bucket FROM f),
      |b AS (
      |  SELECT bucket, COUNT(*) AS r_b,
      |    SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b
      |  FROM fb GROUP BY bucket),
      |tot AS (SELECT SUM(r_b) AS r_tot, SUM(t_b) AS t_tot FROM b),
      |lr AS (
      |  SELECT bucket,
      |    CAST(FLOOR(LN(((t_b + 1.0) * (r_tot + 4096.0)) /
      |      ((r_b + 1.0) * (t_tot + 4096.0))) * 1000000.0) AS BIGINT) AS lr_micros
      |  FROM b, tot),
      |db AS (SELECT doc_id, bucket, COUNT(*) AS n FROM fb GROUP BY doc_id, bucket)
      |SELECT db.doc_id, CAST(SUM(db.n) AS BIGINT) AS n_feats,
      |  CAST(SUM(db.n * lr.lr_micros) AS BIGINT) AS w_micros
      |FROM db JOIN lr USING (bucket)
      |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin

  /** q145: per-source quality quota ([[graft.api.Sampling.scoreQuotaCap]])
    * — every source keeps its 15 best documents by the q35 quality
    * formula (fixed-order double arithmetic, bit-identical cross-engine,
    * ties to the lowest doc id). The rank-k window gate compiles to a
    * WindowGroupLimit, so a skewed mega-source is pruned to 15 rows per
    * partition before the shuffle instead of fully sorted.
    */
  def q145SourceQuota(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = table(spark, dir, "documents")
      .select($"doc_id", $"source",
        graft.api.Text.qualityScore($"text").as("quality"))
    graft.api.Sampling.scoreQuotaCap(scored, "source", "quality", "doc_id", 15)
      .select($"source", $"quota_rank", $"doc_id", $"quality")
      .orderBy($"source", $"quota_rank")
  }

  val q145Sql: String =
    """WITH q AS (
      |  SELECT doc_id, source,
      |    LEAST(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.5
      |      + (CAST(n_uniq AS DOUBLE) / n_tokens) * 0.3
      |      + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.2 AS quality
      |  FROM (
      |    SELECT doc_id, source,
      |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |      CAST(len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop
      |    FROM documents)),
      |ranked AS (
      |  SELECT source, doc_id, quality,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY quality DESC, doc_id) AS rn
      |  FROM q)
      |SELECT source, CAST(rn AS BIGINT) AS quota_rank, doc_id, quality
      |FROM ranked WHERE rn <= 15 ORDER BY source, quota_rank""".stripMargin

  /** q154: weight-proportional sampling without replacement
    * ([[graft.api.Sampling.weightedSample]], Efraimidis–Spirakis 2006)
    * — 8 docs per source, drawn with probability proportional to length
    * (`n_chars`): priority = −ln(u)/w with u the deterministic
    * half-integer Knuth-hash uniform, k smallest priorities win. Both
    * engines evaluate the IDENTICAL integer hash then one ln and one
    * division, so the same docs are drawn; the displayed priority
    * rounds to 6 decimals. The ranked window carries a
    * WindowGroupLimit like q93 — skewed sources cost a scan, not a
    * shuffle.
    */
  def q154WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Sampling.weightedSample(
        table(spark, dir, "documents").select($"doc_id", $"source", $"n_chars"),
        "source", "doc_id", "n_chars", k = 8)
      .select($"source", $"sample_rank", $"doc_id", $"n_chars",
        round($"priority", 6).as("priority"))
      .orderBy($"source", $"sample_rank")
  }

  val q154Sql: String =
    """WITH d AS (
      |  SELECT source, doc_id, n_chars,
      |    (CAST(((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536
      |       + ((doc_id % 4294967296) % 65536) * 2654435761 AS BIGINT)
      |     % 4294967296) AS m
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |p AS (
      |  SELECT source, doc_id, n_chars,
      |    (0.0 - ln((CAST(m AS DOUBLE) + 0.5) / 4294967296))
      |      / CAST(n_chars AS DOUBLE) AS priority
      |  FROM d),
      |ranked AS (
      |  SELECT source, doc_id, n_chars, priority,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY priority, doc_id) AS sample_rank
      |  FROM p)
      |SELECT source, sample_rank, doc_id, n_chars,
      |  ROUND(priority, 6) AS priority
      |FROM ranked WHERE sample_rank <= 8 ORDER BY source, sample_rank""".stripMargin

  /** q284: importance-weight health (effective sample size) — the
    * diagnostic that decides whether q129's DSIR weights are USABLE:
    * resampling by weights w is statistically worth n_eff =
    * (Σw)²/Σw² draws, and a per-source n_eff/n near 0 means one
    * document dominates the source's mass (the weights would produce
    * near-duplicates, not coverage). Weights exponentiate from the
    * integer micro-nat log-ratios SHIFTED by the per-source max (an
    * exact integer), so every exp argument is ≤0 — no overflow at any
    * corpus size — and both engines compute identical doubles. The
    * card reports per source: n_docs, ESS, the ESS ratio, and the
    * largest single-document weight share. The DSIR frame is
    * checkpointed once; the max-shift and the moment fold are two
    * bounded aggregates over it.
    */
  def q284EssCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = graft.api.Sampling.dsirWeights(
        table(spark, dir, "documents"), "doc_id", "text", $"lang" === "en")
      .join(table(spark, dir, "documents").select($"doc_id", $"source"),
        Seq("doc_id"))
      .localCheckpoint() // the feature explode runs once
    val mx = w.groupBy($"source").agg(max($"w_micros").as("mx"))
    // mx is one row per source (bounded tiny by construction): hint it
    // broadcast — unhinted, the checkpointed w frame's default stats
    // push the planner to a SortMergeJoin that shuffles AND sorts the
    // whole doc-weight frame on both sides just to attach 1 max each
    val e = w.join(broadcast(mx), Seq("source"))
      .withColumn("wn", exp(($"w_micros" - $"mx").cast("double") / 1e6))
    e.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"wn").as("sw"),
        sum($"wn" * $"wn").as("sww"), max($"wn").as("wmax"))
      .select($"source", $"n_docs",
        round($"sw" * $"sw" / $"sww", 4).as("ess"),
        round($"sw" * $"sw" / $"sww" / $"n_docs".cast("double"), 6)
          .as("ess_ratio"),
        round($"wmax" / $"sw", 6).as("top_weight_share"))
      .orderBy($"source")
  }

  val q284Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang = 'en' AS is_target,
      |    string_split(text, ' ') AS toks
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, is_target, unnest(list_concat(
      |    list_filter(toks, t -> t <> ''),
      |    list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i + 1]))) AS feat
      |  FROM d),
      |fb AS (SELECT doc_id, is_target, substr(md5(feat), 1, 3) AS bucket FROM f),
      |b AS (
      |  SELECT bucket, COUNT(*) AS r_b,
      |    SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b
      |  FROM fb GROUP BY bucket),
      |tot AS (SELECT SUM(r_b) AS r_tot, SUM(t_b) AS t_tot FROM b),
      |lr AS (
      |  SELECT bucket,
      |    CAST(FLOOR(LN(((t_b + 1.0) * (r_tot + 4096.0)) /
      |      ((r_b + 1.0) * (t_tot + 4096.0))) * 1000000.0) AS BIGINT) AS lr_micros
      |  FROM b, tot),
      |db AS (SELECT doc_id, bucket, COUNT(*) AS n FROM fb GROUP BY doc_id, bucket),
      |wdoc AS (
      |  SELECT db.doc_id, CAST(SUM(db.n * lr.lr_micros) AS BIGINT) AS w_micros
      |  FROM db JOIN lr USING (bucket) GROUP BY db.doc_id),
      |ws AS (
      |  SELECT w_micros, source FROM wdoc
      |  JOIN (SELECT doc_id, source FROM documents) USING (doc_id)),
      |sh AS (
      |  SELECT source, w_micros,
      |    MAX(w_micros) OVER (PARTITION BY source) AS mx
      |  FROM ws),
      |e AS (
      |  SELECT source,
      |    exp(CAST(w_micros - mx AS DOUBLE) / 1e6) AS wn
      |  FROM sh),
      |g AS (
      |  SELECT source, COUNT(*) AS n_docs, SUM(wn) AS sw,
      |    SUM(wn * wn) AS sww, MAX(wn) AS wmax
      |  FROM e GROUP BY 1)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  ROUND(sw * sw / sww, 4) AS ess,
      |  ROUND(sw * sw / sww / n_docs, 6) AS ess_ratio,
      |  ROUND(wmax / sw, 6) AS top_weight_share
      |FROM g ORDER BY source""".stripMargin

  /** q293: quality-greedy mixture under a token budget — the allocation
    * card that closes the loop from q96 (temperature weights) and q274
    * (how many tokens the model needs): given a budget of 40% of the
    * corpus, fill it greedily from the highest-quality sources (the q35
    * per-doc score averaged per source), taking the boundary source
    * fractionally — the classic knapsack-with-divisible-items optimum.
    * Sources rank by their ROUNDED quality (ties to the source name),
    * so the greedy order is engine-stable; allocations are exact longs
    * (the budget is an integer floor, each take a min/greatest over
    * longs); the realized-vs-corpus quality delta is the card's
    * verdict. One doc-level aggregate to ≤|sources| rows, then window
    * cumsums over that bounded frame.
    */
  def q293BudgetedMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSource = table(spark, dir, "documents")
      .select($"source", graft.api.Text.tokenCount($"text").as("nt"),
        graft.api.Text.qualityScore($"text").as("q"))
      .groupBy($"source")
      .agg(sum($"nt").as("tokens"), count(lit(1)).as("n_docs"),
        round(avg($"q"), 6).as("avg_quality"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"avg_quality".desc, $"source")
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy($"avg_quality".desc, $"source")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ranked = perSource
      .withColumn("rank", row_number().over(w))
      .withColumn("budget",
        floor(sum($"tokens").over(all) * 0.4).cast("long"))
      .withColumn("cum_before",
        coalesce(sum($"tokens").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("alloc_tokens",
        greatest(lit(0L), least($"tokens", $"budget" - $"cum_before")))
    ranked
      .withColumn("realized_quality", round(
        sum($"alloc_tokens".cast("double") * $"avg_quality").over(all) /
          sum($"alloc_tokens").over(all), 6))
      .withColumn("corpus_quality", round(
        sum($"tokens".cast("double") * $"avg_quality").over(all) /
          sum($"tokens").over(all), 6))
      .select($"rank", $"source", $"n_docs", $"tokens", $"avg_quality",
        $"alloc_tokens",
        round($"alloc_tokens".cast("double") / $"budget", 6)
          .as("alloc_share"),
        $"realized_quality", $"corpus_quality")
      .orderBy($"rank")
  }

  val q293Sql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
      |    LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 64.0, 1.0)
      |        * 0.5
      |      + (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |        / len(string_split(text, ' '))) * 0.3
      |      + (1.0 - CAST(len(list_filter(string_split(text, ' '),
      |          t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
      |        / len(string_split(text, ' '))) * 0.2 AS q
      |  FROM documents),
      |s AS (
      |  SELECT source, SUM(nt) AS tokens, COUNT(*) AS n_docs,
      |    ROUND(AVG(q), 6) AS avg_quality
      |  FROM d GROUP BY 1),
      |r AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (ORDER BY avg_quality DESC, source) AS rank,
      |    CAST(FLOOR(SUM(tokens) OVER () * 0.4) AS BIGINT) AS budget,
      |    COALESCE(SUM(tokens) OVER (ORDER BY avg_quality DESC, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS cum_before
      |  FROM s),
      |a AS (
      |  SELECT *,
      |    GREATEST(0, LEAST(tokens, budget - cum_before)) AS alloc_tokens
      |  FROM r)
      |SELECT CAST(rank AS BIGINT) AS rank, source,
      |  CAST(n_docs AS BIGINT) AS n_docs, CAST(tokens AS BIGINT) AS tokens,
      |  avg_quality, CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
      |  ROUND(CAST(alloc_tokens AS DOUBLE) / budget, 6) AS alloc_share,
      |  ROUND(SUM(CAST(alloc_tokens AS DOUBLE) * avg_quality) OVER ()
      |    / SUM(alloc_tokens) OVER (), 6) AS realized_quality,
      |  ROUND(SUM(CAST(tokens AS DOUBLE) * avg_quality) OVER ()
      |    / SUM(tokens) OVER (), 6) AS corpus_quality
      |FROM a ORDER BY rank""".stripMargin

  /** q296: mixture-delivery audit — did the sampler DELIVER the design?
    * The q100 hash-thresholded subsample realizes the q96 temperature
    * mixture only in expectation; this card compares the realized draw
    * counts per source against the design expectation (keep_prob ·
    * n_docs) with Pearson residuals and the chi-squared
    * goodness-of-fit total — the release gate between "we designed a
    * mixture" and "the training set actually has it". A |residual| > 3
    * row means the hash draw landed improbably far from design (or the
    * design changed under the sampler). All counts are exact; the
    * expectation reuses the EXACT q100 keep-prob formula, so the audit
    * and the sampler cannot drift apart. One doc pass, |sources| rows.
    */
  def q296MixtureDelivery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sampled = graft.api.Sampling.mixtureSampleScored(
        table(spark, dir, "documents").select($"doc_id", $"source"),
        "source", "doc_id", alpha = 0.5, targetFraction = 0.25)
    val bySource = sampled.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"u" < $"keep_prob", 1L).otherwise(0L)).as("n_drawn"),
        max($"keep_prob").as("keep_prob"))
      .withColumn("expected", $"keep_prob" * $"n_docs".cast("double"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    bySource
      .withColumn("resid", ($"n_drawn".cast("double") - $"expected") /
        sqrt($"expected" * (lit(1.0) - $"keep_prob")))
      .select($"source", $"n_docs", $"n_drawn",
        round($"expected", 4).as("expected"),
        round($"resid", 4).as("pearson_resid"),
        round(sum($"resid" * $"resid").over(all), 4).as("chi2_total"),
        (abs($"resid") > 3.0).as("off_design"))
      .orderBy($"source")
  }

  val q296Sql: String =
    """WITH g AS (
      |  SELECT source, COUNT(*) AS n_g, sqrt(COUNT(*)) AS w_raw
      |  FROM documents GROUP BY source),
      |p AS (
      |  SELECT source, n_g,
      |    least(1.0, (0.25 * CAST(SUM(n_g) OVER (ORDER BY source
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |          AS DOUBLE))
      |      * (w_raw / SUM(w_raw) OVER (ORDER BY source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |      / n_g) AS keep_prob
      |  FROM g),
      |d AS (
      |  SELECT doc_id, source,
      |    CAST(((((x // 65536) * 2654435761) % 65536) * 65536
      |          + (x % 65536) * 2654435761) % 4294967296 AS DOUBLE)
      |      / 4294967296 AS u
      |  FROM (SELECT doc_id, source,
      |          ((doc_id % 4294967296) + 4294967296) % 4294967296 AS x
      |        FROM documents)),
      |s AS (
      |  SELECT d.source, COUNT(*) AS n_docs,
      |    SUM(CASE WHEN u < keep_prob THEN 1 ELSE 0 END) AS n_drawn,
      |    MAX(keep_prob) AS keep_prob
      |  FROM d JOIN p USING (source) GROUP BY 1),
      |r AS (
      |  SELECT source, n_docs, n_drawn,
      |    keep_prob * n_docs AS expected,
      |    (CAST(n_drawn AS DOUBLE) - keep_prob * n_docs)
      |      / sqrt(keep_prob * n_docs * (1.0 - keep_prob)) AS resid
      |  FROM s)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_drawn AS BIGINT) AS n_drawn,
      |  ROUND(expected, 4) AS expected,
      |  ROUND(resid, 4) AS pearson_resid,
      |  ROUND(SUM(resid * resid) OVER (), 4) AS chi2_total,
      |  abs(resid) > 3.0 AS off_design
      |FROM r ORDER BY source""".stripMargin

  val queries: Seq[(String, Q)] = Seq(
    "q296_mixture_delivery" -> (q296MixtureDelivery _),
    "q293_budgeted_mixture" -> (q293BudgetedMixture _),
    "q284_ess_card" -> (q284EssCard _),
    "q154_weighted_sample" -> (q154WeightedSample _),
    "q145_source_quota" -> (q145SourceQuota _),
    "q129_dsir_weights" -> (q129DsirWeights _),
    "q93_stratified_sample" -> (q93StratifiedSample _),
    "q94_redact_pii" -> (q94RedactPii _),
    "q95_sequence_packing" -> (q95SequencePacking _),
    "q96_mixture_weights" -> (q96MixtureWeights _),
    "q97_epoch_shuffle" -> (q97EpochShuffle _),
    "q100_mixture_sample" -> (q100MixtureSample _))

  val oracles: Seq[(String, String)] = Seq(
    "q296_mixture_delivery" -> q296Sql,
    "q293_budgeted_mixture" -> q293Sql,
    "q284_ess_card" -> q284Sql,
    "q154_weighted_sample" -> q154Sql,
    "q145_source_quota" -> q145Sql,
    "q129_dsir_weights" -> q129Sql,
    "q93_stratified_sample" -> q93Sql,
    "q94_redact_pii" -> q94Sql,
    "q95_sequence_packing" -> q95Sql,
    "q96_mixture_weights" -> q96Sql,
    "q97_epoch_shuffle" -> q97Sql,
    "q100_mixture_sample" -> q100Sql)
}
