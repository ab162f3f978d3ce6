package graft.operators

import graft.Util._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy / data-governance audits — the release-gate checks a
  * training-data pipeline runs before a corpus (or an aggregate table
  * derived from user data) leaves the trust boundary. Re-identification
  * risk is a GROUPING property: a row is exposed when its
  * quasi-identifier (QI) combination is shared by too few other rows
  * (k-anonymity, Sweeney 2002), and a group is exposed when it is
  * homogeneous in a sensitive attribute even at safe k (l-diversity,
  * Machanavajjhala 2007). Both reduce to hash aggregations over the QI
  * columns, so the audits cost one shuffle whose cardinality is the QI
  * DOMAIN (bounded, independent of row count) — at 100 TB the risk
  * card is exactly as cheap as a group-count, and never collects rows.
  *
  * All outputs are integer counts plus 6-decimal shares of
  * correctly-rounded double divisions — engine-exact vs the DuckDB
  * oracles.
  */
object GovernanceOps {

  /** Per-QI-group size frame: one row per distinct QI combination with
    * its population `k`. The single shuffle of every audit below.
    */
  def qiGroupSizes(df: DataFrame, qiCols: Seq[Column]): DataFrame =
    df.groupBy(qiCols: _*).agg(count(lit(1)).as("k"))

  /** k-anonymity band histogram over the group-size frame: how many QI
    * groups (and how many ROWS — the actual exposure mass) sit at each
    * risk tier. `k_lo` carries the band's lower bound for ordering and
    * for joining against a policy table.
    */
  def kAnonymityBands(groupSizes: DataFrame): DataFrame = {
    val k = col("k")
    val kLo = when(k === 1, 1L).when(k <= 4, 2L).when(k <= 9, 5L)
      .when(k <= 19, 10L).otherwise(20L)
    groupSizes
      .groupBy(kLo.as("k_lo"))
      .agg(count(lit(1)).as("n_groups"), sum(k).as("n_rows"))
      .withColumn("row_share", round(
        col("n_rows").cast("double") /
          sum(col("n_rows")).over(Window.partitionBy()), 6))
  }

  /** q221: k-anonymity audit of the customer table under the
    * QI (nation, market segment, account-balance kilobucket) — the
    * classic "is anyone unique in the release?" card. Two hash
    * aggregations: rows → QI groups (cardinality = QI domain), groups →
    * 5 risk bands; the window total is over the 5-row band frame.
    * Scale: the only data-sized pass is the first groupBy, with
    * map-side partial aggregation; nothing downstream grows with rows.
    */
  def q221KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qi = Seq($"c_nationkey",
      $"c_mktsegment",
      floor($"c_acctbal" / 1000.0).cast("long").as("bal_kb"))
    kAnonymityBands(qiGroupSizes(table(spark, dir, "customer"), qi))
      .orderBy($"k_lo")
  }

  val q221Sql: String =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_kb,
      |    COUNT(*) AS k
      |  FROM customer GROUP BY 1, 2, 3),
      |b AS (
      |  SELECT CASE WHEN k = 1 THEN 1 WHEN k <= 4 THEN 2
      |              WHEN k <= 9 THEN 5 WHEN k <= 19 THEN 10
      |              ELSE 20 END AS k_lo,
      |    COUNT(*) AS n_groups, SUM(k) AS n_rows
      |  FROM g GROUP BY 1)
      |SELECT CAST(k_lo AS BIGINT) AS k_lo,
      |  CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(n_rows AS BIGINT) AS n_rows,
      |  ROUND(CAST(n_rows AS DOUBLE) / SUM(n_rows) OVER (), 6) AS row_share
      |FROM b ORDER BY k_lo""".stripMargin

  /** q222: l-diversity audit — k-anonymity's blind spot is a large QI
    * group where everyone shares the SAME sensitive value (membership
    * alone leaks it). Under QI (nation, 2k-balance bucket) with market
    * segment as the sensitive attribute, reports for each distinct-
    * sensitive-count l: how many groups, how many rows, and the row
    * share. l=1 rows are fully exposed regardless of k. Same two-
    * aggregation shape as q221 (count_distinct adds one extra partial
    * pass), cardinality bounded by the QI domain.
    */
  def q222LDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = table(spark, dir, "customer")
      .groupBy($"c_nationkey",
        floor($"c_acctbal" / 2000.0).cast("long").as("bal_2kb"))
      .agg(count(lit(1)).as("k"),
        countDistinct($"c_mktsegment").as("l"))
    g.groupBy($"l")
      .agg(count(lit(1)).as("n_groups"), sum($"k").as("n_rows"))
      .withColumn("row_share", round(
        $"n_rows".cast("double") /
          sum($"n_rows").over(Window.partitionBy()), 6))
      .orderBy($"l")
  }

  val q222Sql: String =
    """WITH g AS (
      |  SELECT c_nationkey,
      |    CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_2kb,
      |    COUNT(*) AS k, COUNT(DISTINCT c_mktsegment) AS l
      |  FROM customer GROUP BY 1, 2)
      |SELECT CAST(l AS BIGINT) AS l, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(k) AS BIGINT) AS n_rows,
      |  ROUND(CAST(SUM(k) AS DOUBLE) / SUM(SUM(k)) OVER (), 6) AS row_share
      |FROM g GROUP BY l ORDER BY l""".stripMargin

  /** q223: generalization ladder — the anonymization DIAL. Coarsening
    * the balance bucket (500 → 1000 → 2000 → 4000) shrinks the QI
    * domain and pulls every group's k up; the audit reports, per rung,
    * how far from k≥5 the release still is (violating groups, rows at
    * risk, smallest group). The release policy picks the first rung
    * with n_rows_at_risk = 0 — computing the whole ladder in ONE pass
    * (constant ×4 explode, then one grouped aggregation keyed by
    * (width, QI)) beats four separate audits and keeps the shuffle
    * bounded by 4 × QI domain. At 100 TB the fanout is still a narrow
    * map; no row leaves its partition before the partial aggregate.
    */
  def q223GeneralizationLadder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val widths = array(lit(500L), lit(1000L), lit(2000L), lit(4000L))
    val g = table(spark, dir, "customer")
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal",
        explode(widths).as("width"))
      .groupBy($"width", $"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / $"width").cast("long").as("bal_b"))
      .agg(count(lit(1)).as("k"))
    g.groupBy($"width")
      .agg(count(lit(1)).as("n_groups"),
        sum(when($"k" < 5, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when($"k" < 5, $"k").otherwise(0L)).as("n_rows_at_risk"),
        min($"k").as("k_min"))
      .withColumn("anonymous_k5", $"n_rows_at_risk" === 0L)
      .orderBy($"width")
  }

  val q223Sql: String =
    """WITH g AS (
      |  SELECT w.width, c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / w.width) AS BIGINT) AS bal_b,
      |    COUNT(*) AS k
      |  FROM customer
      |  CROSS JOIN (SELECT CAST(UNNEST([500, 1000, 2000, 4000]) AS BIGINT)
      |              AS width) w
      |  GROUP BY 1, 2, 3, 4)
      |SELECT width, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating_groups,
      |  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk,
      |  CAST(MIN(k) AS BIGINT) AS k_min,
      |  SUM(CASE WHEN k < 5 THEN k ELSE 0 END) = 0 AS anonymous_k5
      |FROM g GROUP BY width ORDER BY width""".stripMargin

  /** q240: differentially-private count release (suppress-then-noise) —
    * per-nation customer counts released under ε=0.5 Laplace noise with
    * small groups (k<5, the [[q221KAnonymity]] tier) suppressed
    * outright: the two governance mechanisms composed the way a real
    * release pipeline layers them. The noise is DETERMINISTIC and
    * engine-exact by construction: the same overflow-free Knuth
    * multiplicative-hash uniform the sampling family uses (16-bit-split
    * integer arithmetic, no RNG state) feeds the Laplace inverse CDF
    * −b·sgn(u)·ln(1−2|u|) — reproducible releases under replay, and the
    * u=±½ singularity is unreachable because the uniform sits on the
    * half-integer grid. One QI-domain-bounded aggregate; the noise is a
    * narrow per-group expression.
    */
  def q240DpRelease(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = table(spark, dir, "customer")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_true"))
    val x = pmod($"c_nationkey".cast("long") * 31L + 1000003L, lit(4294967296L))
    val lo = pmod(x, lit(65536L))
    val hi = ((x - lo) / lit(65536L)).cast("long")
    val u = (pmod(pmod(hi * 2654435761L, lit(65536L)) * 65536L +
      lo * 2654435761L, lit(4294967296L)).cast("double") + 0.5) / 4294967296.0
    val s = u - 0.5
    val noise = lit(-2.0) * signum(s) * log(lit(1.0) - lit(2.0) * abs(s))
    g.select($"c_nationkey", $"n_true",
        ($"n_true" < 5).as("suppressed"),
        when($"n_true" >= 5, round($"n_true" + noise, 4)).as("released_n"))
      .orderBy($"c_nationkey")
  }

  val q240Sql: String =
    """WITH g AS (
      |  SELECT c_nationkey, COUNT(*) AS n_true FROM customer GROUP BY 1),
      |n AS (
      |  SELECT *,
      |    (CAST(x - (x % 65536) AS BIGINT) / 65536 * 2654435761 % 65536)
      |      * 65536 AS hi_part,
      |    (x % 65536) * 2654435761 AS lo_part
      |  FROM (SELECT *,
      |    (CAST(c_nationkey AS BIGINT) * 31 + 1000003) % 4294967296 AS x
      |    FROM g)),
      |u AS (
      |  SELECT c_nationkey, n_true,
      |    (CAST((hi_part + lo_part) % 4294967296 AS DOUBLE) + 0.5)
      |      / 4294967296.0 - 0.5 AS s
      |  FROM n)
      |SELECT c_nationkey, n_true, n_true < 5 AS suppressed,
      |  CASE WHEN n_true >= 5 THEN
      |    ROUND(n_true + (-2.0) * SIGN(s) * ln(1.0 - 2.0 * ABS(s)), 4)
      |  END AS released_n
      |FROM u ORDER BY c_nationkey""".stripMargin

  /** q281: t-closeness audit — the escalation past q221/q222: a QI
    * group can be large (k-anonymous) AND diverse (l-diverse) yet still
    * leak if its SENSITIVE-value distribution differs sharply from the
    * table's ("this nation+segment skews rich"). For the ordered
    * sensitive attribute (account balance in 2k buckets), t is the
    * 1-D earth-mover's distance between the group's distribution and
    * the global one: mean |cumulative-share gap| over the ordered
    * buckets, normalized by (m−1). Every share folds from integer
    * counts; the cumulative sums run over the bounded (QI × bucket)
    * aggregate, never over rows. The card reports each QI group's t,
    * its population, and whether it breaches the t=0.2 release policy.
    */
  def q281TCloseness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = table(spark, dir, "customer")
      .select($"c_nationkey".as("nation"), $"c_mktsegment".as("segment"),
        floor($"c_acctbal" / 2000.0).cast("long").as("bucket"))
    // bounded aggregate: |nations × segments × ~12 buckets|
    val cells = base.groupBy($"nation", $"segment", $"bucket")
      .agg(count(lit(1)).as("n")).localCheckpoint()
    val buckets = cells.select($"bucket").distinct()
    val global = cells.groupBy($"bucket").agg(sum($"n").as("ng"))
      .crossJoin(broadcast(cells.agg(sum($"n").as("tot"))))
      .select($"bucket", ($"ng".cast("double") / $"tot".cast("double"))
        .as("p_global"))
    val groups = cells.groupBy($"nation", $"segment")
      .agg(sum($"n").as("k"))
    // dense (group × bucket) grid so cumulative shares line up even
    // where a group has no mass in a bucket
    val grid = groups.crossJoin(broadcast(buckets))
      .join(cells, Seq("nation", "segment", "bucket"), "left")
      .withColumn("n", coalesce($"n", lit(0L)))
      .join(broadcast(global), Seq("bucket"))
    val w = Window.partitionBy($"nation", $"segment").orderBy($"bucket")
    val nBuckets = Window.partitionBy($"nation", $"segment")
    val cum = grid
      .withColumn("cum_q",
        sum($"n".cast("double") / $"k".cast("double")).over(w))
      .withColumn("cum_p", sum($"p_global").over(w))
      .withColumn("m", count(lit(1)).over(nBuckets))
    cum.groupBy($"nation", $"segment")
      .agg(max($"k").as("k"),
        (sum(abs($"cum_q" - $"cum_p")) / (max($"m") - lit(1.0))).as("t"))
      .select($"nation", $"segment", $"k", round($"t", 6).as("t"),
        ($"t" > 0.2).as("breach"))
      .orderBy($"nation", $"segment")
  }

  val q281Sql: String =
    """WITH base AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bucket
      |  FROM customer),
      |cells AS (
      |  SELECT nation, segment, bucket, COUNT(*) AS n
      |  FROM base GROUP BY 1, 2, 3),
      |buckets AS (SELECT DISTINCT bucket FROM cells),
      |gdist AS (
      |  SELECT bucket, CAST(SUM(n) AS DOUBLE)
      |      / (SELECT SUM(n) FROM cells) AS p_global
      |  FROM cells GROUP BY 1),
      |groups AS (
      |  SELECT nation, segment, SUM(n) AS k FROM cells GROUP BY 1, 2),
      |grid AS (
      |  SELECT g.nation, g.segment, b.bucket, g.k,
      |    COALESCE(c.n, 0) AS n, gl.p_global
      |  FROM groups g CROSS JOIN buckets b
      |  LEFT JOIN cells c ON c.nation = g.nation AND c.segment = g.segment
      |    AND c.bucket = b.bucket
      |  JOIN gdist gl ON gl.bucket = b.bucket),
      |cum AS (
      |  SELECT nation, segment, k,
      |    SUM(CAST(n AS DOUBLE) / k)
      |      OVER (PARTITION BY nation, segment ORDER BY bucket) AS cum_q,
      |    SUM(p_global)
      |      OVER (PARTITION BY nation, segment ORDER BY bucket) AS cum_p,
      |    COUNT(*) OVER (PARTITION BY nation, segment) AS m
      |  FROM grid)
      |SELECT nation, segment, CAST(MAX(k) AS BIGINT) AS k,
      |  ROUND(SUM(ABS(cum_q - cum_p)) / (MAX(m) - 1.0), 6) AS t,
      |  SUM(ABS(cum_q - cum_p)) / (MAX(m) - 1.0) > 0.2 AS breach
      |FROM cum GROUP BY nation, segment
      |ORDER BY nation, segment""".stripMargin

  /** q338: candidate-key / functional-dependency audit over lineitem —
    * the schema-contract check a pipeline runs before trusting a
    * "primary key" for dedup or joins: for each candidate column set,
    * distinct combinations vs rows (a key iff equal), and for each
    * FD candidate A→B whether |distinct A| = |distinct (A,B)|. Each
    * probe is ONE distinct-aggregate (hash agg, map-side partials);
    * results union into a fixed audit table. Complements q194's
    * single-column profile with COMPOSITE semantics — the audit that
    * catches "orderkey alone is not the grain, (orderkey, linenumber)
    * is".
    */
  def q338KeyAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ALL probes ride one multi-distinct aggregate — Catalyst's Expand
    // turns it into a single scan (the q194 shape: at 100 TB one read
    // with a 7× expand beats seven reads), and the audit rows unfold
    // from the one-row result with stack().
    val a = table(spark, dir, "lineitem").agg(
      count(lit(1)).as("n"),
      countDistinct($"l_orderkey").as("d_ok"),
      countDistinct($"l_orderkey", $"l_linenumber").as("d_ol"),
      countDistinct($"l_orderkey", $"l_partkey").as("d_op"),
      countDistinct($"l_partkey", $"l_suppkey").as("d_ps"),
      countDistinct($"l_orderkey", $"l_returnflag").as("d_orf"),
      countDistinct($"l_orderkey", $"l_linenumber", $"l_shipdate").as("d_ols"))
    a.selectExpr("""stack(6,
        'l_orderkey',                          'key', n,    d_ok,
        'l_orderkey,l_linenumber',             'key', n,    d_ol,
        'l_orderkey,l_partkey',                'key', n,    d_op,
        'l_partkey,l_suppkey',                 'key', n,    d_ps,
        'l_orderkey->l_returnflag',            'fd',  d_ok, d_orf,
        'l_orderkey,l_linenumber->l_shipdate', 'fd',  d_ol, d_ols)
        AS (candidate, kind, n_rows, n_distinct)""")
      .select($"candidate", $"kind", $"n_rows", $"n_distinct",
        when($"kind" === "key", $"n_rows" - $"n_distinct")
          .otherwise($"n_distinct" - $"n_rows").as("n_violations"),
        ($"n_distinct" === $"n_rows").as("holds"))
      .orderBy($"candidate")
  }

  val q338Sql: String =
    """WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
      |SELECT * FROM (
      |  SELECT 'l_orderkey' AS candidate, 'key' AS kind, n_rows,
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem))
      |      AS n_distinct,
      |    n_rows - (SELECT COUNT(*) FROM
      |      (SELECT DISTINCT l_orderkey FROM lineitem)) AS n_violations,
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem))
      |      = n_rows AS holds
      |  FROM n
      |  UNION ALL
      |  SELECT 'l_orderkey,l_linenumber', 'key', n_rows,
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
      |      FROM lineitem)),
      |    n_rows - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey,
      |      l_linenumber FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
      |      FROM lineitem)) = n_rows
      |  FROM n
      |  UNION ALL
      |  SELECT 'l_orderkey,l_partkey', 'key', n_rows,
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_partkey
      |      FROM lineitem)),
      |    n_rows - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey,
      |      l_partkey FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_partkey
      |      FROM lineitem)) = n_rows
      |  FROM n
      |  UNION ALL
      |  SELECT 'l_partkey,l_suppkey', 'key', n_rows,
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey
      |      FROM lineitem)),
      |    n_rows - (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey,
      |      l_suppkey FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey
      |      FROM lineitem)) = n_rows
      |  FROM n
      |  UNION ALL
      |  SELECT 'l_orderkey->l_returnflag', 'fd',
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_returnflag
      |      FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_returnflag
      |      FROM lineitem))
      |      - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey
      |        FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_returnflag
      |      FROM lineitem))
      |      = (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey
      |        FROM lineitem))
      |  UNION ALL
      |  SELECT 'l_orderkey,l_linenumber->l_shipdate', 'fd',
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
      |      FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber,
      |      l_shipdate FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber,
      |      l_shipdate FROM lineitem))
      |      - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey,
      |        l_linenumber FROM lineitem)),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber,
      |      l_shipdate FROM lineitem))
      |      = (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey,
      |        l_linenumber FROM lineitem))
      |) ORDER BY candidate""".stripMargin

  val queries: Seq[(String, Q)] = Seq(
    "q338_key_audit" -> (q338KeyAudit _),
    "q281_t_closeness" -> (q281TCloseness _),
    "q240_dp_release" -> (q240DpRelease _),
    "q221_k_anonymity" -> (q221KAnonymity _),
    "q222_l_diversity" -> (q222LDiversity _),
    "q223_generalization_ladder" -> (q223GeneralizationLadder _))

  val oracles: Seq[(String, String)] = Seq(
    "q338_key_audit" -> q338Sql,
    "q281_t_closeness" -> q281Sql,
    "q240_dp_release" -> q240Sql,
    "q221_k_anonymity" -> q221Sql,
    "q222_l_diversity" -> q222Sql,
    "q223_generalization_ladder" -> q223Sql)
}
