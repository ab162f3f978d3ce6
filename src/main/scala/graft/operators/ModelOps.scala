package graft.operators

import graft.Util._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-evaluation cards — the offline metrics a filtering/curation
  * model (quality classifier, dedup keeper-scorer, contamination
  * detector) is judged by before it gates a 100 TB corpus: ranking
  * power (AUC), probability honesty (calibration + Brier), and the
  * operating point (threshold sweep). All three run against a
  * DETERMINISTIC closed-form scorer (a rational logistic over exact
  * column arithmetic — every FP op correctly rounded, no libm calls),
  * so the Spark results hash-match the DuckDB oracles bit-for-bit.
  *
  * Scale shape shared by all three: one pass over the scored rows into
  * a hash aggregate whose cardinality is the SCORE GRID (bounded by the
  * value domain, not row count), then windows/folds over that small
  * frame. AUC in particular never materializes pos×neg pairs — the
  * Mann-Whitney rank identity turns it into a cumulative window over
  * distinct scores, all in exact integer arithmetic until one final
  * division.
  */
object ModelOps {

  /** The deterministic scorer: label = line item was returned;
    * p = z/(1+z) with z = 10·discount + quantity/10 — a rational
    * logistic (no exp), kept in textually identical op order on both
    * engines, then snapped to the 1e-6 grid so downstream sums can be
    * exact decimals.
    */
  private def scored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val z = $"l_discount" * 10 + $"l_quantity" / 10.0
    table(spark, dir, "lineitem").select(
      round(z / (z + 1.0), 6).as("p"),
      when($"l_returnflag" === "R", 1L).otherwise(0L).as("y"))
  }

  private val scoredSql =
    """SELECT round((l_discount*10 + l_quantity/10.0) /
      |    ((l_discount*10 + l_quantity/10.0) + 1.0), 6) AS p,
      |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |FROM lineitem""".stripMargin

  /** q224: AUC / Gini via the Mann-Whitney rank identity with exact tie
    * handling — AUC = (Σ_pos avgrank − n₊(n₊+1)/2) / (n₊·n₋), where
    * ties share their average rank. Grouping by distinct score first
    * makes every quantity an integer: with per-score (n, n₊) and the
    * cumulative count before the score, 2·Σ_pos avgrank =
    * Σ n₊·(2·cum_prev + n + 1). One data pass, one window over the
    * score grid, one final double division — no pos×neg pair join, so
    * the cost at 100 TB is the scan plus a grid-sized shuffle.
    */
  def q224AucCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = scored(spark, dir).groupBy($"p")
      .agg(count(lit(1)).as("n"), sum($"y").as("npos"))
    val w = Window.orderBy($"p")
    val r = g.withColumn("cum_prev",
      coalesce(sum($"n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    r.agg(
        sum($"npos" * ($"cum_prev" * 2 + $"n" + 1)).as("u2"),
        sum($"npos").as("np"),
        (sum($"n") - sum($"npos")).as("nn"))
      .select(
        $"np".as("n_pos"), $"nn".as("n_neg"),
        round(($"u2" - $"np" * ($"np" + 1)).cast("double") /
          ($"np" * $"nn" * 2.0), 6).as("auc"),
        round(($"u2" - $"np" * ($"np" + 1)).cast("double") /
          ($"np" * $"nn").cast("double") - 1.0, 6).as("gini"))
  }

  val q224Sql: String =
    s"""WITH s AS ($scoredSql),
      |g AS (SELECT p, COUNT(*) AS n, SUM(y) AS npos FROM s GROUP BY p),
      |r AS (
      |  SELECT n, npos,
      |    COALESCE(SUM(n) OVER (ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      |  FROM g),
      |t AS (
      |  SELECT SUM(npos * (cum_prev * 2 + n + 1)) AS u2, SUM(npos) AS np,
      |    SUM(n) - SUM(npos) AS nn
      |  FROM r)
      |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
      |  ROUND(CAST(u2 - np*(np+1) AS DOUBLE) / (np * nn * 2.0), 6) AS auc,
      |  ROUND(CAST(u2 - np*(np+1) AS DOUBLE) / CAST(np * nn AS DOUBLE) - 1.0,
      |    6) AS gini
      |FROM t""".stripMargin

  /** q225: calibration / reliability card — decile bins of the
    * predicted probability vs the realized positive rate, plus the
    * per-bin Brier score. A model can rank perfectly (q224) and still
    * lie about probabilities; a curation pipeline that thresholds on
    * p=0.5 needs p to MEAN 0.5. All sums are exact decimals: p sits on
    * the 1e-6 grid, (p−y)² on the 1e-12 grid and exactly representable,
    * so both engines fold identical values in any order.
    */
  def q225CalibrationCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scored(spark, dir)
      .groupBy(least(floor($"p" * 10).cast("long"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"),
        round(dsum6($"p") / count(lit(1)), 6).as("avg_p"),
        round(sum($"y").cast("double") / count(lit(1)), 6).as("pos_rate"),
        round(sum((($"p" - $"y") * ($"p" - $"y")).cast(DecimalType(32, 12)))
          .cast("double") / count(lit(1)), 6).as("brier"))
      .orderBy($"bin")
  }

  val q225Sql: String =
    s"""WITH s AS ($scoredSql)
      |SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(p AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*), 6)
      |    AS avg_p,
      |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
      |  ROUND(CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(32,12))) AS DOUBLE)
      |    / COUNT(*), 6) AS brier
      |FROM s GROUP BY 1 ORDER BY bin""".stripMargin

  /** q226: operating-point sweep — confusion counts and P/R/F1 at nine
    * thresholds, computed in ONE pass via a constant ×9 threshold
    * explode into a 9-group aggregate (not nine scans). F1 comes from
    * the integer identity 2tp/(2tp+fp+fn), so the only doubles are the
    * three final divisions. Precision is NULL by contract when nothing
    * is predicted positive (ANSI division never fires).
    */
  def q226ThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ts = array((1L to 9L).map(lit): _*)
    val g = scored(spark, dir)
      .select($"p", $"y", explode(ts).as("t"))
      .groupBy($"t")
      .agg(
        sum(when($"p" >= $"t" / 10.0 && $"y" === 1, 1L).otherwise(0L)).as("tp"),
        sum(when($"p" >= $"t" / 10.0 && $"y" === 0, 1L).otherwise(0L)).as("fp"),
        sum(when($"p" < $"t" / 10.0 && $"y" === 1, 1L).otherwise(0L)).as("fn"),
        sum(when($"p" < $"t" / 10.0 && $"y" === 0, 1L).otherwise(0L)).as("tn"))
    g.select($"t", $"tp", $"fp", $"fn", $"tn",
        when($"tp" + $"fp" > 0,
          round($"tp".cast("double") / ($"tp" + $"fp"), 6)).as("precision"),
        round($"tp".cast("double") / ($"tp" + $"fn"), 6).as("recall"),
        round($"tp" * 2.0 / ($"tp" * 2 + $"fp" + $"fn"), 6).as("f1"))
      .orderBy($"t")
  }

  val q226Sql: String =
    s"""WITH s AS ($scoredSql),
      |e AS (SELECT p, y, UNNEST([1,2,3,4,5,6,7,8,9]) AS t FROM s),
      |g AS (
      |  SELECT CAST(t AS BIGINT) AS t,
      |    SUM(CASE WHEN p >= t/10.0 AND y = 1 THEN 1 ELSE 0 END) AS tp,
      |    SUM(CASE WHEN p >= t/10.0 AND y = 0 THEN 1 ELSE 0 END) AS fp,
      |    SUM(CASE WHEN p <  t/10.0 AND y = 1 THEN 1 ELSE 0 END) AS fn,
      |    SUM(CASE WHEN p <  t/10.0 AND y = 0 THEN 1 ELSE 0 END) AS tn
      |  FROM e GROUP BY 1)
      |SELECT t, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
      |  CASE WHEN tp + fp > 0
      |    THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
      |  ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
      |  ROUND(tp * 2.0 / (tp * 2 + fp + fn), 6) AS f1
      |FROM g ORDER BY t""".stripMargin

  val queries: Seq[(String, Q)] = Seq(
    "q224_auc_card" -> (q224AucCard _),
    "q225_calibration_card" -> (q225CalibrationCard _),
    "q226_threshold_sweep" -> (q226ThresholdSweep _))

  val oracles: Seq[(String, String)] = Seq(
    "q224_auc_card" -> q224Sql,
    "q225_calibration_card" -> q225Sql,
    "q226_threshold_sweep" -> q226Sql)
}
