package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint auditing — the
  * expectations-style validation layer every ingest pipeline runs before
  * data is allowed downstream. A constraint set compiles into the
  * minimum number of passes:
  *
  *   - all ROW-LOCAL constraints (not-null, range, regex, custom
  *     predicate) fold into ONE aggregation over one scan — adding a
  *     constraint adds a conditional-count expression, not a pass;
  *   - each UNIQUE constraint is one hash aggregation on its key
  *     (duplicate keys = Σ(count−1) over groups seen more than once);
  *   - each REFERENTIAL constraint is one left-anti join against the
  *     referenced keys (broadcast when the key side is small, shuffle
  *     otherwise — left to Catalyst/AQE, which sees both sizes).
  *
  * The report is |constraints| rows: (constraint, kind, violations,
  * n_rows, pass) — mergeable across partitions/batches since every
  * violation count is a sum. At 100 TB the audit costs one scan plus
  * one shuffle per uniqueness/referential rule, which is the lower
  * bound for those semantics.
  */
object Quality {

  sealed trait Constraint { def name: String }

  /** Violated by NULL (and, for double columns, NaN). */
  final case class NotNull(colName: String) extends Constraint {
    def name: String = s"not_null($colName)"
  }

  /** Violated outside [lo, hi] (NULL does not violate — compose with
    * [[NotNull]] to require presence).
    */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Constraint {
    def name: String = s"in_range($colName, $lo, $hi)"
  }

  /** Violated when the (non-null) value does not fully match `regex`. */
  final case class Matches(colName: String, regex: String) extends Constraint {
    def name: String = s"matches($colName)"
  }

  /** Violated when `predicate` evaluates to false (null counts as a
    * violation — an undecidable expectation is a failed expectation).
    */
  final case class Check(name: String, predicate: Column) extends Constraint

  /** Violated by every row BEYOND the first per key: Σ max(0, n−1). */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name: String = s"unique(${cols.mkString(", ")})"
  }

  /** Violated by rows whose (non-null) `colName` has no match in
    * `ref.refCol` — the orphaned-foreign-key audit.
    */
  final case class RefIntegrity(colName: String, ref: DataFrame, refCol: String)
      extends Constraint {
    def name: String = s"ref_integrity($colName -> $refCol)"
  }

  private def violationExpr(df: DataFrame, c: Constraint): Column = c match {
    case NotNull(col0) =>
      val base = col(col0).isNull
      df.schema(col0).dataType match {
        case org.apache.spark.sql.types.DoubleType |
            org.apache.spark.sql.types.FloatType => base || isnan(col(col0))
        case _ => base
      }
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0) < lo || col(col0) > hi)
    case Matches(col0, re) =>
      col(col0).isNotNull && !col(col0).rlike("^(?:" + re + ")$")
    case Check(_, p) => !coalesce(p, lit(false))
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  /** The |constraints|-row audit report. Row order is the declaration
    * order of `constraints` (stable output for diffing two audits).
    */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = constraints.zipWithIndex.collect {
      case (c @ (_: NotNull | _: InRange | _: Matches | _: Check), i) => (c, i)
    }
    // one pass: n_rows + one conditional count per row-local constraint
    val aggs = count(lit(1)).as("__n") +: rowLocal.map { case (c, i) =>
      sum(when(violationExpr(df, c), 1L).otherwise(0L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nRows = one.getAs[Long]("__n")
    val rowLocalCounts: Map[Int, Long] =
      rowLocal.map { case (_, i) => i -> one.getAs[Long](s"__v$i") }.toMap

    val rows = constraints.zipWithIndex.map {
      case (c: Unique, _) =>
        val dups = df.groupBy(c.cols.map(col): _*).agg(count(lit(1)).as("n"))
          .filter($"n" > 1).agg(sum($"n" - 1)).collect()(0)
        (c.name, "unique", Option(dups.get(0)).fold(0L)(_.asInstanceOf[Long]))
      case (c: RefIntegrity, _) =>
        val orphans = df.select(col(c.colName)).filter(col(c.colName).isNotNull)
          .join(c.ref.select(col(c.refCol).as(c.colName)).distinct(),
            Seq(c.colName), "left_anti")
          .count()
        (c.name, "ref_integrity", orphans)
      case (c, i) =>
        val kind = c match {
          case _: NotNull => "not_null"
          case _: InRange => "in_range"
          case _: Matches => "matches"
          case _ => "check"
        }
        (c.name, kind, rowLocalCounts(i))
    }
    rows.toDF("constraint", "kind", "violations")
      .withColumn("n_rows", lit(nRows))
      .withColumn("pass", col("violations") === 0L)
  }
}
