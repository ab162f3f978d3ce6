package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the skewed (large) side into
  * `saltFactor` sub-keys and replicate the small side across all salts,
  * so one hot key spreads over `saltFactor` reducers instead of melting
  * a single task. AQE's skew-join handles most cases at runtime
  * (spark.sql.adaptive.skewJoin, on by default here); this explicit form
  * is for the planned-ahead case — e.g. a known-hot partition key on a
  * 100 TB fact table — and for non-AQE-eligible join shapes.
  *
  * Salting is deterministic (hash of the whole large-side row, not
  * rand()), so results are reproducible run to run.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key` with the large side salted.
    * Result equals `large.join(small, key)` exactly; only the shuffle
    * distribution differs.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit saltFactor null-extended copies of every
    // unmatched small-side row (it was replicated per salt) — the salted
    // form is only equivalent for join types that never emit unmatched
    // small-side rows
    require(!Set("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin cannot preserve $joinType semantics (small side is replicated per salt)")
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage (salted partial → final) aggregation for a skewed group
    * key: stage 1 aggregates per (key, salt) spreading the hot key over
    * `saltFactor` reducers, stage 2 combines the partials. `aggs` must be
    * algebraic pairs (partialExpr, combineExpr over the partial column).
    * Provided for counts/sums, the common hot-key case.
    *
    * `saltCols` picks the columns hashed into the salt; default (empty) is
    * every column — always correct but hashes wide strings per row. When a
    * high-cardinality column (a PK) exists, pass just that: strictly
    * cheaper, spreads at least as well.
    */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String,
      saltFactor: Int = 8, saltCols: Seq[String] = Nil): DataFrame = {
    val hashed = (if (saltCols.nonEmpty) saltCols else df.columns.toSeq).map(col)
    val salted = df.withColumn("__salt", pmod(hash(hashed: _*), lit(saltFactor)))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum"))
  }
}
