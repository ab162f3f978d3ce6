package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Unit checks of the declarative constraint auditor on crafted rows
  * with known violations of every constraint kind.
  */
class QualitySpec extends SparkSpec {
  import Quality._

  test("audit: every constraint kind counts its planted violations exactly") {
    import spark.implicits._
    val df = Seq(
      // (id, qty, code, ref)
      (1L, 10.0, "A", 100L),
      (2L, -5.0, "B", 100L),            // range violation, regex violation
      (2L, Double.NaN, "A", 200L),      // dup id, NaN qty (not-null violation)
      (3L, 200.0, "zz", 999L)           // range violation, regex violation, orphan ref
    ).toDF("id", "qty", "code", "ref")
    val refTable = Seq(100L, 200L).toDF("k")

    val rep = audit(df, Seq(
      NotNull("qty"),
      InRange("qty", 0, 100),
      Matches("code", "[AB]"),
      Check("code_not_zz", col("code") =!= "zz"),
      Unique(Seq("id")),
      RefIntegrity("ref", refTable, "k")))
      .collect().map(r => r.getAs[String]("constraint") ->
        (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap

    assert(rep("not_null(qty)") === ((1L, false)))             // NaN
    // -5, 200, and NaN (NaN sorts above every value on both engines)
    assert(rep("in_range(qty, 0.0, 100.0)") === ((3L, false)))
    assert(rep("matches(code)") === ((1L, false)))             // "zz"
    assert(rep("code_not_zz") === ((1L, false)))
    assert(rep("unique(id)") === ((1L, false)))                // id=2 twice -> 1 extra row
    assert(rep("ref_integrity(ref -> k)") === ((1L, false)))   // 999
  }

  test("audit: a fully-clean table passes every constraint; n_rows carried on each row") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v")
    val rep = audit(df, Seq(NotNull("v"), InRange("v", 0, 10), Unique(Seq("id"))))
      .collect()
    assert(rep.forall(_.getAs[Boolean]("pass")))
    assert(rep.forall(_.getAs[Long]("n_rows") === 2L))
    assert(rep.map(_.getAs[String]("kind")).toSet ===
      Set("not_null", "in_range", "unique"))
  }
}
