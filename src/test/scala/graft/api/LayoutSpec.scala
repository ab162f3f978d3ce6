package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing must actually buy shuffle-free joins and aggregations on
  * the bucket keys — asserted against the physical plan, and results
  * must match the unbucketed equivalents.
  */
class LayoutSpec extends SparkSpec {

  test("bucket-key join and aggregation plan with zero shuffle exchanges") {
    import spark.implicits._
    // managed tables land in the session's default warehouse; DROP TABLE
    // below removes their data (warehouse.dir is a static conf, so it
    // cannot be redirected on the shared test session)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Layout.writeBucketed(orders, "orders_b", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    Layout.writeBucketed(lineitem, "lineitem_b", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    try {
      val ob = Layout.readBucketed(spark, "orders_b")
      val lb = Layout.readBucketed(spark, "lineitem_b")

      // co-located join: both sides bucketed on the join key, same count
      val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n"))
      // disable AQE-side broadcast demotion noise: assert on the plan of
      // a sort-merge-eligible join
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val j = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
          .select(lb("l_orderkey"))
        j.count() // materialize so AQE finalizes the plan
        assert(Layout.isShuffleFree(j), j.queryExecution.executedPlan.toString)
      }

      // correctness: same result as the unbucketed join
      val expected = lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey")).count()
      val actual = lb.join(ob, lb("l_orderkey") === ob("o_orderkey")).count()
      assert(actual === expected)

      // single-table agg on the bucket key is also exchange-free
      withSQLConf() {
        val agg = lb.groupBy($"l_orderkey").agg(sum($"l_quantity"))
        agg.count()
        assert(Layout.isShuffleFree(agg), agg.queryExecution.executedPlan.toString)
      }
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("isShuffleFree rejects range, hash, and single-partition exchanges") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/orders.parquet")
    // hash exchange
    assert(!Layout.isShuffleFree(df.groupBy($"o_custkey").count()))
    // range exchange (the case the old substring check missed)
    assert(!Layout.isShuffleFree(df.orderBy($"o_orderkey")))
    // round-robin exchange (also missed by the substring check)
    assert(!Layout.isShuffleFree(df.repartition(4)))
    // global agg over a multi-partition child needs a SinglePartition
    // exchange (the scan itself is 1 partition, hence the repartition)
    assert(!Layout.isShuffleFree(df.repartition(4).agg(count(lit(1)))))
    // narrow plan really is shuffle-free
    assert(Layout.isShuffleFree(df.filter($"o_orderkey" > 100).select($"o_orderkey")))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("writeZOrdered: every file covers a 2-D tile — per-file spans shrink on BOTH columns") {
    import spark.implicits._
    // two independent uniform coordinates: a linear sort on `a` would
    // leave `b`'s per-file span at full range
    val n = 1 << 14
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % n).toLong % 1024L, (i * 40503L % n).toLong % 1024L)
    }.toDF("id", "a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val plainDir = java.nio.file.Files.createTempDirectory("plain").toString + "/t"
    Layout.writeZOrdered(df, zDir, "a", "b", numFiles = 16, bits = 10)
    df.repartition(16).write.parquet(plainDir)

    def spans(path: String): (Double, Double, Long) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max($"a") - min($"a")).as("sa"), (max($"b") - min($"b")).as("sb"))
        .agg(avg($"sa"), avg($"sb"), count(lit(1)))
        .as[(Double, Double, Long)].head()
      perFile
    }
    val (za, zb, zn) = spans(zDir)
    val (pa, pb, _) = spans(plainDir)
    info(f"per-file avg span: z-ordered a=$za%.0f b=$zb%.0f ($zn files); unordered a=$pa%.0f b=$pb%.0f")
    assert(zn === 16L)
    // a 16-file Z-layout tiles the grid 4×4: each file's span on EACH
    // column should be roughly a quarter of the range, far under the
    // unordered layout's near-full spans
    assert(za < pa * 0.5 && zb < pb * 0.5,
      f"z-order must shrink spans on both columns: a $za%.0f vs $pa%.0f, b $zb%.0f vs $pb%.0f")
    // layout changes bytes, never rows
    assert(spark.read.parquet(zDir).count() === n.toLong)
    assert(spark.read.parquet(zDir).agg(sum($"id")).as[Long].head() ===
      df.agg(sum($"id")).as[Long].head())
  }

  test("bloom sidecar: lookups are exact, prune files, and miss cleanly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nFiles = 8
    Layout.writeBloomIndexed(docs, dir, "doc_id", nFiles,
      items = 10000L, numBits = 80000L)

    // the sidecar dir must be invisible to plain data reads
    assert(spark.read.parquet(s"$dir/data").count() === docs.count())

    val ids = docs.select($"doc_id").orderBy($"doc_id").limit(5)
      .collect().map(_.getLong(0))
    var prunedAtLeastOnce = false
    ids.foreach { id =>
      val cands = Layout.bloomCandidateFiles(spark, dir, "doc_id", id)
      assert(cands.nonEmpty && cands.size <= nFiles)
      if (cands.size < nFiles) prunedAtLeastOnce = true
      val got = Layout.bloomIndexedLookup(spark, dir, "doc_id", id)
        .collect().map(_.getAs[Long]("doc_id"))
      val want = docs.filter($"doc_id" === id)
        .collect().map(_.getAs[Long]("doc_id"))
      assert(got.toSeq === want.toSeq, s"lookup $id")
    }
    // 10k-item/80k-bit filters over ~8 files: a unique key should
    // almost never fire in all 8 — if it did the index is useless
    assert(prunedAtLeastOnce, "no lookup pruned any file")

    // a key that was never written: no candidate files, empty exact result
    assert(Layout.bloomCandidateFiles(spark, dir, "doc_id", -1L).isEmpty)
    assert(Layout.bloomIndexedLookup(spark, dir, "doc_id", -1L).count() === 0L)
  }
}
