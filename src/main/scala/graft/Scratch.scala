package graft.operators

// Throwaway local diagnostic — NEVER committed (deleted before any
// commit this round). A/Bs the pageRank setup+iteration forms on
// q133's real edge input in one JVM, steady state.
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.DataFrame
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def edges(): DataFrame = {
      val pairs = DedupOps.ppJoinGraphEdges(spark, sfDir, 0.8)
        .select(col("id_a"), col("id_b"))
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    }
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[scratch] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // the 3 symmetric iteration rounds exactly as pageRankFixedPoint
    def iters(e: DataFrame): DataFrame = {
      val baseMicros = 150000L
      def ranksOf(contrib: DataFrame): DataFrame = contrib
        .select(col("dst").as("id"),
          (lit(baseMicros) + expr("(850000 * c) div 1000000")).as("r"))
      var ranks = ranksOf(e
        .select(col("dst"), expr("1000000 div od").as("ct"))
        .groupBy(col("dst")).agg(sum(col("ct")).as("c")))
      (2 to 3).foreach { _ =>
        val contrib = e
          .join(broadcast(ranks), e("src") === ranks("id"))
          .select(col("dst"), expr("r div od").as("ct"))
          .groupBy(col("dst")).agg(sum(col("ct")).as("c"))
        ranks = ranksOf(contrib)
      }
      ranks
    }
    edges().count() // build artifact once
    import org.apache.spark.sql.expressions.Window
    for (round <- 1 to 3) {
      t(s"r$round full-new") {
        graft.api.Graph.pageRankFixedPoint(edges(), "src", "dst",
          iterations = 3, symmetric = true)
          .write.mode("overwrite").format("noop").save()
      }
      // phase split of the NEW form
      var eN: DataFrame = null
      t(s"r$round new-setup") {
        val sel = edges()
        val od = sel.groupBy(col("src")).agg(count(lit(1)).as("od"))
        val bcast = org.apache.spark.sql.internal.SQLConf.get
          .autoBroadcastJoinThreshold
        val odFits = bcast > 0 &&
          od.queryExecution.optimizedPlan.stats.sizeInBytes <= bcast
        println(s"[scratch] odFits=$odFits est=" +
          od.queryExecution.optimizedPlan.stats.sizeInBytes)
        eN = sel.join(if (odFits) broadcast(od) else od.hint("shuffle_hash"),
          Seq("src")).localCheckpoint()
        eN.select(col("src")).distinct().count(); ()
      }
      t(s"r$round new-iters") {
        iters(eN).write.mode("overwrite").format("noop").save()
      }
      // phase split of the OLD (window) form
      var eW: DataFrame = null
      t(s"r$round win-setup") {
        eW = edges()
          .withColumn("od", count(lit(1)).over(
            Window.partitionBy(col("src"))))
          .localCheckpoint()
        eW.select(col("src")).distinct().count(); ()
      }
      t(s"r$round win-iters") {
        iters(eW).write.mode("overwrite").format("noop").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
