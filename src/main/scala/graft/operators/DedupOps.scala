package graft.operators

import graft.Util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — the dedup surface of a
  * training-data pipeline: exact (hash groupBy), MinHash signatures,
  * MinHash-LSH banding (shingle → minhash → band → bucket join), n-gram
  * Jaccard, and SimHash fingerprints.
  *
  * Determinism across engines: the hash family is 8-hex-char slices of
  * `md5(shingle)` (seeds 0–3) and `md5('x' || shingle)` (seeds 4–7) —
  * lexicographic min of a fixed slice of a uniform hex digest is a valid
  * minwise hash and is identical in Spark and DuckDB, so signatures (and
  * therefore LSH buckets) hash-match the oracle exactly.
  *
  * Scale: the whole point of MinHash-LSH is that candidate generation is
  * an equi-join on (band, signature) — no n² pair enumeration. The only
  * skew risk is a hot LSH bucket; the direct n-gram variant additionally
  * drops stop-shingles (doc frequency > 100) like any production pipeline.
  *
  * Note for library callers: the query builders cache intermediates
  * (shingle/candidate tables) for intra-query reuse and do not unpersist
  * (the result is still lazy when they return). The harness entry points
  * clear the cache manager between queries; long-lived sessions embedding
  * these queries should do the same.
  */
object DedupOps {

  private val NumSeeds = 8
  private val BandRows = 4 // 2 bands × 4 rows

  /** Distinct 4-word shingles per doc. */
  private def shingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // documents is a single small file (1 scan task); spread the rows
    // before the explode/md5-heavy narrow work so it runs on all cores
    table(spark, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 4)
      .select($"doc_id",
        explode(expr("transform(sequence(1, size(toks) - 3), i -> array_join(slice(toks, i, 4), ' '))")).as("sh"))
      .distinct()
  }

  private val shinglesSql: String =
    """SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(toks) - 2),
      |      i -> array_to_string(toks[i:i+3], ' '))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 4""".stripMargin

  /** MinHash signatures: per (doc, seed), min over shingles of an
    * 8-hex-char slice of md5 — seeds 0–3 slice md5(sh), seeds 4–7 slice
    * md5('x'|sh), so each shingle row computes TWO digests instead of
    * eight (a min over any fixed slice of a uniform hash is a valid
    * minwise signature). NumSeeds parallel min-aggregates (map-side
    * partial agg, no seed-explosion shuffle), then unpivoted to
    * (doc, seed, minhash) rows.
    */
  private def minhashesOf(sh: DataFrame): DataFrame = {
    val minCols = (0 until NumSeeds).map { s =>
      val src = if (s < 4) md5(col("sh")) else md5(concat(lit("x"), col("sh")))
      min(substring(src, (s % 4) * 8 + 1, 8)).as(s"m$s")
    }
    val stackArgs = (0 until NumSeeds).map(s => s"${s}L, m$s").mkString(", ")
    sh.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        expr(s"stack($NumSeeds, $stackArgs) AS (seed, minhash)"))
  }

  private def minhashes(spark: SparkSession, dir: String): DataFrame =
    minhashesOf(shingles(spark, dir))

  private val minhashesSql: String =
    s"""SELECT doc_id, s AS seed,
       |    MIN(substring(CASE WHEN s < 4 THEN md5(sh) ELSE md5('x' || sh) END,
       |        CAST((s % 4) * 8 + 1 AS INT), 8)) AS minhash
       |  FROM sh, unnest(range(0, $NumSeeds)) AS se(s)
       |  GROUP BY doc_id, s""".stripMargin

  /** q37: exact dedup stats — hash-groupBy distinct texts per source. */
  def q37DedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5($"text")).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(md5($"text"))).as("n_exact_dups"))
      .orderBy($"source")
  }

  val q37Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(text)) AS n_distinct_texts,
      |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q38: MinHash signature table (doc × 8 seeds). */
  def q38MinhashSigs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashes(spark, dir)
      .select($"doc_id", $"seed".cast("long").as("seed"), $"minhash")
      .orderBy($"doc_id", $"seed")
  }

  val q38Sql: String =
    s"""WITH sh AS ($shinglesSql)
       |SELECT doc_id, s AS seed,
       |  MIN(substring(CASE WHEN s < 4 THEN md5(sh) ELSE md5('x' || sh) END,
       |      CAST((s % 4) * 8 + 1 AS INT), 8)) AS minhash
       |FROM sh, unnest(range(0, $NumSeeds)) AS se(s)
       |GROUP BY doc_id, s ORDER BY doc_id, seed""".stripMargin

  /** q39: MinHash-LSH candidate pairs — band the signatures, equi-join on
    * (band, band signature), then verify candidates with exact Jaccard
    * over the shingle sets.
    */
  def q39LshPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lshPairs(spark, dir).orderBy($"doc_a", $"doc_b")
  }

  /** LSH candidate pairs with verified Jaccard (unordered) — shared by
    * q39 (pair listing) and q55 (cluster construction).
    */
  private def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The shingle set feeds signature building, sizes, and the verify
    // join — cache it once instead of recomputing the explode+distinct
    // chain three times.
    val sh = shingles(spark, dir).cache()
    val bandSigs = minhashesOf(sh)
      .withColumn("band", expr(s"seed div $BandRows"))
      .groupBy($"doc_id", $"band")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(seed, minhash))), x -> x.minhash), ',')").as("band_sig"))
    val a = bandSigs.select($"band", $"band_sig", $"doc_id".as("doc_a"))
    val b = bandSigs.select($"band", $"band_sig", $"doc_id".as("doc_b"))
    val cands = a.join(b, Seq("band", "band_sig"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
      .cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    // candidate set is tiny → broadcast it through the verify joins so the
    // full shingle index is streamed once, never shuffled
    val inter = broadcast(broadcast(cands)
        .join(sh.select($"doc_id".as("doc_a"), $"sh"), "doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_inter"))
    broadcast(cands.join(inter, Seq("doc_a", "doc_b"), "left_outer")
        .na.fill(0L, Seq("n_inter")))
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"n_inter",
        ($"n_inter" / ($"n_a" + $"n_b" - $"n_inter")).as("jaccard"))
  }

  val q39Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |mh AS ($minhashesSql),
       |bands AS (
       |  SELECT doc_id, seed // $BandRows AS band,
       |    string_agg(minhash, ',' ORDER BY seed) AS band_sig
       |  FROM mh GROUP BY doc_id, seed // $BandRows),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
       |  WHERE a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT c.doc_a, c.doc_b, COALESCE(i.n_inter, 0) AS n_inter,
       |  COALESCE(i.n_inter, 0) / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)) AS jaccard
       |FROM cands c
       |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |JOIN sizes za ON za.doc_id = c.doc_a
       |JOIN sizes zb ON zb.doc_id = c.doc_b
       |ORDER BY c.doc_a, c.doc_b""".stripMargin

  /** q40: direct n-gram Jaccard — candidates are pairs sharing at least
    * one non-stop shingle (doc frequency ≤ 100), verified with exact
    * Jaccard ≥ 0.2.
    */
  def q40NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = shingles(spark, dir).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    // Pair generation without a self-join: group the inverted index by
    // shingle and explode doc-pairs from each (non-stop) posting list —
    // one shuffle on sh instead of shuffling the whole index twice.
    val inter = sh.groupBy($"sh").agg(collect_list($"doc_id").as("docs"))
      .filter(size($"docs") <= 100 && size($"docs") >= 2)
      .select(explode($"docs").as("doc_a"), $"docs")
      .select($"doc_a", explode(expr("filter(docs, d -> d > doc_a)")).as("doc_b"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(sizes.select($"doc_id".as("doc_a"), $"n_sh".as("n_a")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n_sh".as("n_b")), "doc_b")
      .withColumn("jaccard", $"n_shared" / ($"n_a" + $"n_b" - $"n_shared"))
      .filter($"jaccard" >= 0.2)
      .select($"doc_a", $"doc_b", $"n_shared", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  val q40Sql: String =
    s"""WITH sh AS ($shinglesSql),
       |rare AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 100),
       |shr AS (SELECT s.* FROM sh s JOIN rare r ON s.sh = r.sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |  FROM shr a JOIN shr b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, n_shared,
       |  n_shared / (za.n_sh + zb.n_sh - n_shared) AS jaccard
       |FROM inter
       |JOIN sizes za ON za.doc_id = doc_a
       |JOIN sizes zb ON zb.doc_id = doc_b
       |WHERE n_shared / (za.n_sh + zb.n_sh - n_shared) >= 0.2
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q41: 64-bit SimHash fingerprints — per distinct token, md5's first 16
    * nibbles vote ±1 on each of 64 bit positions; the sign vector packs
    * back into a 16-nibble hex fingerprint.
    */
  def q41Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tokens = table(spark, dir, "documents")
      .repartition(col("doc_id"))
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
      .filter($"tok" =!= "")
      .withColumn("h", md5($"tok"))
    val votes = tokens
      .select($"doc_id", $"h", explode(sequence(lit(0), lit(15))).as("p"))
      .withColumn("v", expr("position(substr(h, p + 1, 1), '0123456789abcdef') - 1"))
      .select($"doc_id", $"p", $"v", explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("contrib", expr("2 * (shiftright(v, b) & 1) - 1"))
    val bits = votes.groupBy($"doc_id", $"p", $"b")
      .agg(sum($"contrib").as("s"))
      .withColumn("fbit", when($"s" > 0, 1).otherwise(0))
    val nibbles = bits.groupBy($"doc_id", $"p")
      .agg(sum(expr("shiftleft(fbit, b)")).as("nib"))
      .withColumn("ch", expr("substr('0123456789abcdef', CAST(nib AS INT) + 1, 1)"))
    nibbles.groupBy($"doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(p, ch))), x -> x.ch), '')").as("simhash64"))
      .orderBy($"doc_id")
  }

  val q41Sql: String =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |votes AS (
      |  SELECT doc_id, p, b,
      |    2 * (((strpos('0123456789abcdef', substring(md5(tok), CAST(p + 1 AS INT), 1)) - 1) >> b) & 1) - 1 AS contrib
      |  FROM toks, unnest(range(0, 16)) AS pp(p), unnest(range(0, 4)) AS bb(b)
      |  WHERE tok <> ''),
      |bits AS (
      |  SELECT doc_id, p, b, CASE WHEN SUM(contrib) > 0 THEN 1 ELSE 0 END AS fbit
      |  FROM votes GROUP BY doc_id, p, b),
      |nibbles AS (
      |  SELECT doc_id, p, substring('0123456789abcdef', CAST(SUM(fbit << b) AS INT) + 1, 1) AS ch
      |  FROM bits GROUP BY doc_id, p)
      |SELECT doc_id, string_agg(ch, '' ORDER BY p) AS simhash64
      |FROM nibbles GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q55: dedup clustering — connected components over the near-dup
    * graph (LSH pairs with Jaccard ≥ 0.5), keeping the min-doc_id
    * representative per cluster.
    *
    * The edge set is sparse BY CONSTRUCTION (LSH banding emits only
    * near-duplicate candidates, orders of magnitude smaller than the
    * corpus), so components resolve in one pass: gather the edges onto
    * one partition and run union-find inside `mapPartitions` — a single
    * narrow job, no driver collect, no per-iteration scheduling latency.
    * (Join-iterated min-label propagation measured 10–100× slower here:
    * each propagation round is a full Spark job over a tiny frame. Past
    * ~10^8 candidate edges the right tool is an iterative large-star/
    * small-star CC; the cutover is an edge-count check away.)
    * Result is order-independent: union-by-min-root yields the same
    * component minima for any edge order. Oracle: recursive-CTE
    * transitive closure.
    */
  def q55DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = lshPairs(spark, dir)
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b")
    val comps = pairs.as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        // iterative find with full path compression — recursion would
        // overflow the stack on a pathological chain (one hot LSH bucket
        // can link 10^4+ docs)
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keysIterator.map(d => (d, find(d))).toSeq.iterator
      }
      .toDF("doc_id", "cluster")
    val sizes = comps.groupBy($"cluster").agg(count(lit(1)).as("cluster_size"))
    comps.join(broadcast(sizes), "cluster")
      .select($"doc_id", $"cluster", $"cluster_size",
        ($"doc_id" === $"cluster").as("is_keeper"))
      .orderBy($"doc_id")
  }

  val q55Sql: String =
    s"""WITH RECURSIVE sh AS ($shinglesSql),
       |mh AS ($minhashesSql),
       |bands AS (
       |  SELECT doc_id, seed // $BandRows AS band,
       |    string_agg(minhash, ',' ORDER BY seed) AS band_sig
       |  FROM mh GROUP BY doc_id, seed // $BandRows),
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
       |  WHERE a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |  GROUP BY c.doc_a, c.doc_b),
       |pairs AS (
       |  SELECT i.doc_a, i.doc_b FROM inter i
       |  JOIN sizes za ON za.doc_id = i.doc_a
       |  JOIN sizes zb ON zb.doc_id = i.doc_b
       |  WHERE i.n_inter / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5),
       |nodes AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs)),
       |edges2 AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |  UNION SELECT doc_id, doc_id FROM nodes),
       |reach AS (
       |  SELECT a, b FROM edges2
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges2 e ON r.b = e.a),
       |members AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a)
       |SELECT m.doc_id, m.cluster, CAST(s.cnt AS BIGINT) AS cluster_size,
       |  (m.doc_id = m.cluster) AS is_keeper
       |FROM members m
       |JOIN (SELECT cluster, COUNT(*) AS cnt FROM members GROUP BY cluster) s
       |  USING (cluster)
       |ORDER BY m.doc_id""".stripMargin

  val queries: Seq[(String, Q)] = Seq(
    "q55_dedup_clusters" -> (q55DedupClusters _),
    "q37_dedup_exact" -> (q37DedupExact _),
    "q38_minhash_sigs" -> (q38MinhashSigs _),
    "q39_lsh_pairs" -> (q39LshPairs _),
    "q40_ngram_jaccard" -> (q40NgramJaccard _),
    "q41_simhash" -> (q41Simhash _))

  val oracles: Seq[(String, String)] = Seq(
    "q55_dedup_clusters" -> q55Sql,
    "q37_dedup_exact" -> q37Sql,
    "q38_minhash_sigs" -> q38Sql,
    "q39_lsh_pairs" -> q39Sql,
    "q40_ngram_jaccard" -> q40Sql,
    "q41_simhash" -> q41Sql)
}
