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
  * Shape: each document's distinct shingle SET is a per-row array built
  * with higher-order functions, so shingling, minhashing, and banding are
  * all narrow (one codegen stage per doc, embarrassingly parallel); the
  * only wide ops are the tiny (band, band_sig) bucket groupBy and the
  * final sort. Candidate verification intersects the two shingle arrays
  * in place via broadcast joins — the shingle data itself never shuffles.
  */
object DedupOps {

  private val NumSeeds = 8
  private val BandRows = 4 // 2 bands × 4 rows

  /** Per-doc distinct 4-word shingle array + its cardinality — fully
    * narrow, one codegen'd pass per document via the native
    * [[graft.functions.TextShingles]] expression. `repartition(doc_id)`
    * only spreads the single-file scan across cores before the
    * shingle-heavy projection. A doc has ≥1 shingle iff it has ≥4
    * tokens, so `size > 0` is exactly the oracle's `len(toks) >= 4`.
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.ShingleFunctions.register(spark)
    table(spark, dir, "documents")
      .repartition(col("doc_id"))
      .select($"doc_id",
        graft.functions.ShingleFunctions.textShingles($"text", 4).as("sh_arr"))
      .filter(size($"sh_arr") > 0)
      .withColumn("n_sh", size($"sh_arr").cast("long"))
  }

  private val shinglesSql: String =
    """SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(toks) - 2),
      |      i -> array_to_string(toks[i:i+3], ' '))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 4""".stripMargin

  /** Wide minhash columns m0..m7 per doc: min over the shingle array of
    * an 8-hex-char slice of md5 — seeds 0–3 slice md5(sh), seeds 4–7
    * slice md5('x'|sh), so each shingle computes TWO digests instead of
    * eight (a min over any fixed slice of a uniform hash is a valid
    * minwise signature). The native [[graft.functions.MinHashSigs]]
    * expression computes all 8 mins in one codegen'd pass — zero
    * shuffles, zero intermediate arrays.
    */
  private def minhashWide(doc: DataFrame): DataFrame = {
    val withSigs = doc.withColumn("sigs",
      graft.functions.ShingleFunctions.minhashSigs(col("sh_arr")))
    val mins = (0 until NumSeeds).map(s => col("sigs").getItem(s).as(s"m$s"))
    withSigs.select(col("doc_id") +: col("n_sh") +: mins: _*)
  }

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

  /** q38: MinHash signature table (doc × 8 seeds) — narrow per-doc wide
    * signature unpivoted with `stack`; the only wide op is the output sort.
    */
  def q38MinhashSigs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stackArgs = (0 until NumSeeds).map(s => s"${s}L, m$s").mkString(", ")
    minhashWide(docShingles(spark, dir))
      .select($"doc_id", expr(s"stack($NumSeeds, $stackArgs) AS (seed, minhash)"))
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
    val doc = docShingles(spark, dir)
    // band signature = the 4 seed minhashes of the band joined in seed
    // order; stack unpivots the wide row to (doc_id, band, band_sig) —
    // still narrow, and the shuffle that follows carries only those three
    // small columns (never the shingle arrays)
    val bands = minhashWide(doc).select(
      $"doc_id",
      expr("stack(2, 0L, concat_ws(',', m0, m1, m2, m3), 1L, concat_ws(',', m4, m5, m6, m7)) AS (band, band_sig)"))
    // pair generation without a self-join: bucket the signatures and
    // explode ordered pairs from each bucket's posting list (a bucket is
    // a set of mutually-near-duplicate docs, so lists stay short; one hot
    // bucket at extreme scale would call for a posting-list length cap)
    val cands = bands.groupBy($"band", $"band_sig")
      .agg(collect_list($"doc_id").as("docs"))
      .filter(size($"docs") >= 2)
      .select(explode($"docs").as("doc_a"), $"docs")
      .select($"doc_a", explode(expr("filter(docs, d -> d > doc_a)")).as("doc_b"))
      .distinct()
    // verify: pull each pair's two shingle arrays side by side via two
    // broadcast joins (candidates are tiny) and intersect in place — the
    // full shingle data is only ever scanned, never shuffled
    val aSide = doc.select($"doc_id".as("doc_a"), $"sh_arr".as("a_arr"), $"n_sh".as("n_a"))
    val bSide = doc.select($"doc_id".as("doc_b"), $"sh_arr".as("b_arr"), $"n_sh".as("n_b"))
    val withA = aSide.join(broadcast(cands), "doc_a")
    bSide.join(broadcast(withA), "doc_b")
      .withColumn("n_inter", expr("CAST(size(array_intersect(a_arr, b_arr)) AS BIGINT)"))
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
    val doc = docShingles(spark, dir)
    // the inverted index (sh → docs) comes from a narrow explode of the
    // per-doc distinct shingle arrays — no pre-distinct shuffle needed.
    // Pair generation without a self-join: group by shingle and explode
    // doc-pairs from each (non-stop) posting list. Each posting carries
    // its doc's shingle count, so the Jaccard denominator needs no size
    // joins afterwards — one shuffle for the index, one for the pair agg.
    val sh = doc.select(struct($"doc_id", $"n_sh").as("d"), explode($"sh_arr").as("sh"))
    sh.groupBy($"sh").agg(collect_list($"d").as("docs"))
      .filter(size($"docs") <= 100 && size($"docs") >= 2)
      .select(explode($"docs").as("a"), $"docs")
      .select($"a.doc_id".as("doc_a"), $"a.n_sh".as("n_a"),
        explode(expr("filter(docs, d -> d.doc_id > a.doc_id)")).as("b"))
      .select($"doc_a", $"n_a", $"b.doc_id".as("doc_b"), $"b.n_sh".as("n_b"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(count(lit(1)).as("n_shared"))
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
