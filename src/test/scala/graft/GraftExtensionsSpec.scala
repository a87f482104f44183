package graft

import graft.functions.{HashFunctions, TextFunctions}
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API expressions") {
    GraftExtensions.register(spark)
    Seq(("a", "the quick brown fox jumps over it")).toDF("id", "text")
      .createOrReplaceTempView("gx_docs")
    val viaSql = spark.sql(
      """SELECT graft_minhash(text, 128, 5, 42) AS mh, graft_simhash(text, 2) AS sh,
                graft_xxhash64(text, 0) AS xx, graft_rolling_hash(text) AS rh
         FROM gx_docs""").head()
    val viaApi = spark.table("gx_docs").select(
      HashFunctions.minhash(col("text"), 128, 5, 42L).as("mh"),
      HashFunctions.simhash64(col("text"), 2).as("sh"),
      HashFunctions.xxhash64Seed0(col("text")).as("xx"),
      HashFunctions.rollingHash64(col("text")).as("rh")).head()
    assert(viaSql.getSeq[Long](0) == viaApi.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaApi.getLong(1))
    assert(viaSql.getLong(2) == viaApi.getLong(2))
    assert(viaSql.getLong(3) == viaApi.getLong(3))

    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("gx_vecs")
    val cosSql = spark.sql("SELECT graft_cosine_sim(a, b) FROM gx_vecs").head().getDouble(0)
    val cosApi = spark.table("gx_vecs")
      .select(HashFunctions.cosineSim(col("a"), col("b"))).head().getDouble(0)
    assert(cosSql == cosApi)
    val l2Sql = spark.sql("SELECT graft_l2_sq(a, b) FROM gx_vecs").head().getDouble(0)
    val l2Api = spark.table("gx_vecs")
      .select(HashFunctions.l2Sq(col("a"), col("b"))).head().getDouble(0)
    assert(l2Sql == l2Api && l2Sql == 8.0) // (1-3)^2 + 0 + (3-1)^2
    val entSql = spark.sql("SELECT graft_char_entropy(text) FROM gx_docs").head().getDouble(0)
    val entApi = spark.table("gx_docs")
      .select(HashFunctions.charEntropy(col("text"))).head().getDouble(0)
    assert(entSql == entApi && entSql > 0.0)
    val sbSql = spark.sql("SELECT graft_sign_buckets(a, 8, 7, 2) FROM gx_vecs")
      .head().getSeq[Long](0)
    val sbApi = spark.table("gx_vecs")
      .select(HashFunctions.signBuckets(col("a"), 8, 7L, 2)).head().getSeq[Long](0)
    assert(sbSql == sbApi && sbSql.size == 2)
    val csSql = spark.sql("SELECT graft_char_shingles(text, 5) FROM gx_docs")
      .head().getSeq[Long](0)
    val csApi = spark.table("gx_docs")
      .select(HashFunctions.charShingleHashes(col("text"), 5)).head().getSeq[Long](0)
    assert(csSql == csApi && csSql.nonEmpty)
    val drSql = spark.sql("SELECT graft_deflate_ratio(text) FROM gx_docs")
      .head().getDouble(0)
    val drApi = spark.table("gx_docs")
      .select(HashFunctions.deflateRatio(col("text"))).head().getDouble(0)
    assert(drSql == drApi && drSql > 0.0)
  }

  test("withExtensions injection works at session build time") {
    // verify the builder-based path compiles/initializes; reuse the live
    // session's registry via the extension object instead of a 2nd session
    val e = new GraftExtensions
    assert(GraftExtensions.builders.map(_._1).toSet ==
      Set("graft_minhash", "graft_simhash", "graft_xxhash64", "graft_rolling_hash",
        "graft_nfkc", "graft_cosine_sim", "graft_l2_sq", "graft_char_entropy",
        "graft_max_multiplicity", "graft_sign_buckets", "graft_char_shingles",
        "graft_span_fingerprints", "graft_deflate_ratio"))
  }

  test("graft_span_fingerprints matches the Column-API span kernel") {
    spark.sql("SELECT 1").count() // session live
    GraftExtensions.register(spark)
    Seq((1L, "a b c d e"), (2L, "too short"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text").createOrReplaceTempView("gx_span")
    val sql = spark.sql(
      "SELECT id, graft_span_fingerprints(text, 3) AS fp FROM gx_span")
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1).map(_.toSeq)).toMap
    val api = spark.table("gx_span")
      .select(col("id"), graft.operators.Dedup.spanFingerprints(col("text"), 3).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1).map(_.toSeq)).toMap
    assert(sql == api)
    assert(sql(1L).size == 3 && sql(1L).forall(_.size == 16)) // 5 toks, w=3
    assert(sql(2L).isEmpty && sql(3L).isEmpty) // short + null -> no windows
  }

  test("pure-SQL near-dedup: banding + verify + recursive-CTE closure") {
    // The WHOLE near-dedup pipeline expressed in the SQL dialect:
    // graft_minhash -> LSH banding (builtin xxhash64 over signature
    // slices, the bandRows convention) -> exact char-5gram Jaccard
    // verify -> transitive closure via Spark 4's recursive CTE ->
    // min-id canonical keep. Matches Dedup.minhashVerifiedPairs +
    // ConnectedComponents semantics on a planted corpus.
    //
    // DIALECT DEMO, deliberately NOT a driver gate: Spark recursion
    // is UNION ALL-only, so closure must enumerate depth-capped walks
    // (guarded to origin-root < next node for termination) — walk
    // count grows exponentially with component density (measured: the
    // sf0.1 template corpus exceeds the engine's 1M recursion row
    // limit). The scale path for closure is the distributed
    // alternating-star ConnectedComponents every x-gate uses; this
    // spec pins that the DIALECT can express the whole pipeline on
    // bounded-diameter graphs.
    GraftExtensions.register(spark)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val alt = (1 to 60).map(i => s"alt$i").mkString(" ")
    Seq(
      (1L, base), (2L, base + " tiny suffix"), (3L, base + " other tail"),
      (4L, alt), (5L, alt + " x"), (6L, "wholly unrelated text here")
    ).toDF("doc_id", "text").createOrReplaceTempView("gxsql_docs")
    val edges = spark.sql(
      """WITH
        |n AS (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ')) AS t
        |      FROM gxsql_docs),
        |sig AS (SELECT doc_id, graft_minhash(t, 128, 5, 42) AS sg FROM n),
        |band AS (SELECT doc_id, b.band_id, b.bh
        |  FROM sig LATERAL VIEW explode(transform(sequence(0, 31),
        |    i -> named_struct('band_id', i,
        |      'bh', xxhash64(i, slice(sg, i*4+1, 4))))) AS b),
        |cand AS (SELECT DISTINCT a.doc_id AS src, c.doc_id AS dst
        |  FROM band a JOIN band c
        |    ON a.band_id = c.band_id AND a.bh = c.bh AND a.doc_id < c.doc_id),
        |g AS (SELECT doc_id, array_distinct(CASE WHEN length(t) < 5 THEN array(t)
        |    ELSE transform(sequence(1, length(t) - 4), i -> substring(t, i, 5))
        |  END) AS gs FROM n),
        |verified AS (SELECT src, dst FROM cand
        |  JOIN g ga ON ga.doc_id = src JOIN g gb ON gb.doc_id = dst
        |  WHERE size(array_intersect(ga.gs, gb.gs)) * 1.0
        |      / size(array_distinct(concat(ga.gs, gb.gs))) >= 0.8)
        |SELECT src AS a, dst AS b FROM verified
        |UNION ALL SELECT dst, src FROM verified""".stripMargin)
      .localCheckpoint(true) // materialize: recursion re-evaluates its inputs per step
    edges.createOrReplaceTempView("gxsql_und")
    val kept = spark.sql(
      """WITH RECURSIVE reach(node, r, d) AS (
        |  SELECT doc_id, doc_id, 0 FROM gxsql_docs
        |  UNION ALL
        |  SELECT u.b, reach.r, reach.d + 1 FROM reach
        |    JOIN gxsql_und u ON u.a = reach.node
        |  WHERE reach.r < u.b AND reach.d < 20),
        |root AS (SELECT node, min(r) AS root FROM reach GROUP BY node)
        |SELECT node AS doc_id FROM root WHERE root = node ORDER BY doc_id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    // {1,2,3} chain-cluster to 1; {4,5} to 4; 6 alone
    assert(kept == Seq(1L, 4L, 6L))
  }
}
