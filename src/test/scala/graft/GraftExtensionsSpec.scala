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
  }

  test("withExtensions injection works at session build time") {
    // verify the builder-based path compiles/initializes; reuse the live
    // session's registry via the extension object instead of a 2nd session
    val e = new GraftExtensions
    assert(GraftExtensions.builders.map(_._1).toSet ==
      Set("graft_minhash", "graft_simhash", "graft_xxhash64", "graft_rolling_hash",
        "graft_nfkc", "graft_cosine_sim", "graft_l2_sq", "graft_char_entropy",
        "graft_max_multiplicity", "graft_sign_buckets", "graft_char_shingles"))
  }
}
