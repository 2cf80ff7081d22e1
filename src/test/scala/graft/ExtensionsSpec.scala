package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface suite: the custom expressions must be callable from
  * plain Spark SQL through the sanctioned extensions hook. Uses its own
  * session (extensions bind at session build time). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate returns any existing default session and silently
    // ignores withExtensions — clear it so the extensions bind (the
    // underlying SparkContext is still reused).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("vec_dot callable from SQL") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }

  test("text_shingles callable from SQL") {
    val r = spark.sql("SELECT text_shingles('a b c d', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(r === Seq("a b c", "b c d"))
  }

  test("stub_embed callable from SQL, unit norm") {
    val v = spark.sql("SELECT stub_embed('hello world', 16) AS e")
      .collect()(0).getSeq[Float](0)
    assert(v.length === 16)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("sim_hash callable from SQL, matches the Scala expression") {
    val Array(sqlSig, apiSig) = spark.sql(
      "SELECT sim_hash('the quick brown fox', 60) AS s")
      .withColumn("a", graft.operators.Dedup.simhash(
        org.apache.spark.sql.functions.lit("the quick brown fox")))
      .collect()(0).toSeq.toArray.map(_.asInstanceOf[Long])
    assert(sqlSig === apiSig)
    intercept[Exception] { spark.sql("SELECT sim_hash('x', 64)").collect() }
  }

  test("rolling_fingerprint callable from SQL, deterministic and non-empty") {
    val text = "some reasonably long text that exceeds the fingerprint window size"
    val a = spark.sql(s"SELECT rolling_fingerprint('$text', 12, 8) AS f")
      .collect()(0).getSeq[Long](0)
    val b = spark.sql(s"SELECT rolling_fingerprint('$text', 12, 8) AS f")
      .collect()(0).getSeq[Long](0)
    assert(a.nonEmpty && a === b)
    assert(a === a.sorted, "fingerprint set is emitted sorted")
  }

  test("min_hash_sig callable from SQL, matches the d3 signature expression") {
    import graft.operators.Dedup
    val k = Dedup.MinHashK
    val fromSql = spark.sql(
      "SELECT min_hash_sig(text_shingles('a b c d e', 3)) AS sig")
      .collect()(0).getSeq[Long](0)
    val fromExpr = spark.range(1).select(
      graft.functions.MinHashSig(
        graft.functions.TextShingles(org.apache.spark.sql.functions.lit("a b c d e"), 3),
        (0 until k).map(Dedup.seedA), (0 until k).map(Dedup.seedB),
        Dedup.MinHashP).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(fromSql.length === k)
    assert(fromSql === fromExpr)
  }

  test("hash_vector callable from SQL, matches the Scala expression") {
    val fromSql = spark.sql("SELECT hash_vector('k1', 8) AS v")
      .collect()(0).getSeq[Double](0)
    val fromExpr = spark.range(1).select(
      graft.functions.HashVector(org.apache.spark.sql.functions.lit("k1"), 8).as("v"))
      .collect()(0).getSeq[Double](0)
    assert(fromSql.length === 8)
    assert(fromSql === fromExpr)
  }

  test("end-to-end SQL retrieval over a registered view") {
    val root = sys.env.get("SPARK_GRAFT_SF_DIR")
      .map(d => new java.io.File(d).getParent).getOrElse("/root/testdata")
    Tables.documents(spark, s"$root/sf0.001").createOrReplaceTempView("docs")
    val top = spark.sql(
      """SELECT doc_id,
           vec_dot(stub_embed(text, 32), stub_embed('customer order filter join', 32)) AS sim
         FROM docs ORDER BY sim DESC, doc_id LIMIT 3""").collect()
    assert(top.length === 3)
    assert(top(0).getDouble(1) > 0.2)
  }

  test("quantize_vec + vec_dot_int callable from SQL, exact integer arithmetic") {
    // (3,4)/5·127 → (floor(76.2), floor(101.6)) = (76, 101)
    val s = spark.sql(
      """SELECT vec_dot_int(
           quantize_vec(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
           quantize_vec(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))) AS s""")
      .collect()(0).getLong(0)
    assert(s === 76L * 76 + 101L * 101)
    // zero vector quantizes to NULL (no direction)
    val z = spark.sql(
      "SELECT quantize_vec(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS q")
      .collect()(0)
    assert(z.isNullAt(0))
  }
}
