package graft

import org.apache.spark.sql.functions._
import graft.functions.StringSim

/** Property tests for the fuzzy-link scorer (SURVEY §5: token-sort-ratio
  * symmetry/bounds, name-normalization idempotence). Properties are
  * checked exhaustively over a small word lattice (no scalatestplus
  * bridge in the offline dependency set). */
class StringSimSpec extends SparkSpec {

  private def ratios(pairs: Seq[(String, String)]): Seq[Int] = {
    val df = spark.createDataFrame(pairs).toDF("a", "b")
      .select(StringSim.tokenSortRatio(col("a"), col("b")).as("r"))
    df.collect().toSeq.map(_.getInt(0))
  }
  private def ratio(a: String, b: String): Int = ratios(Seq((a, b))).head

  test("identical strings score 100") {
    assert(ratio("john smith", "john smith") === 100)
  }

  test("token order does not matter") {
    assert(ratio("smith john", "john smith") === 100)
    assert(ratio("a b c", "c a b") === 100)
  }

  test("both empty score 100, empty vs non-empty scores 0") {
    assert(ratio("", "") === 100)
    assert(ratio("", "abcdefghij") === 0)
  }

  test("whitespace runs and leading/trailing blanks are ignored") {
    assert(ratio("  john   smith ", "john smith") === 100)
  }

  test("symmetry and bounds over a word lattice") {
    val words = Seq("alpha", "beta", "gamma", "x")
    val strings = for (a <- words; b <- words) yield s"$a $b"
    val pairs = for (s1 <- strings; s2 <- strings) yield (s1, s2)
    val fwd = ratios(pairs)
    val rev = ratios(pairs.map(_.swap))
    fwd.zip(rev).zip(pairs).foreach { case ((f, r), p) =>
      assert(f === r, s"asymmetric for $p")
      assert(f >= 0 && f <= 100, s"out of bounds for $p")
    }
  }

  test("capped ratio agrees with exact ratio for scores above the floor") {
    val pairs = Seq(
      ("customer#000000042", "customer#000000042"), // 100
      ("customer#000000042", "customer#000000043"), // high
      ("customer#000000042", "customer#000099999"), // below floor → 0
      ("abc", "xyz"))                               // 0
    val df = spark.createDataFrame(pairs).toDF("a", "b").select(
      StringSim.ratioOfSorted(StringSim.tokenSort(col("a")), StringSim.tokenSort(col("b"))).as("exact"),
      StringSim.ratioOfSortedCapped(StringSim.tokenSort(col("a")), StringSim.tokenSort(col("b")), 85).as("capped"))
    df.collect().foreach { r =>
      val (exact, capped) = (r.getInt(0), r.getInt(1))
      if (exact > 85) assert(capped === exact, "capped must be exact above the floor")
      else assert(capped <= 85, s"capped $capped must not exceed the floor when exact=$exact")
    }
  }

  test("normalizeName is idempotent and strips punctuation/case/space") {
    val df = spark.createDataFrame(Seq(
      Tuple1("  Smith, John Jr.  "),
      Tuple1("GARCIA-LOPEZ, MARIA"),
      Tuple1("o'neil, pat,,,"))).toDF("name")
      .select(col("name"),
        StringSim.normalizeName(col("name")).as("n1"),
        StringSim.normalizeName(StringSim.normalizeName(col("name"))).as("n2"))
    df.collect().foreach { r =>
      assert(r.getString(1) === r.getString(2), s"not idempotent for ${r.getString(0)}")
      assert(!r.getString(1).contains(","))
      assert(!r.getString(1).contains("."))
      assert(r.getString(1) === r.getString(1).toUpperCase)
    }
  }
}
