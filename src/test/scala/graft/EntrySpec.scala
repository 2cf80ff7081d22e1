package graft

/** Driver-contract suite: entry() smoke, every query non-empty at the
  * smoke SF, every oracle key backed by a query. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every query returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("query output column names are unique and stable") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      assert(cols.distinct.length === cols.length, s"$name has duplicate columns")
    }
  }
}
