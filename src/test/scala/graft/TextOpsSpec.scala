package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** T5 masking semantics pinned on planted strings (the fixture carries
  * no natural PII, so the operator derives it — these literals prove
  * the patterns and the global replace do what redaction requires). */
class TextOpsSpec extends SparkSpec {

  test("pii scrub masks planted emails and phones exactly") {
    import spark.implicits._
    val planted = Seq(
      ("write to alice.smith+x@sub.domain.co today",
        1, 0, "write to [EMAIL] today"),
      ("call 555-1234 or 555-9876 now",
        0, 2, "call [PHONE] or [PHONE] now"),
      ("bob@ex.org and 555-0000",
        1, 1, "[EMAIL] and [PHONE]"),
      // 7-digit run has no dash; b@c has no dotted TLD — neither is PII
      ("no pii here 5551234 b@c",
        0, 0, "no pii here 5551234 b@c")
    ).toDF("text", "e", "p", "masked")
    val rows = planted.select(
      regexp_count(col("text"), lit(TextOps.EmailPattern)).as("ne"),
      regexp_count(col("text"), lit(TextOps.PhonePattern)).as("np"),
      regexp_replace(
        regexp_replace(col("text"), TextOps.EmailPattern, "[EMAIL]"),
        TextOps.PhonePattern, "[PHONE]").as("s"),
      col("e"), col("p"), col("masked")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) === r.getInt(3), s"email count on '${r.getString(5)}'")
      assert(r.getInt(1) === r.getInt(4), s"phone count on '${r.getString(5)}'")
      assert(r.getString(2) === r.getString(5))
    }
  }

  test("pii scrub emits one row per customer with the derived occurrence counts") {
    val rows = operators.TextOps.piiScrub(spark, sfDir).collect()
    assert(rows.length === Tables.customer(spark, sfDir).count())
    rows.foreach { r =>
      val key = r.getLong(0)
      assert(r.getInt(1) === 1, s"customer $key email count")
      assert(r.getInt(2) === (key % 3).toInt, s"customer $key phone count")
    }
  }
}
