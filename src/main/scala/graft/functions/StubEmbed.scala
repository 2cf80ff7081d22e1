package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic stub text embedder (SURVEY §2.9 X5).
  *
  * The reference embeds bill text through an external model
  * (hydrate_vectors.py:91-95); that call is out of engine scope, so the
  * engine-side contract — a dense unit-norm float vector per document,
  * identical for identical text — is satisfied by a hash-based stand-in.
  * Swap this expression for a real-model UDF without touching any
  * consumer (same column type as `embeddings.embedding`).
  *
  * Derivation (round 6 — the HashVector md5-window family, so the v4 /
  * x7c oracles can reproduce every float exactly; the previous
  * splitmix64 chain was 64 sequential wraparound multiplies per token,
  * SQL-hostile): component j of token t is the unsigned 32-bit
  * big-endian window j%4 of md5("t:" + j/4), centered by subtracting
  * 2^31. Those PER-TOKEN INTEGERS sum exactly (longs — order-free,
  * unlike doubles), divide once by 2^32, and the double vector is
  * L2-normalized and rounded to float32. Every step is mirrored
  * verbatim in DuckDB (SparkEntry's v4 oracle): HUGEINT sum of the
  * same md5 windows, one division, ordered-fold norm, CAST AS REAL.
  *
  * Bag-of-words by construction: token order does not matter, shared
  * vocabulary ⇒ high cosine — enough structure for the retrieval
  * pipeline to be testable offline.
  */
case class StubEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // explicit class, not \s+: Java \s includes U+000B where RE2 (the
  // oracle's regexp_split_to_array dialect) does not — the same
  // whitespace-divergence fix RollingFingerprint carries
  @transient private lazy val ws = "[\\t\\n\\f\\r ]+".r

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
      .toLowerCase(java.util.Locale.ROOT)
    val acc = new Array[Long](dim)
    if (text.nonEmpty) {
      val md = java.security.MessageDigest.getInstance("MD5")
      for (tok <- ws.split(text) if tok.nonEmpty) {
        var j = 0
        var block = 0
        while (j < dim) {
          val d = md.digest(s"$tok:$block".getBytes("UTF-8"))
          var w = 0
          while (w < 4 && j < dim) {
            val u = ((d(4 * w) & 0xffL) << 24) | ((d(4 * w + 1) & 0xffL) << 16) |
              ((d(4 * w + 2) & 0xffL) << 8) | (d(4 * w + 3) & 0xffL)
            acc(j) += u - 2147483648L
            j += 1
            w += 1
          }
          block += 1
        }
      }
    }
    val raw = new Array[Double](dim)
    var j = 0
    while (j < dim) { raw(j) = acc(j).toDouble / 4294967296.0; j += 1 }
    // left-to-right norm fold — the same operation order as the
    // oracle's list_reduce, so the doubles are bit-identical
    var ss = 0.0
    j = 0
    while (j < dim) { ss += raw(j) * raw(j); j += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Any](dim)
    j = 0
    while (j < dim) {
      out(j) = java.lang.Float.valueOf(
        if (norm == 0) 0.0f else (raw(j) / norm).toFloat)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): StubEmbed = copy(child = c)
}

object StubEmbed {
  val DefaultDim = 64
  def apply(text: Column, dim: Int = DefaultDim): Column =
    GraftShims.toCol(StubEmbed(GraftShims.toExpr(text), dim))
}
