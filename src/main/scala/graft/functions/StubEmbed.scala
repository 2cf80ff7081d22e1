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
  * identical for identical text — is satisfied by a hash-based stand-in:
  * each whitespace token seeds a splitmix64 stream from its md5, the
  * streams' [-1,1] draws sum per component, and the result is
  * L2-normalized. Swap this expression for a real-model UDF without
  * touching any consumer (same column type as `embeddings.embedding`).
  *
  * Bag-of-words by construction: token order does not matter, shared
  * vocabulary ⇒ high cosine — enough structure for the retrieval
  * pipeline to be testable offline.
  */
case class StubEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val ws = "\\s+".r

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim.toLowerCase
    val acc = new Array[Double](dim)
    if (text.nonEmpty) {
      val md = java.security.MessageDigest.getInstance("MD5")
      for (tok <- ws.split(text)) {
        val d = md.digest(tok.getBytes("UTF-8"))
        var seed = java.nio.ByteBuffer.wrap(d).getLong
        var j = 0
        while (j < dim) {
          seed = splitmix64(seed)
          // map to [-1, 1)
          acc(j) += (seed >>> 11).toDouble / (1L << 52).toDouble - 1.0
          j += 1
        }
      }
    }
    val norm = math.sqrt(acc.map(v => v * v).sum)
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) {
      out(j) = java.lang.Float.valueOf(
        if (norm == 0) 0.0f else (acc(j) / norm).toFloat)
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
