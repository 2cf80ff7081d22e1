package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{HashVector, MinHashSig, QuantizeVec, RollingFingerprint, SimHash64, StubEmbed, TextShingles, VecDot, VecDotInt}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so a SQL-first user can call
  * them without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT text_shingles(text, 3) FROM documents")
  * spark.sql("SELECT stub_embed(text, 64) FROM documents")
  * }}}
  *
  * This is SURVEY §7.3's extension tier (c) surface — injected via the
  * sanctioned extensions hook, no session internals touched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator tier: plans graft.plans.AsofMergeJoin (the O(n+m)
    // as-of merge) — the Scala API also self-registers this strategy
    // via experimental.extraStrategies for extension-less sessions
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)

    def arity(name: String, n: Int)(args: Seq[Expression]): Unit =
      require(args.length == n, s"$name requires exactly $n arguments, got ${args.length}")

    // second args of text_shingles/stub_embed must be int literals —
    // a non-foldable column would throw an opaque unbound-attribute
    // error from eval(null), and a BIGINT literal would CCE on the cast
    def intLiteral(name: String, e: Expression): Int = {
      require(e.foldable, s"$name: the second argument must be an integer literal")
      e.eval(null) match {
        case n: Number =>
          val v = n.longValue()
          require(v > 0 && v <= Int.MaxValue,
            s"$name: the second argument must be a positive int, got $v")
          v.toInt
        case other => throw new IllegalArgumentException(
          s"$name: the second argument must be an integer literal, got $other")
      }
    }

    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays in double precision"),
      (args: Seq[Expression]) => {
        arity("vec_dot", 2)(args)
        VecDot(args(0), args(1))
      }))

    e.injectFunction((
      FunctionIdentifier("quantize_vec"),
      info("quantize_vec",
        "quantize_vec(v) - unit-norm int8 (SQ8) quantization of a float/double array; NULL for zero vectors"),
      (args: Seq[Expression]) => {
        arity("quantize_vec", 1)(args)
        QuantizeVec(args(0))
      }))

    e.injectFunction((
      FunctionIdentifier("vec_dot_int"),
      info("vec_dot_int",
        "vec_dot_int(a, b) - exact integer dot product of two int8-quantized vectors"),
      (args: Seq[Expression]) => {
        arity("vec_dot_int", 2)(args)
        VecDotInt(args(0), args(1))
      }))

    e.injectFunction((
      FunctionIdentifier("text_shingles"),
      info("text_shingles", "text_shingles(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => {
        arity("text_shingles", 2)(args)
        TextShingles(args(0), intLiteral("text_shingles", args(1)))
      }))

    e.injectFunction((
      FunctionIdentifier("stub_embed"),
      info("stub_embed", "stub_embed(text, dim) - deterministic unit-norm hash embedding"),
      (args: Seq[Expression]) => {
        arity("stub_embed", 2)(args)
        StubEmbed(args(0), intLiteral("stub_embed", args(1)))
      }))

    e.injectFunction((
      FunctionIdentifier("sim_hash"),
      info("sim_hash", "sim_hash(text, bits) - SimHash signature of whitespace tokens as a bigint"),
      (args: Seq[Expression]) => {
        arity("sim_hash", 2)(args)
        val bits = intLiteral("sim_hash", args(1))
        require(bits <= 60, s"sim_hash: bits must be <= 60 (unsigned-range bigint), got $bits")
        SimHash64(args(0), bits)
      }))

    e.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      info("rolling_fingerprint",
        "rolling_fingerprint(text, k, w) - winnowing fingerprint set (k-char windows, w-window minima)"),
      (args: Seq[Expression]) => {
        arity("rolling_fingerprint", 3)(args)
        RollingFingerprint(args(0),
          intLiteral("rolling_fingerprint", args(1)),
          intLiteral("rolling_fingerprint", args(2)))
      }))

    // the engine's standard minhash family (Dedup's seeds/modulus) — a
    // SQL caller gets the same signature the d3 tier computes
    e.injectFunction((
      FunctionIdentifier("min_hash_sig"),
      info("min_hash_sig",
        "min_hash_sig(grams) - K-way MinHash signature of a string array (engine seed family)"),
      (args: Seq[Expression]) => {
        arity("min_hash_sig", 1)(args)
        val k = graft.operators.Dedup.MinHashK
        MinHashSig(args(0),
          (0 until k).map(graft.operators.Dedup.seedA),
          (0 until k).map(graft.operators.Dedup.seedB),
          graft.operators.Dedup.MinHashP)
      }))

    e.injectFunction((
      FunctionIdentifier("hash_vector"),
      info("hash_vector",
        "hash_vector(key, dim) - deterministic md5-window double vector (engine-portable derivation)"),
      (args: Seq[Expression]) => {
        arity("hash_vector", 2)(args)
        HashVector(args(0), intLiteral("hash_vector", args(1)))
      }))
  }
}
