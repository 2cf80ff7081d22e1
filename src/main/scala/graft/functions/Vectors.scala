package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns as pure
  * higher-order-function expressions (no UDF — stays in codegen).
  *
  * All arithmetic is promoted to double BEFORE multiplying/accumulating
  * so results match engines that compute in double (and are independent
  * of the storage float width).
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double, left-to-right accumulation — the codegen'd
    * VecDot expression (the HOF formulation
    * `aggregate(zip_with(a,b,*),0d,+)` computes the same value but runs
    * interpreted, ~10× slower on pair-join hot paths). */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }
}
