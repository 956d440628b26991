package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType)` embeddings.
  *
  * Built on Spark's higher-order functions (`zip_with`/`aggregate`), which
  * stay inside Catalyst (no UDF serialization) and keep the surrounding plan
  * codegen-friendly. Accumulation is sequential left-to-right, which is what
  * makes the 4-decimal rounded results bit-stable against the DuckDB oracle.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as DOUBLE. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ as DOUBLE. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in [-1, 1] as DOUBLE. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Codegen'd cosine (graft.functions.expressions.CosineSimilarity) —
    * bit-equal to [[cosine]], ~20x faster on all-pairs workloads. Requires
    * GraftFunctions.register(spark) (done by graft.core.Tables.register). */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
}
