package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** The portable affine universal-hash family shared by MinHash signatures,
  * SimHash projections, and the hyperplane LSH planes — ONE definition so
  * the Scala operators, the codegen expressions, and the constants
  * interpolated into DuckDB oracle SQL can never drift apart.
  * h_k(x) = (a_k·x + b_k) mod P with a_k odd. */
object AffineFamily {
  val P: Long = 1000000007L
  /** Deterministic (a_k, b_k) for slot k. */
  def ab(k: Int): (Long, Long) = {
    val a = ((2862933555777941757L * (k + 1) + 3037000493L) & 0x3FFFFFFFL) | 1L
    val b = (3202034522624059733L * (k + 1) + 1234567891L) & 0x3FFFFFFFL
    (a, b)
  }
}

/** All `bits` hyperplane sign bits of an `array<float>` embedding in ONE
  * fused loop: bucket bit k = sign of the dot product with pseudo-random
  * plane k, whose component for dimension d is
  * ((a_k·(d+1) + b_k) mod P)/P − 0.5 (the [[AffineFamily]] constants — the
  * same planes the DuckDB oracle builds).
  *
  * Replaces the higher-order-function formulation (bits × (zip_with +
  * aggregate) interpreted lambdas per row) with a single codegen'd Java
  * loop — same shape as [[CosineSimilarity]], which measured ~20× on the
  * HOF path. For embeddings of length == `dims` (the fixture/operator
  * contract) the accumulation order (d ascending, double precision) is
  * IDENTICAL to the HOF left fold, so buckets are bit-equal and oracle
  * hashes are unaffected. Length-MISMATCHED vectors diverge deliberately:
  * this loop computes a partial dot over min(length, dims) and buckets
  * normally, where the old zip_with null-padded the shorter side and
  * null-propagated every malformed vector into bucket 0 — a silent hot
  * bucket of garbage rather than a usable signature.
  */
case class HyperplaneBuckets(child: Expression, bits: Int, dims: Int,
                             planeOffset: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 30, "bits must be in [1, 30]")
  require(planeOffset >= 0, "planeOffset must be >= 0")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_bucket"

  /** Plane components flattened as [k·dims + d], precomputed once. */
  private lazy val flatPlanes: Array[Double] = {
    val arr = new Array[Double](bits * dims)
    var k = 0
    while (k < bits) {
      val (a, b) = AffineFamily.ab(planeOffset + k)
      var d = 0
      while (d < dims) {
        arr(k * dims + d) =
          ((a * (d + 1) + b) % AffineFamily.P).toDouble / AffineFamily.P - 0.5
        d += 1
      }
      k += 1
    }
    arr
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dims)
    var bucket = 0
    var k = 0
    while (k < bits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += x.getFloat(d).toDouble * flatPlanes(k * dims + d)
        d += 1
      }
      if (dot > 0) bucket |= (1 << k)
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planes = ctx.addReferenceObj("planes", flatPlanes, "double[]")
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($x.numElements(), $dims);
         |int $bucket = 0;
         |for (int $k = 0; $k < $bits; $k++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += (double) $x.getFloat($d) * $planes[$k * $dims + $d];
         |  }
         |  if ($dot > 0) $bucket |= (1 << $k);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
