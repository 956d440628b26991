package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native cosine similarity over two `array<float>` columns.
  *
  * The higher-order-function formulation (zip_with + aggregate, see
  * graft.functions.VectorFunctions) evaluates an interpreted lambda per
  * element — ~3 passes x 64 lambda invocations per pair. This expression
  * compiles to a single fused Java loop inside whole-stage codegen, which
  * measured ~20x faster on the all-pairs workload at sf0.1.
  *
  * Accumulation order (left-to-right, double precision) is IDENTICAL to the
  * HOF formulation, so results are bit-equal and oracle hashes are
  * unaffected. Assumes non-null elements; length mismatch uses the common
  * prefix (fixture vectors are all 64-dim).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float> (AbstractDataType is private[sql], so no
  // ExpectsInputTypes here; callers go through VectorFunctions.cosineNative)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Function registration: per-session runtime registry and the
  * `spark.sql.extensions`-style injector for externally built sessions. */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "graft_poly_hash" -> (exprs => PolyHash(exprs.head)),
    "graft_simhash_agg" -> (exprs => SimHashAgg(exprs.head).toAggregateExpression()),
    "graft_simhash_balance" -> (exprs =>
      SimHashBalanceAgg(exprs(0), exprs(1)).toAggregateExpression()),
    "graft_hyperplane_bucket" -> { exprs =>
      def intLit(e: Expression, what: String): Int = e.eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_hyperplane_bucket $what must be an integer literal, got $other")
      }
      HyperplaneBuckets(exprs(0), intLit(exprs(1), "bits"),
        intLit(exprs(2), "dims"), intLit(exprs(3), "planeOffset"))
    },
    "graft_pq_encode" -> { exprs =>
      def intLit(e: Expression, what: String): Int = e.eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_pq_encode $what must be an integer literal, got $other")
      }
      // the codebook is DATA learned at train time — it arrives as a
      // foldable array literal and is extracted once at build time
      val flat = exprs(1).eval(InternalRow.empty) match {
        case a: ArrayData => a.toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"graft_pq_encode codebook must be an array<double> literal, got $other")
      }
      PqEncode(exprs(0), flat, intLit(exprs(2), "m"), intLit(exprs(3), "k"),
        intLit(exprs(4), "subDim"))
    },
    "graft_freq_items" -> { exprs =>
      // k must be a foldable int literal (it sizes the aggregation buffer)
      val k = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_freq_items k must be an integer literal, got $other")
      }
      FreqItemsAgg(exprs(0), k).toAggregateExpression()
    },
    "graft_zorder" -> (exprs => ZOrderInterleave(exprs(0), exprs(1))),
    "graft_part_field" -> { exprs =>
      val t = exprs(0).eval(InternalRow.empty) match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other => throw new IllegalArgumentException(
          s"graft_part_field transform must be a string literal, got $other")
      }
      val n = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_part_field n must be an integer literal, got $other")
      }
      graft.storage.PartitionFieldExpr(t, n, exprs(2))
    },
    "graft_kll_agg" -> { exprs =>
      val k = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_kll_agg k must be an integer literal, got $other")
      }
      KllSketchAgg(exprs(0), k).toAggregateExpression()
    },
    "graft_kll_merge" -> { exprs =>
      val k = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_kll_merge k must be an integer literal, got $other")
      }
      KllMergeAgg(exprs(0), k).toAggregateExpression()
    },
    "graft_kll_quantile" -> (exprs => KllQuantile(exprs(0), exprs(1))),
    "graft_kll_rank" -> (exprs => KllRank(exprs(0), exprs(1))),
    "graft_bloom_agg" -> { exprs =>
      val n = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg expectedItems must be an integer literal, got $other")
      }
      val fpp = exprs(2).eval(InternalRow.empty) match {
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg fpp must be a double literal, got $other")
      }
      BloomFilterBuildAgg(exprs(0), n, fpp).toAggregateExpression()
    },
    "graft_theta_agg" -> { exprs =>
      val lgK = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_theta_agg lgK must be an integer literal, got $other")
      }
      ThetaSketchAgg(exprs(0), lgK).toAggregateExpression()
    },
    "graft_theta_union" -> { exprs =>
      val lgK = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_theta_union lgK must be an integer literal, got $other")
      }
      ThetaUnionAgg(exprs(0), lgK).toAggregateExpression()
    },
    "graft_theta_estimate" -> (exprs => ThetaEstimate(exprs(0))),
    "graft_theta_intersect" -> (exprs => ThetaSetOp(exprs(0), exprs(1), 0)),
    "graft_theta_anotb" -> (exprs => ThetaSetOp(exprs(0), exprs(1), 1)),
    "graft_theta_union_pair" -> (exprs => ThetaSetOp(exprs(0), exprs(1), 2)),
    "graft_bloom_might_contain" -> { exprs =>
      // the sketch is plan-constant DATA: it arrives as a binary literal
      // and is extracted once at build time (the graft_pq_encode pattern)
      val bytes = exprs(1).eval(InternalRow.empty) match {
        case b: Array[Byte] => b
        case other => throw new IllegalArgumentException(
          s"graft_bloom_might_contain sketch must be a BINARY literal, got $other")
      }
      BloomMightContain(exprs(0), bytes)
    },
    "graft_vec_mean" -> { exprs =>
      val dims = exprs(1).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_vec_mean dims must be an integer literal, got $other")
      }
      VecMomentsAgg(exprs(0), dims).toAggregateExpression()
    },
    "graft_topk_by" -> { exprs =>
      val k = exprs(2).eval(InternalRow.empty) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_topk_by k must be an integer literal, got $other")
      }
      TopKByAgg(exprs(0), exprs(1), k).toAggregateExpression()
    })

  /** Register graft functions on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `--conf spark.sql.extensions=graft.functions.expressions.GraftSparkExtensions` */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name),
        builder))
    }
    // no-equi-key range joins → bucketed equi-joins (no-op until
    // spark.graft.rangeJoin.bucketWidth is set; see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // exact count(DISTINCT x) → HLL++ (no-op until
    // spark.graft.approx.countDistinct is set to a target rsd)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    // theta-join + max() as-of shape → union + running-window plan (no-op
    // until spark.graft.asofJoin.rewrite=true)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinRewrite)
    // exact percentile()/median() → GK approx_percentile (no-op until
    // spark.graft.approx.percentile is set to an accuracy)
    ext.injectOptimizerRule(_ => graft.plans.ApproxPercentileRewrite)
    // unpartitioned entire-frame aggregate windows → one-row aggregate
    // cross join (no-op until spark.graft.rewrite.globalWindow=true)
    ext.injectOptimizerRule(_ => graft.plans.GlobalWindowRewrite)
    // aggregates over the raw fact table → the incrementalRollup table
    // (no-op until spark.graft.rollup.route is set)
    ext.injectOptimizerRule(_ => graft.plans.RollupRouteRewrite)
    // interval-overlap theta joins → canonical-cell grid joins (shares
    // spark.graft.rangeJoin.bucketWidth with RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.IntervalOverlapRewrite)
  }
}
