package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Plan-hygiene introspection — the "would this survive 100×?" checklist
  * as a library surface instead of tribal knowledge.
  *
  * `.explain` answers "what is the plan"; [[PlanReport.of]] answers "does
  * the plan have the properties that matter at scale": how many shuffles,
  * whether any join degenerated to a nested-loop/cartesian (the classic
  * silent scale-killer), whether filters actually reached the parquet
  * scan, whether the hot path stayed inside whole-stage codegen, and
  * whether any sort/window runs unpartitioned on a single task. CI can
  * assert on the struct (PlanAuditSpec does exactly this ad hoc with
  * string matching — this is the typed form); operators can log
  * `report.render` at deploy time.
  *
  * Walks the EXECUTED plan, descending into AQE's dynamically re-planned
  * subtrees so post-reoptimization reality is counted, not the initial
  * plan. */
object PlanReport {

  final case class Report(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      nestedLoopJoins: Int,
      cartesianProducts: Int,
      sortMergeJoins: Int,
      broadcastHashJoins: Int,
      shuffledHashJoins: Int,
      wholeStageCodegenSpans: Int,
      unpartitionedWindows: Int,
      globalSorts: Int,
      fileScans: Int,
      scansWithPushedFilters: Int,
      pushedFilters: Seq[String]) {

    /** The red flags, in one line (empty = clean). */
    def flags: Seq[String] = {
      val b = Seq.newBuilder[String]
      if (nestedLoopJoins > 0) b += s"nested-loop joins: $nestedLoopJoins"
      if (cartesianProducts > 0) b += s"cartesian products: $cartesianProducts"
      if (unpartitionedWindows > 0)
        b += s"unpartitioned windows (single-task): $unpartitionedWindows"
      b.result()
    }

    def render: String =
      s"shuffles=$shuffleExchanges broadcasts=$broadcastExchanges " +
        s"joins[smj=$sortMergeJoins bhj=$broadcastHashJoins shj=$shuffledHashJoins " +
        s"bnlj=$nestedLoopJoins cart=$cartesianProducts] " +
        s"codegenSpans=$wholeStageCodegenSpans " +
        s"unpartitionedWindows=$unpartitionedWindows globalSorts=$globalSorts " +
        s"scans=$fileScans pushed=$scansWithPushedFilters" +
        (if (flags.isEmpty) "" else flags.mkString(" | FLAGS: ", "; ", ""))
  }

  /** Every node of the executed plan, descending into AQE subtrees and
    * reused subplans. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      // AQE materializes stage boundaries as QueryStageExec leaves whose
      // subtree hides behind `plan`, not `children`. ReusedExchangeExec is
      // deliberately NOT descended: its subtree executes once under the
      // original exchange — descending would double-count shuffles/scans.
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children ++ other.subqueries
    }
    p +: children.flatMap(walk)
  }

  /** Analyze `df`'s executed plan. `execute = true` (default) runs the
    * frame first so AQE's FINAL plan (with codegen stages inserted) is
    * reported — by running THIS df's own QueryExecution's RDD with a
    * no-op action, rows consumed on the executors (a collect here would
    * OOM the driver on exactly the big frames worth auditing; a
    * write-to-noop-sink or `df.foreach` would each build and finalize a
    * SEPARATE QueryExecution and leave this one unfinalized). Pass false
    * to inspect the pre-execution plan without paying for the job. */
  def of(df: DataFrame, execute: Boolean = true): Report = {
    if (execute) df.queryExecution.toRdd.foreach(_ => ())
    val nodes = walk(df.queryExecution.executedPlan)
    def cls(p: SparkPlan) = p.getClass.getSimpleName
    // an unpartitioned window requires AllTuples (every row on ONE task) —
    // the requiredChildDistribution is authoritative, unlike string
    // matching on the plan header
    val unpart = nodes.count { n =>
      cls(n) == "WindowExec" &&
        n.requiredChildDistribution.headOption.exists(
          _ == org.apache.spark.sql.catalyst.plans.physical.AllTuples)
    }
    val scans = nodes.filter(n => cls(n) == "FileSourceScanExec" ||
      cls(n) == "BatchScanExec")
    // scan metadata is ABBREVIATED (spark.sql.maxMetadataStringLength), so
    // the closing ']' may be truncated away and nested brackets (In(...))
    // close early — extract to the last ']' on the PushedFilters LINE,
    // falling back to the line end, never out of bounds
    val pushed = scans.map(_.toString).flatMap { s =>
      s.linesIterator.find(_.contains("PushedFilters: [")).map { line =>
        val start = line.indexOf("PushedFilters: [") + "PushedFilters: [".length
        val end = line.lastIndexOf("]")
        if (end > start) line.substring(start, end)
        else line.substring(start).stripSuffix("...")
      }
    }.filter(_.nonEmpty)
    Report(
      shuffleExchanges = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      broadcastExchanges = nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      nestedLoopJoins = nodes.count(n => cls(n).contains("NestedLoopJoin")),
      cartesianProducts = nodes.count(n => cls(n).contains("CartesianProduct")),
      sortMergeJoins = nodes.count(n => cls(n) == "SortMergeJoinExec"),
      broadcastHashJoins = nodes.count(n => cls(n) == "BroadcastHashJoinExec"),
      shuffledHashJoins = nodes.count(n => cls(n) == "ShuffledHashJoinExec"),
      wholeStageCodegenSpans = nodes.count(n => cls(n) == "WholeStageCodegenExec"),
      unpartitionedWindows = unpart,
      globalSorts = nodes.count {
        case s: org.apache.spark.sql.execution.SortExec => s.global
        case _ => false
      },
      fileScans = scans.size,
      scansWithPushedFilters = pushed.size,
      pushedFilters = pushed)
  }
}
