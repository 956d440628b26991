package graft.storage.dsv2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expression, FieldReference, GeneralScalarExpression, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And, Predicate}

import graft.storage.SnapshotTable

/** METADATA-ONLY DELETE — the retention-delete fast path every table
  * format ships: when the stats sidecar PROVES each file is either
  * entirely inside the delete region (drop it from the manifest) or
  * entirely outside it (keep it verbatim), `DELETE FROM t WHERE ...`
  * commits one manifest with fewer entries — no scan, no rewrite, no
  * executor job. At 100 TB this is what turns "drop everything older
  * than the cutoff" from an O(table) rewrite into one rename.
  *
  * PROOF OBLIGATION (the inverse of scan pruning — an error here
  * deletes rows that should live, so every rule is exact, never
  * conservative-in-our-favor):
  *  - a file is DROPPABLE only if, for EVERY conjunct, all of [min,max]
  *    satisfies it AND the column's recorded null count is ZERO (null
  *    rows never satisfy a comparison, so a file with nulls can never
  *    be dropped whole);
  *  - a file is KEEPABLE (untouched) only if SOME conjunct is satisfied
  *    by none of [min,max];
  *  - any file that is neither — or has no stats for a referenced
  *    column, or any bound/stat magnitude beyond 2^51 (double-precision
  *    stats stop being exact for wider integers) — makes the whole
  *    delete ineligible, and Spark falls back to the group-based
  *    copy-on-write rewrite, which is always correct.
  *
  * Supported predicate shapes: conjunctions of `col {<,<=,>,>=,=} lit`
  * on numeric columns (either operand order). Anything else ⇒
  * ineligible, never wrong. */
object SnapshotMetadataDelete {

  /** Exactness guard: double-encoded stats and literals are trusted only
    * inside ±2^51 (integer-exact range with headroom). */
  private val ExactAbs = math.pow(2, 51)

  private final case class Leaf(col: String, op: String, value: Double)

  private def named(e: Expression): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
    case _ => None
  }

  private def literal(e: Expression): Option[Double] = e match {
    case l: Literal[_] => l.value match {
      case n: Number => Some(n.doubleValue())
      case _ => None
    }
    case _ => None
  }

  private val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=",
    "=" -> "=")

  /** Predicate tree → conjunct leaves; None ⇒ an unsupported shape. */
  private def leaves(p: Predicate): Option[Seq[Leaf]] = p match {
    case a: And =>
      for (l <- leaves(a.left()); r <- leaves(a.right())) yield l ++ r
    case g: GeneralScalarExpression
        if flip.contains(g.name()) && g.children().length == 2 =>
      val Array(a, b) = g.children()
      (named(a), literal(b), named(b), literal(a)) match {
        case (Some(c), Some(v), _, _) => Some(Seq(Leaf(c, g.name(), v)))
        case (_, _, Some(c), Some(v)) => Some(Seq(Leaf(c, flip(g.name()), v)))
        case _ => None
      }
    case _ => None
  }

  /** The surviving entries after a provably-exact metadata delete, or
    * None when any file's membership cannot be proven. */
  def plan(spark: SparkSession, root: String, snap: SnapshotTable.Snapshot,
           predicates: Array[Predicate]): Option[Seq[SnapshotTable.FileEntry]] = {
    if (predicates.isEmpty) return None // DELETE FROM t (no WHERE) is TRUNCATE
    val conj = predicates.toSeq.map(leaves)
    if (conj.exists(_.isEmpty)) return None
    val ls = conj.flatten.flatten
    if (ls.isEmpty) return None
    if (ls.exists(l => math.abs(l.value) > ExactAbs)) return None
    val st = SnapshotTable.statsFull(spark, root, snap.version)

    def stat(e: SnapshotTable.FileEntry, c: String): Option[(Double, Double, Long)] =
      st.get((SnapshotTable.norm(e.path), c))
        .filter(t => math.abs(t._1) <= ExactAbs && math.abs(t._2) <= ExactAbs)

    def fullIn(l: Leaf, mn: Double, mx: Double): Boolean = l.op match {
      case "<" => mx < l.value
      case "<=" => mx <= l.value
      case ">" => mn > l.value
      case ">=" => mn >= l.value
      case "=" => mn == l.value && mx == l.value
    }
    def fullOut(l: Leaf, mn: Double, mx: Double): Boolean = l.op match {
      case "<" => mn >= l.value
      case "<=" => mn > l.value
      case ">" => mx <= l.value
      case ">=" => mx < l.value
      case "=" => l.value < mn || l.value > mx
    }

    val kept = Seq.newBuilder[SnapshotTable.FileEntry]
    for (e <- snap.entries) {
      val droppable = ls.forall { l =>
        stat(e, l.col).exists { case (mn, mx, nulls) =>
          nulls == 0L && fullIn(l, mn, mx)
        }
      }
      val keepable = ls.exists { l =>
        stat(e, l.col).exists { case (mn, mx, _) => fullOut(l, mn, mx) }
      }
      if (droppable) () // dropped from the manifest
      else if (keepable) kept += e
      else return None // unprovable membership ⇒ fall back to the rewrite
    }
    Some(kept.result())
  }

  /** Commit the metadata delete: survivors as version+1 (CAS on the base
    * version), stats lines of kept files carried, schema carried. */
  def commit(spark: SparkSession, root: String,
             snap: SnapshotTable.Snapshot,
             kept: Seq[SnapshotTable.FileEntry]): Unit = {
    val keptNorm = kept.map(e => SnapshotTable.norm(e.path)).toSet
    val lines = SnapshotTable.statsFull(spark, root, snap.version).toSeq.collect {
      case ((f, c), (mn, mx, nu)) if keptNorm(f) => s"$f\t$c\t$mn\t$mx\t$nu"
    }.sorted
    val next = snap.version + 1
    SnapshotTable.commit(spark, root, next, kept,
      SnapshotTable.nextMeta(Some(snap), None))
    SnapshotTable.writeStats(spark, root, next, lines)
    SnapshotTable.tableSchema(spark, root, snap.version)
      .foreach(SnapshotTable.writeSchema(spark, root, next, _))
  }
}
