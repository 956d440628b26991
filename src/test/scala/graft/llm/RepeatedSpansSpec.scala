package graft.llm

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Cross-document repeated-span detection (Lee et al. 2022 substring-level
  * dedup): planted shared passages must surface as maximal merged spans
  * with exact token boundaries, and text unique to one document must never
  * be flagged. */
class RepeatedSpansSpec extends SparkSpec {

  // w1..w40 is a 40-token passage planted VERBATIM in docs 1 and 2 at
  // different offsets; doc 3 shares nothing (all-distinct tokens); doc 4
  // repeats a passage with doc 1 that is interrupted mid-way by one unique
  // token, so its repeats merge into TWO spans, not one.
  private def fixture = {
    val sq = spark; import sq.implicits._
    val passage = (1 to 40).map(i => s"w$i").mkString(" ")
    val head1 = (1 to 10).map(i => s"a$i").mkString(" ")
    val head2 = (1 to 25).map(i => s"b$i").mkString(" ")
    val brokenA = (1 to 12).map(i => s"w$i").mkString(" ")
    val brokenB = (13 to 40).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, s"$head1 $passage"),                     // passage at tokens 11..50
      (2L, s"$head2 $passage"),                     // passage at tokens 26..65
      (3L, (1 to 60).map(i => s"u$i").mkString(" ")), // nothing shared
      (4L, s"$brokenA XBREAK $brokenB")             // w1..w12 + w13..w40 split
    ).toDF("doc_id", "text")
  }

  test("planted passages merge to maximal spans with exact boundaries") {
    val spans = Dedup.repeatedSpans(fixture, k = 8, minDocs = 2)
      .orderBy("doc_id", "span_start")
      .collect().map { case Row(d: Long, s: Long, e: Long, n: Long) => (d, s, e, n) }
    val byDoc = spans.groupBy(_._1)
    // docs 1 and 2 carry one maximal span each, exactly over the passage
    assert(byDoc(1L).map(t => (t._2, t._3)).toSeq == Seq((11L, 50L)))
    assert(byDoc(2L).map(t => (t._2, t._3)).toSeq == Seq((26L, 65L)))
    // doc 3 is untouched
    assert(!byDoc.contains(3L))
    // doc 4: the break token splits the repeat into two maximal spans —
    // w1..w12 at 1..12 and w13..w40 at 14..41 (XBREAK itself never flagged)
    assert(byDoc(4L).map(t => (t._2, t._3)).toSeq == Seq((1L, 12L), (14L, 41L)))
    // n_shingles is span_len - k + 1 for a contiguous run
    spans.foreach { case (_, s, e, n) => assert(n == e - s + 1 - 8 + 1) }
  }

  test("removeSpans scrubs exactly the flagged tokens; full-coverage docs scrub to empty") {
    val df = fixture
    val scrubbed = Dedup.removeSpans(df, Dedup.repeatedSpans(df, k = 8, minDocs = 2))
      .orderBy("doc_id")
      .collect().map { case Row(d: Long, t: String, n: Long) => (d, t, n) }
    val byDoc = scrubbed.map(t => t._1 -> t).toMap
    // doc 1: passage (tokens 11..50) removed, a-head kept verbatim
    assert(byDoc(1L)._2 == (1 to 10).map(i => s"a$i").mkString(" "))
    assert(byDoc(1L)._3 == 1L)
    // doc 2: b-head kept
    assert(byDoc(2L)._2 == (1 to 25).map(i => s"b$i").mkString(" "))
    // doc 3 untouched => NOT in the output (only affected docs emitted)
    assert(!byDoc.contains(3L))
    // doc 4: two spans removed, only the break token survives
    assert(byDoc(4L)._2 == "XBREAK" && byDoc(4L)._3 == 2L)
    // full-coverage: two identical docs scrub to the empty string
    val sq = spark; import sq.implicits._
    val clones = Seq((1L, (1 to 20).map(i => s"c$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val cs = Dedup.removeSpans(clones, Dedup.repeatedSpans(clones, k = 8, minDocs = 2))
      .collect().map { case Row(_, t: String, _) => t }
    assert(cs.length == 2 && cs.forall(_ == ""))
  }

  test("a passage must appear in >= minDocs DISTINCT docs: within-doc repeats alone don't flag") {
    val sq = spark; import sq.implicits._
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (1L, s"$rep pad1 pad2 pad3 $rep"),            // repeats only within doc 1
      (2L, (1 to 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(df, k = 8, minDocs = 2).count() == 0)
  }

  test("keepFirst: the bucket-canonical doc is never flagged, one copy survives scrub") {
    val df = fixture
    val spans = Dedup.repeatedSpans(df, k = 8, minDocs = 2, keepFirst = true)
      .collect().map { case Row(d: Long, s: Long, e: Long, _) => (d, s, e) }
    val byDoc = spans.groupBy(_._1)
    // doc 1 is min doc_id for the w-passage buckets (and the only carrier
    // of doc 4's split halves is {1, 4} -> keeper 1): doc 1 keeps everything
    assert(!byDoc.contains(1L))
    // docs 2 and 4 still flag their copies
    assert(byDoc(2L).map(t => (t._2, t._3)).toSeq == Seq((26L, 65L)))
    assert(byDoc(4L).nonEmpty)
    // scrub under keepFirst: the passage survives exactly once (in doc 1)
    val scrubbed = Dedup.removeSpans(df,
        Dedup.repeatedSpans(df, k = 8, minDocs = 2, keepFirst = true))
      .collect().map { case Row(d: Long, t: String, _) => (d, t) }.toMap
    assert(!scrubbed.contains(1L) && scrubbed(2L) == (1 to 25).map(i => s"b$i").mkString(" "))
  }

  test("spans from different shared passages with a gap > k stay separate") {
    val sq = spark; import sq.implicits._
    val p1 = (1 to 10).map(i => s"p$i").mkString(" ")
    val p2 = (1 to 10).map(i => s"q$i").mkString(" ")
    val gap = (1 to 20).map(i => s"g$i").mkString(" ")   // unique per doc? no — shared!
    // gap tokens must differ per doc or they'd be repeated too
    val df = Seq(
      (1L, s"$p1 ${(1 to 20).map(i => s"ga$i").mkString(" ")} $p2"),
      (2L, s"$p1 ${(1 to 20).map(i => s"gb$i").mkString(" ")} $p2")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, k = 8, minDocs = 2)
      .where("doc_id = 1").orderBy("span_start")
      .collect().map { case Row(_, s: Long, e: Long, _) => (s, e) }.toSeq
    assert(spans == Seq((1L, 10L), (31L, 40L)), s"got $spans (gap=$gap unused)")
  }
}
