package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Deletion-vector sidecars — the MERGE-ON-READ half of the snapshot
  * format (Delta's deletion vectors / Iceberg's position deletes): a
  * small `DELETE`/`MERGE` commits, per touched data file, ONE sidecar
  * naming the deleted row ordinals instead of rewriting the file. A
  * 10-row delete from a 1 GB file is then a ~100-byte write plus a
  * manifest rename — metadata time — where copy-on-write pays a full
  * 1 GB decode+encode. Readers subtract the positions; compaction (any
  * rewrite) materializes the deletes away and the sidecar leaves the
  * manifest with its file.
  *
  * Wire format (version GDV1, one file per (data file, commit)):
  * {{{
  *   int32  magic 0x47445631 ("GDV1")
  *   int32  count
  *   varint-encoded deltas of the SORTED row ordinals (first value is
  *          delta from -1, so strictly-ascending positions encode as
  *          positive deltas; typical gap ≪ 128 ⇒ ~1 byte per position)
  * }}}
  *
  * Sidecars are IMMUTABLE like data files: a second delete against the
  * same data file writes a NEW sidecar holding the union, and the old
  * version's manifest keeps referencing the old one — time travel across
  * merge-on-read versions needs no special casing. Unreferenced sidecars
  * retire through [[SnapshotTable.vacuum]] exactly like data files. */
object DeletionVectors {

  private val Magic = 0x47445631

  /** Directory sidecars live under: `<root>/_deletes`. */
  def dir(root: String): Path = new Path(root, "_deletes")

  /** A fresh sidecar path under `root` (caller writes then references). */
  def freshPath(root: String): String =
    new Path(dir(root), s"${java.util.UUID.randomUUID()}.dv").toString

  /** Write `positions` (any order, deduplicated here) to `path`.
    * Returns the deduplicated sorted positions actually written. */
  def write(conf: Configuration, path: String,
            positions: Array[Long]): Array[Long] = {
    val sorted = positions.distinct.sorted
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, false)))
    try {
      out.writeInt(Magic)
      out.writeInt(sorted.length)
      var prev = -1L
      var i = 0
      while (i < sorted.length) {
        require(sorted(i) >= 0, s"negative row ordinal ${sorted(i)}")
        writeVarLong(out, sorted(i) - prev)
        prev = sorted(i)
        i += 1
      }
    } finally out.close()
    sorted
  }

  /** Read a sidecar back as sorted ascending row ordinals. */
  def read(conf: Configuration, path: String): Array[Long] = {
    val p = new Path(path)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(p.getFileSystem(conf).open(p)))
    try {
      val magic = in.readInt()
      require(magic == Magic,
        f"not a deletion vector (magic 0x$magic%08x) at $path")
      val n = in.readInt()
      val out = new Array[Long](n)
      var prev = -1L
      var i = 0
      while (i < n) {
        prev += readVarLong(in)
        out(i) = prev
        i += 1
      }
      out
    } finally in.close()
  }

  /** Union of two sorted position arrays (either may be empty). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else (a ++ b).distinct.sorted

  /** Sorted difference `a \ b` (linear merge — the change feed's
    * "newly deleted = new vector minus old vector" walk, computed
    * EXECUTOR-side so CDF planning never materializes positions on the
    * driver). */
  def diff(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    val out = Array.newBuilder[Long]
    out.sizeHint(math.max(0, a.length - b.length))
    var i = 0
    var j = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) out += a(i)
      i += 1
    }
    out.result()
  }

  /** `[0, n) \ a` for sorted `a` — the fresh deletes of a FULLY deleted
    * file (its final vector is every row; `a` is what was already dead). */
  def complement(a: Array[Long], n: Long): Array[Long] = {
    val out = new Array[Long]((n - a.length).toInt)
    var i = 0
    var j = 0
    var p = 0L
    while (p < n) {
      if (j < a.length && a(j) == p) j += 1
      else { out(i) = p; i += 1 }
      p += 1L
    }
    out
  }

  private def writeVarLong(out: java.io.DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.writeByte(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  private def readVarLong(in: java.io.DataInputStream): Long = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      b = in.readUnsignedByte()
      v |= (b & 0x7FL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }
}
