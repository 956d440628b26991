package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Kafka-shaped partitioned replay source: N `partition=P` file groups,
  * files named by starting offset, drained oldest-first under a bounded
  * per-trigger budget. The contract proven here is the one a real Kafka
  * source provides: per-partition offset order across triggers, partition
  * metadata on every row, and a drain bound so one backlog cannot
  * monopolize a trigger. */
class PartitionedReplaySpec extends SparkSpec {

  private val nParts = 8
  private val nFiles = 4
  private val linesPerFile = 50

  private def writeTopic(root: String): Unit = {
    val base = System.currentTimeMillis() - 3600 * 1000L
    (0 until nParts).foreach { p =>
      Files.createDirectories(Paths.get(s"$root/partition=$p"))
      (0 until nFiles).foreach { f =>
        val startOffset = f * linesPerFile
        val lines = (0 until linesPerFile).map { i =>
          s"svc.p$p.m[host=h${i % 4}] ${i * 1.5} ${1700000000L + startOffset + i}"
        }
        val path = Paths.get(f"$root/partition=$p/offset=$startOffset%020d.txt")
        Files.write(path, String.join("\n", lines: _*).getBytes)
        // replay files are produced in offset order → increasing mtimes;
        // the source drains oldest-first, so offset order follows
        Files.setLastModifiedTime(path, FileTime.fromMillis(base + f * 2000L))
      }
    }
  }

  test("per-partition offset order across bounded triggers") {
    val root = Files.createTempDirectory("graft_topic").toString
    writeTopic(root)
    val lf = Pipeline.ListenFrom("partitioned", path = root,
      deconstructor = graft.ingest.Carbon.CommaKeysDeconstructor,
      maxFilesPerTrigger = Some(nParts))

    // (batchId, partition, offset) observations per micro-batch
    val seen = mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val q = Pipeline.source(spark, lf).writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.select("src_partition", "src_offset").distinct().collect()
          .foreach(r => seen.synchronized {
            seen += ((id, r.getInt(0), r.getLong(1)))
          })
        ()
      }.start()
    q.processAllAvailable()
    q.stop()

    val batches = seen.map(_._1).distinct.sorted
    assert(batches.size >= nFiles,
      s"drain bound ignored: ${nParts * nFiles} files in ${batches.size} trigger(s)")
    assert(seen.map(t => (t._2, t._3)).distinct.size === nParts * nFiles,
      "every (partition, offset) file group must be consumed exactly once")
    // per partition: offsets must be non-decreasing in batch order
    (0 until nParts).foreach { p =>
      val inOrder = seen.filter(_._2 == p).sortBy(_._1).map(_._3)
      assert(inOrder === inOrder.sorted,
        s"partition $p consumed out of offset order: $inOrder")
    }
  }

  test("partitioned source composes with the carbon decode spine") {
    val root = Files.createTempDirectory("graft_topic2").toString
    writeTopic(root)
    val lf = Pipeline.ListenFrom("partitioned", path = root,
      deconstructor = graft.ingest.Carbon.CommaKeysDeconstructor)
    val total = new java.util.concurrent.atomic.AtomicLong()
    val q = Pipeline.decode(Pipeline.source(spark, lf), lf).writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        total.addAndGet(batch.where(col("value").isNotNull).count())
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(total.get() === (nParts * nFiles * linesPerFile).toLong)
  }
}
