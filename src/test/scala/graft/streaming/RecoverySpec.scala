package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Checkpoint-recovery contract: the reference BufferedForwarder's crash
  * story [P] — a forwarder dies mid-drain, the proxy restarts, nothing is
  * lost and nothing is double-delivered. Here: kill a query via an
  * injected sink failure AFTER the batch's files are written but BEFORE
  * the commit is recorded, restart from the same checkpoint, and assert
  * the replayed batch=<id> overwrite yields exactly-once totals. Plus the
  * stateful half: counterToRate's last-(ts,value) state must survive a
  * restart via the state store. */
class RecoverySpec extends SparkSpec {

  test("sink crash + restart from checkpoint = exactly-once via batch=<id> overwrite") {
    val root = Files.createTempDirectory("graft_recovery").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    // two input files; maxFilesPerTrigger=1 → one file per micro-batch
    val f1 = (1 to 60).map(i => s"m.a$i ${i * 1.0} ${1700000000L + i}")
    val f2 = (1 to 40).map(i => s"m.b$i ${i * 2.0} ${1700000100L + i}")
    Files.write(Paths.get(s"$root/in/f1.txt"), String.join("\n", f1: _*).getBytes)
    Files.write(Paths.get(s"$root/in/f2.txt"), String.join("\n", f2: _*).getBytes)

    val lf = Pipeline.ListenFrom("file", path = s"$root/in",
      maxFilesPerTrigger = Some(1))
    val inner = StreamingOps.CsvForwarder("debug", s"$root/csv")
    val armed = RecoverySpec.armed
    armed.set(true)
    val crashy = new StreamingOps.Forwarder {
      val name = "crashy"
      def write(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        inner.write(batch, batchId)
        // the BufferedForwarder crash: output written, commit never recorded
        if (!batch.isEmpty && armed.getAndSet(false))
          throw new IllegalStateException("injected sink crash after write")
      }
    }

    def writer() = {
      val points = Pipeline.decode(Pipeline.source(spark, lf), lf)
      StreamingOps.demux(points, Seq(crashy), Trigger.ProcessingTime(50))
        .option("checkpointLocation", s"$root/ckpt")
    }

    val q1 = writer().start()
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(failure.getMessage.contains("injected sink crash"))
    q1.stop()
    assert(!armed.get, "the injected crash must actually have fired")

    // restart from the SAME checkpoint: the uncommitted batch replays with
    // the SAME batchId, its overwrite replacing the pre-crash output
    val q2 = writer().start()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.csv(s"$root/csv")
    assert(out.count() === 100L, "exactly-once: every input line delivered once")
    assert(out.select("_c0").distinct().count() === 100L,
      "no duplicated metrics from the replayed batch")
  }

  test("counterToRate state survives restart: rate spans the checkpoint boundary") {
    val sq = spark
    import sq.implicits._
    val root = Files.createTempDirectory("graft_rate_recovery").toString
    Files.createDirectories(Paths.get(s"$root/in"))

    def startQuery() = {
      val pts = spark.readStream.text(s"$root/in")
        .select(split(col("value"), " ").as("p"))
        .select(col("p")(0).as("metric"), col("p")(1).cast("long").as("epoch"),
          col("p")(2).cast("double").as("value"))
        .as[RatePoint]
      StreamingOps.counterToRate(pts, idleTimeout = None)
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append").start()
    }

    Files.write(Paths.get(s"$root/in/f1.txt"), "cpu 10 1.0\ncpu 20 3.0".getBytes)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    Files.write(Paths.get(s"$root/in/f2.txt"), "cpu 30 6.0".getBytes)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val rates = spark.read.parquet(s"$root/out")
      .orderBy("epoch").collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("epoch"), r.getAs[Double]("rate")))
    // epoch 10 has no predecessor; epoch 30's rate (6-3)/(30-20) needs the
    // pre-restart state (20, 3.0) — its presence proves state recovery
    assert(rates.toSeq === Seq(("cpu", 20L, 0.2), ("cpu", 30L, 0.3)))
  }

  test("counterToRate state survives restart on the RocksDB state store") {
    val sq = spark
    import sq.implicits._
    val root = Files.createTempDirectory("graft_rocksdb").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    Pipeline.applyStateStore(spark, Pipeline.GraftConfig(
      Pipeline.ListenFrom("file", path = s"$root/in"), Nil, stateStore = "rocksdb"))
    try {
      def startQuery() = {
        val pts = spark.readStream.text(s"$root/in")
          .select(split(col("value"), " ").as("p"))
          .select(col("p")(0).as("metric"), col("p")(1).cast("long").as("epoch"),
            col("p")(2).cast("double").as("value"))
          .as[RatePoint]
        StreamingOps.counterToRate(pts, idleTimeout = None)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append").start()
      }
      Files.write(Paths.get(s"$root/in/f1.txt"), "gpu 100 5.0\ngpu 110 9.0".getBytes)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      Files.write(Paths.get(s"$root/in/f2.txt"), "gpu 120 15.0".getBytes)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      val rates = spark.read.parquet(s"$root/out").orderBy("epoch").collect()
        .map(r => (r.getAs[Long]("epoch"), r.getAs[Double]("rate")))
      assert(rates.toSeq === Seq((110L, 0.4), (120L, 0.6)))
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

object RecoverySpec {
  /** Crash-injection arm, static so the closure serializes cleanly. */
  val armed = new AtomicBoolean(true)
}
