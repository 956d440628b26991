package graft

import graft.ingest.SignalFxProto
import graft.ingest.SignalFxProto.SfxPoint

/** Wire-codec throughput probe (test scope, no Spark): datapoints/second
  * through SignalFxProto encode and decode on one core — the per-core
  * constant that, times executor cores, bounds protobuf ingest/forward
  * rates. Run: sbt "Test/runMain graft.ProtoThroughput [n]" */
object ProtoThroughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val pts = (0 until n).map(i => SfxPoint(null, s"svc.api.latency.m${i % 64}",
      1700000000000L + i, null, Some((i % 1000) * 0.25), None, "GAUGE",
      Map("host" -> s"web${i % 32}", "dc" -> "iad")))
    // warm-up then timed, both directions
    SignalFxProto.decodeUpload(SignalFxProto.encodeUpload(pts.take(100000).iterator))
    val t0 = System.nanoTime()
    val payload = SignalFxProto.encodeUpload(pts.iterator)
    val t1 = System.nanoTime()
    val back = SignalFxProto.decodeUpload(payload)
    val t2 = System.nanoTime()
    require(back.length == n)
    val encS = (t1 - t0) / 1e9; val decS = (t2 - t1) / 1e9
    println(f"[proto] $n points: encode ${n / encS / 1e6}%.2fM pts/s " +
      f"(${payload.length / 1e6}%.1f MB), decode ${n / decS / 1e6}%.2fM pts/s, single core")
  }
}
