package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** A datapoint for the stateful rate converter (top-level: encoder codegen
  * needs public constructor access). */
final case class RatePoint(metric: String, epoch: Long, value: Double)
/** Converted output: per-second rate at the new point's time. */
final case class RateOut(metric: String, epoch: Long, rate: Double)
/** State per metric: the last seen (epoch, value). */
final case class RateState(epoch: Long, value: Double)
/** Anomaly flag: a point whose |z| exceeded the threshold at arrival. */
final case class AnomalyOut(metric: String, epoch: Long, value: Double, zscore: Double)
/** One observed item for the streaming distinct counter. */
final case class DistinctPoint(metric: String, window: Long, item: Long)
/** Running distinct estimate for a (metric, window) key. */
final case class DistinctOut(metric: String, window: Long, estimate: Double)
/** Per-metric EWMA state: points seen, running mean and variance. */
final case class AnomalyState(n: Long, mean: Double, varr: Double)
/** 1-step-ahead forecast emitted BEFORE the point updates the state —
  * forecast error is directly observable per point. */
final case class ForecastOut(metric: String, epoch: Long, value: Double, forecast: Double)
/** Per-metric Holt-Winters state: points absorbed + (level, trend,
  * rotating seasonals). */
final case class HwState(n: Long, s: Seq[Double])
/** One observation for the streaming quantile sketch. */
final case class QuantilePoint(metric: String, window: Long, value: Double)
/** Running quantile estimates for a (metric, window) key. */
final case class QuantileOut(metric: String, window: Long, p50: Double, p90: Double)
/** One keyed state observation for the streaming SCD2 change stream. */
final case class Scd2Point(key: Long, epoch: Long, id: Long, state: Int)
/** An opened dimension version: `key` entered `state` at `validFrom`. */
final case class Scd2Change(key: Long, validFrom: Long, state: Int)
/** Per-key SCD2 state: the last applied (epoch, id, state). */
final case class Scd2State(epoch: Long, id: Long, state: Int)
/** Streaming CUSUM input: a keyed point with its reference level. */
final case class CusumPoint(key: Long, epoch: Long, id: Long, value: Double, ref: Double)
/** CUSUM score at the point's arrival (+ threshold alarm flag). */
final case class CusumOut(key: Long, id: Long, cusum: Double, alarm: Boolean)
/** Per-key CUSUM state: running deviation sum and its prefix minimum —
  * the WHOLE change-detection state is two doubles, because
  * max(0, S + x - ref - k) == C - min(0, min-prefix C). */
final case class CusumState(c: Double, minc: Double)
/** A funnel input event: (user, step name, epoch seconds). */
final case class FunnelPoint(user: Long, step: String, epoch: Double)
/** A funnel stage completion: user first completed `stage` (1-based) at
  * `epoch`. */
final case class FunnelHit(user: Long, stage: Int, epoch: Double)
/** Per-user funnel state: first qualifying time per stage (NaN = not yet). */
final case class FunnelTimes(times: Seq[Double])
/** Streaming as-of input: side 0 = left (the matched-against stream, e.g.
  * clicks), side 1 = right (the probing stream carrying its `id`). */
final case class AsOfPoint(key: Long, epoch: Double, side: Int, id: Long)
/** A right-side event with its as-of match: greatest left epoch ≤ `epoch`
  * seen so far (`matched` false ⇒ no left event yet; `lastLeft` 0). */
final case class AsOfHit(id: Long, key: Long, epoch: Double,
                         lastLeft: Double, matched: Boolean)
/** Per-key as-of state: one double. */
final case class AsOfState(lastLeft: Double)

final case class TopkPoint(metric: String, window: Long, item: String)
final case class TopkOut(metric: String, window: Long, item: String,
                         cnt: Long, rnk: Int)

final case class AlertPoint(key: String, epoch: Long, id: Long, value: Double)
/** One OPEN above-threshold run per key — three longs of state. */
final case class AlertRunState(astart: Long, aend: Long, npts: Long)
final case class AlertOut(key: String, astart: Long, aend: Long, npts: Long,
                          dur: Long)

/** Streaming rollups and forwarder sinks — the Spark-native equivalent of
  * the reference's listener → demultiplexer → buffered forwarder spine
  * (SURVEY.md §2a rows 8–13: `protocol/demultiplexer/demultiplexer.go`,
  * `dp/dpbuffered.go`, `protocol/carbon/carbonforwarder.go`,
  * `protocol/csv/csvforwarder.go` [P]).
  *
  * Mapping: unbounded buffering → micro-batch trigger; drain-thread
  * parallelism → sink-side partition parallelism; drop-on-overflow →
  * watermark late-data drop. State (windowed aggregations) lives in the
  * state store keyed by (group, window) — at scale back it with RocksDB via
  * `spark.sql.streaming.stateStore.providerClass`.
  */
object StreamingOps {

  /** Tumbling-window rollup: count + sum(value) per (window, key). */
  def tumble(events: DataFrame, tsCol: String, keyCol: String,
             width: String, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col(keyCol))
      .agg(count("*").as("c"), sum("value").as("sv"))
      .select(col("window.start").as("wstart"), col(keyCol),
        col("c"), col("sv"))

  /** Sliding-window rollup (width, slide). */
  def slide(events: DataFrame, tsCol: String, width: String, slide: String,
            watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide))
      .agg(count("*").as("c"))
      .select(col("window.start").as("wstart"), col("c"))

  /** Gap-based sessionization per user (session_window, Spark ≥3.2). */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
                 gap: String, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count("*").as("n_events"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"), col(userCol), col("n_events"))

  /** A forwarder writes one micro-batch. Implementations mirror the
    * reference's forwarder plugins and must be IDEMPOTENT per batchId:
    * foreachBatch re-executes a micro-batch after sink failure or
    * restart-from-checkpoint, so an append-only sink would duplicate rows.
    * The file forwarders below get exactly-once by writing each batch into
    * its own `batch=<id>` directory with overwrite — a replay replaces the
    * partial output instead of appending next to it. */
  trait Forwarder extends Serializable {
    def name: String
    def write(batch: DataFrame, batchId: Long): Unit
  }

  /** CSV debug sink (csvforwarder.go [P]): one `batch=<id>` CSV directory
    * per micro-batch (idempotent overwrite). Complex columns
    * (maps/arrays/structs) are JSON-encoded — CSV cannot carry them
    * natively. */
  final case class CsvForwarder(name: String, dir: String) extends Forwarder {
    def write(batch: DataFrame, batchId: Long): Unit = {
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val flat = batch.schema.fields.map { f =>
        f.dataType match {
          case _: MapType | _: ArrayType | _: StructType => to_json(col(f.name)).as(f.name)
          case _ => col(f.name)
        }
      }
      batch.select(flat.toIndexedSeq: _*)
        .write.mode("overwrite").option("header", "false")
        .csv(s"$dir/batch=$batchId")
    }
  }

  /** Graphite-line sink (carbonforwarder.go [P]): serializes datapoints to
    * `metric value epoch` text files, one `batch=<id>` directory per
    * micro-batch (idempotent overwrite; stand-in for the TCP client — the
    * codec and batch path are the real parts). */
  final case class CarbonForwarder(name: String, dir: String) extends Forwarder {
    def write(batch: DataFrame, batchId: Long): Unit =
      batch.select(graft.ingest.Carbon.toLine(
          col("metric"), col("value"), col("epoch")).as("value"))
        .write.mode("overwrite").text(s"$dir/batch=$batchId")
  }

  /** SignalFx protobuf sink (signalfxforwarder.go [P]): serializes each
    * micro-batch's datapoints into `DataPointUploadMessage` wire payloads —
    * one payload per partition, the batched POST-body unit — written as a
    * `batch=<id>` parquet of binary payloads (idempotent overwrite;
    * stand-in for the HTTP client, the codec and batching are the real
    * parts). Expects (metric, value, epoch) columns like [[CarbonForwarder]]. */
  final case class SignalFxProtoForwarder(name: String, dir: String) extends Forwarder {
    def write(batch: DataFrame, batchId: Long): Unit = {
      val s = batch.sparkSession
      import s.implicits._
      val points = batch.select(
          lit(null).cast("string").as("source"),
          col("metric"),
          (col("epoch").cast("long") * 1000L).as("timestamp"),
          lit(null).cast("string").as("strValue"),
          col("value").cast("double").as("doubleValue"),
          lit(null).cast("long").as("intValue"),
          lit("GAUGE").as("metricType"),
          map().cast("map<string,string>").as("dimensions"))
        .as[graft.ingest.SignalFxProto.SfxPoint]
      graft.ingest.SignalFxProto.encode(points)
        .write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    }
  }

  /** Demultiplexer (demultiplexer.go [P]): one source stream fanned out to
    * ALL registered forwarders from a single foreachBatch — one source-side
    * computation per micro-batch, N sink writes (persist the batch so sinks
    * don't recompute it). */
  def demux(source: DataFrame, forwarders: Seq[Forwarder],
            trigger: Trigger = Trigger.ProcessingTime("1 second")): DataStreamWriter[Row] =
    source.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.persist()
        try forwarders.foreach(_.write(batch.toDF(), batchId))
        finally batch.unpersist()
        ()
      }

  /** Per-sink datapoint counters (dpsink counter middleware [P]) via
    * `observe` — metrics surface on the StreamingQueryListener without a
    * second aggregation pass over the data. */
  def withCounters(source: DataFrame, name: String = "graft_stats"): DataFrame =
    source.observe(name, count(lit(1)).as("n_points"),
      approx_count_distinct(col("metric")).as("n_metrics"))

  /** Streaming first-arrival dedup per key set within the watermark window
    * — the streaming twin of the STREAM-DEDUP batch-replay query. State is
    * bounded: `dropDuplicatesWithinWatermark` evicts seen-keys older than
    * the watermark (a plain dropDuplicates would grow state forever at
    * 100 TB/day ingest). */
  def dedupWithinWatermark(points: DataFrame, tsCol: String,
                           keyCols: Seq[String], watermark: String): DataFrame =
    points.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join (attribution shape: every right-side event
    * joined to same-key left-side events at most `maxDelay` after it has,
    * e.g. purchase ← click within 10 minutes). The batch twin is JOIN-RANGE/
    * JOIN-ASOF; this is the streaming form.
    *
    * State is BOUNDED because both inputs carry watermarks AND the join
    * condition bounds event time in both directions — Spark derives from
    * them how long each side's rows must be retained and evicts state older
    * than that. Without the time-range conjunct a stream-stream join must
    * keep EVERY row forever (unbounded state — the 100 TB killer), and
    * Spark rejects outer variants outright. Both sides shuffle-partition on
    * the join key, so the stateful join is key-local; `joinType` supports
    * "inner" and "leftOuter" (left rows with no match emit nulls once the
    * watermark passes their eligibility window).
    *
    * Column names (other than `keyCol`) must be disjoint between the sides
    * — the output carries both sides' columns with one `keyCol`. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String, maxDelay: String,
                   leftWatermark: String, rightWatermark: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTsCol, leftWatermark).alias("l")
    val r = right.withWatermark(rightTsCol, rightWatermark).alias("r")
    l.join(r,
        expr(s"""l.$keyCol = r.$keyCol
                 AND $leftTsCol >= $rightTsCol
                 AND $leftTsCol <= $rightTsCol + interval $maxDelay"""),
        joinType)
      .drop(col(s"r.$keyCol"))
  }

  /** CUMULATIVE_COUNTER → per-second RATE conversion, the reference's
    * counter semantics (golib/datapoint MetricType [P]), as a custom
    * stateful streaming operator: state = last (ts, value) per metric,
    * kept in the state store (RocksDB-backed at scale via
    * spark.sql.streaming.stateStore.providerClass); each micro-batch emits
    * (metric, epoch, Δvalue/Δt) for points that advance time. This is the
    * `flatMapGroupsWithState` escape hatch for semantics the declarative
    * streaming API can't express: the rate of the FIRST point of a batch
    * depends on the LAST point of the previous one.
    *
    * State is BOUNDED by default: metrics idle longer than `idleTimeout`
    * are evicted via processing-time timeout — with churning series
    * (per-pod metrics that appear once and die, the norm for a proxy)
    * unbounded state would grow one entry per dead metric forever. Pass
    * `idleTimeout = None` for no eviction (finite test corpora;
    * run-to-completion harnesses — timeout scheduling keeps an always-on
    * query busy, which wedges processAllAvailable-style drivers). */
  def counterToRate(points: Dataset[RatePoint],
                    idleTimeout: Option[String] = Some("1 hour")): Dataset[RateOut] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (metric: String, it: Iterator[RatePoint], state: GroupState[RateState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[RateOut]
            var last = state.getOption
            it.toSeq.sortBy(_.epoch).foreach { p =>
              last match {
                case Some(st) if p.epoch > st.epoch =>
                  out += RateOut(metric, p.epoch,
                    (p.value - st.value) / (p.epoch - st.epoch))
                case _ => ()
              }
              if (last.forall(_.epoch <= p.epoch)) last = Some(RateState(p.epoch, p.value))
            }
            last.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming anomaly flags per metric: exponentially-weighted mean and
    * variance maintained across micro-batches (West 1979's EW update),
    * emitting points whose |z| = |v − mean|/√var exceeds `z` once `warmup`
    * points have been absorbed. The z-score is computed against the state
    * BEFORE the point updates it, so an outlier cannot mask itself.
    * Within a batch, points fold in (epoch, value) order, so any
    * micro-batch slicing that preserves cross-batch epoch order (the
    * replay-source property; Kafka per-partition order) yields the same
    * flags — which lets the batch-mode run of this SAME operator serve as
    * the correctness oracle (flatMapGroupsWithState runs in batch mode
    * with empty initial state). Out-of-order arrival ACROSS batches folds
    * in arrival order — inherent to any one-pass detector. State is two
    * doubles and a count per metric — bounded regardless of stream length
    * or cardinality. */
  /** Streaming Holt-Winters forecaster: the stateful twin of the batch
    * TS-HOLT-WINTERS fold — per-metric (level, trend, rotating m-seasonal)
    * state across micro-batches, emitting each point's 1-STEP-AHEAD
    * forecast (level + trend + next seasonal, computed BEFORE the point
    * updates the state, so forecast error is observable per point; the
    * first `warmup` points are absorbed silently). Within a batch, points
    * fold in (epoch, value) order — the anomalies determinism recipe — so
    * any epoch-order-preserving micro-batch slicing equals the batch-mode
    * run of this SAME operator (asserted in StreamingSpec together with a
    * reference-fold cross-check). State is season+2 doubles and a count
    * per metric — bounded at any cardinality and stream length. */
  def holtWintersForecast(points: Dataset[RatePoint], alpha: Double = 0.3,
                          beta: Double = 0.2, gamma: Double = 0.3,
                          season: Int = 4, warmup: Int = 1): Dataset[ForecastOut] = {
    require(season >= 2, s"season must be >= 2, got $season")
    val session = points.sparkSession
    import session.implicits._
    points.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (metric: String, it: Iterator[RatePoint], state: GroupState[HwState]) =>
          var st = state.getOption.getOrElse(HwState(0L, Nil))
          val out = Seq.newBuilder[ForecastOut]
          it.toSeq.sortBy(p => (p.epoch, p.value)).foreach { p =>
            if (st.n == 0L) {
              st = HwState(1L, p.value +: 0.0 +: Seq.fill(season)(0.0))
            } else {
              val v = st.s
              val (l, b, sNow) = (v(0), v(1), v(2))
              if (st.n >= warmup) out += ForecastOut(metric, p.epoch, p.value, l + b + sNow)
              val l2 = alpha * (p.value - sNow) + (1 - alpha) * (l + b)
              val b2 = beta * (l2 - l) + (1 - beta) * b
              val s2 = gamma * (p.value - l2) + (1 - gamma) * sNow
              st = HwState(st.n + 1, l2 +: b2 +: (v.drop(3) :+ s2))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming k-step ordered funnel: the stateful twin of
    * [[graft.operators.Funnel]] — emits a [[FunnelHit]] the first time each
    * user completes each stage (stage i qualifying only within `windowSec`
    * of the FIRST qualifying stage-(i-1) time). Within a batch, events fold
    * in (epoch, stage-index) order — the stage-index tie-break reproduces
    * the batch operator's RANGE-frame semantics, where a stage-i event at
    * exactly the stage-(i-1) time qualifies. Any micro-batch slicing that
    * preserves cross-batch epoch order (the replay-source property) yields
    * the same hits as one batch, so the batch-mode run of this SAME
    * operator — and the window-based `Funnel.stepTimes` — serve as the
    * correctness oracle (asserted in StreamingSpec). State is k doubles
    * per user that has entered the funnel — bounded by funnel depth, not
    * stream length. Completed users' state must STAY (dropping it would
    * let a later event restart the funnel and emit duplicate hits — every
    * stage latches its FIRST time forever); at unbounded user cardinality
    * use `idleTimeout` (counterToRate's knob) to evict users with no
    * activity for the duration. An evicted user who reappears restarts
    * from stage 1 — the standard bounded-state trade-off, off by default
    * so the batch-parity contract stays exact. */
  def funnelSteps(points: Dataset[FunnelPoint], steps: Seq[String],
                  windowSec: Double,
                  idleTimeout: Option[String] = None): Dataset[FunnelHit] = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val session = points.sparkSession
    import session.implicits._
    val idx = steps.zipWithIndex.toMap
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[FunnelPoint], state: GroupState[FunnelTimes]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val t = state.getOption.map(_.times.toArray)
              .getOrElse(Array.fill(steps.size)(Double.NaN))
            val out = Seq.newBuilder[FunnelHit]
            it.toSeq
              .sortBy(p => (p.epoch, idx.getOrElse(p.step, Int.MaxValue)))
              .foreach { p =>
                idx.get(p.step).foreach { i =>
                  if (t(i).isNaN) {
                    val ok = if (i == 0) true
                    else !t(i - 1).isNaN && p.epoch <= t(i - 1) + windowSec
                    if (ok) { t(i) = p.epoch; out += FunnelHit(user, i + 1, p.epoch) }
                  }
                }
              }
            state.update(FunnelTimes(t.toSeq))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming as-of join — the stateful twin of
    * `operators.AsOfJoin.lastBefore` / the native merge exec: both
    * streams arrive as ONE keyed `AsOfPoint` stream (side 0 = left,
    * side 1 = right); each right event emits the greatest left epoch at
    * or before it SEEN SO FAR. State is ONE double per key (the running
    * last left epoch — monotone, so late in-batch reordering is handled
    * by the per-batch (epoch, side) sort and cross-batch state only ever
    * advances), bounded at any key cardinality; `idleTimeout` evicts
    * dead keys, as counterToRate does.
    *
    * Semantics caveat (inherent to append-mode streaming as-of): a left
    * event arriving in a LATER micro-batch than a right event cannot
    * retroactively match it — as-of looks backward in arrival order
    * across batches. Within a batch, order is restored exactly. */
  def asOfLastBefore(points: Dataset[AsOfPoint],
                     idleTimeout: Option[String] = None): Dataset[AsOfHit] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: Long, it: Iterator[AsOfPoint], state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption.map(_.lastLeft).getOrElse(Double.NaN)
            val out = Seq.newBuilder[AsOfHit]
            // left sorts before right at equal epochs → inclusive <=
            it.toSeq.sortBy(p => (p.epoch, p.side)).foreach { p =>
              if (p.side == 0) {
                if (last.isNaN || p.epoch >= last) last = p.epoch
              } else out += AsOfHit(p.id, key, p.epoch,
                if (last.isNaN) 0.0 else last, !last.isNaN)
            }
            if (!last.isNaN) state.update(AsOfState(last))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  def anomalies(points: Dataset[RatePoint], alpha: Double = 0.3,
                z: Double = 3.0, warmup: Int = 5): Dataset[AnomalyOut] = {
    val session = points.sparkSession
    import session.implicits._
    points.groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (metric: String, it: Iterator[RatePoint], state: GroupState[AnomalyState]) =>
          var st = state.getOption.getOrElse(AnomalyState(0L, 0.0, 0.0))
          val out = Seq.newBuilder[AnomalyOut]
          it.toSeq.sortBy(p => (p.epoch, p.value)).foreach { p =>
            if (st.n >= warmup && st.varr > 0.0) {
              val zs = (p.value - st.mean) / math.sqrt(st.varr)
              if (math.abs(zs) > z) out += AnomalyOut(metric, p.epoch, p.value, zs)
            }
            val d = p.value - st.mean
            val mean = st.mean + alpha * d
            val varr = (1.0 - alpha) * (st.varr + alpha * d * d)
            st = AnomalyState(st.n + 1, mean, varr)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming approximate distinct counts per (metric, window): a theta
    * sketch per key held in state, updated each micro-batch, the RUNNING
    * estimate emitted after every batch that touched the key (Append
    * mode — downstream keeps the latest row per key, the usual
    * running-aggregate contract). State is one serialized compact sketch:
    * ≤ ~8·2^lgK bytes per key WHATEVER the item cardinality — the reason
    * a 100 TB stream's unique-users-per-window fits in a state store
    * where an exact distinct (one state row per item) cannot. Below
    * 2^lgK distinct items the sketch is in exact mode, so the estimate
    * equals the true count and batch-slicing parity is bit-exact; above,
    * the estimate is within the published theta bounds and REMAINS
    * slicing-independent (union is order-insensitive on fixed data). */
  /** Streaming windowed quantiles with FIXED state per key: a KLL sketch
    * per (metric, window) in flatMapGroupsWithState — a few KB at any
    * cardinality (the quantile twin of [[approxDistinctByWindow]]).
    * Emits the running p50/p90 each batch; k=200 gives ~1.65 % rank error,
    * far inside the AGG-APPROX-QUANTILES band contract, so the estimates
    * land in the exact p40–p60 / p82–p98 bands deterministically. */
  def quantilesByWindow(points: Dataset[QuantilePoint], k: Int = 200,
                        idleTimeout: Option[String] = None): Dataset[QuantileOut] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(p => (p.metric, p.window))
      .flatMapGroupsWithState[Array[Byte], QuantileOut](
        OutputMode.Append(), timeoutConf) {
        (key: (String, Long), it: Iterator[QuantilePoint],
         state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sk = state.getOption
              .map(b => org.apache.datasketches.kll.KllDoublesSketch.heapify(
                org.apache.datasketches.memory.Memory.wrap(b)))
              .getOrElse(org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k))
            it.foreach(p => sk.update(p.value))
            state.update(sk.toByteArray)
            idleTimeout.foreach(state.setTimeoutDuration)
            if (sk.isEmpty) Iterator.empty
            else Iterator.single(QuantileOut(key._1, key._2,
              sk.getQuantile(0.5), sk.getQuantile(0.9)))
          }
      }
  }

  /** Streaming SCD2 change stream: the dimension-history builder as a
    * stateful operator — ONE (epoch, id, state) triple per key. Emits a
    * version-open row whenever a key's state null-safely changes
    * (no-op writes collapse, last-write-wins within a tick via the id
    * tie-break); `Cdc.scd2`'s `chg` stage is exactly this stream, so
    * batch mode reproduces the batch operator's change rows. Append-mode
    * caveat shared with every streaming CDC feed: a tick's writes must
    * arrive within one batch for in-tick LWW (already-emitted versions
    * cannot retract); cross-batch ticks assume epoch-ordered arrival.
    * `valid_to` is the NEXT change's `validFrom` — a consumer joins or
    * windows it on read, the open version is what streams. */
  def scd2Changes(points: Dataset[Scd2Point],
                  idleTimeout: Option[String] = None): Dataset[Scd2Change] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: Long, it: Iterator[Scd2Point], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.orNull
            val out = Seq.newBuilder[Scd2Change]
            // settle each tick FIRST (max id wins), THEN compare to the
            // running state — intermediate writes of a tick never emit
            val settled = it.toSeq.groupBy(_.epoch).toSeq.sortBy(_._1)
              .map { case (_, rows) => rows.maxBy(_.id) }
            settled.foreach { p =>
              val late = st != null &&
                (p.epoch < st.epoch || (p.epoch == st.epoch && p.id <= st.id))
              if (!late) {
                if (st == null || p.state != st.state)
                  out += Scd2Change(key, p.epoch, p.state)
                st = Scd2State(p.epoch, p.id, p.state)
              }
            }
            if (st != null) state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming one-sided CUSUM change detection with O(1) state per key.
    *
    * The batch recurrence S_t = max(0, S_{t-1} + (x_t − ref − drift)) has
    * the prefix-min closed form S_t = C_t − min(0, min_{i≤t} C_i) (the
    * TS-CUSUM plan), so the streaming state is just (C, min-prefix C) —
    * TWO doubles per key, never a window buffer. Points fold in
    * (epoch, id) order within each batch; the fold's addition order equals
    * the batch running-sum window's, so batch mode is bit-identical to the
    * TS-CUSUM window plan given the same `ref`.
    */
  def cusum(points: Dataset[CusumPoint], drift: Double = 5.0,
            threshold: Double = 500.0,
            idleTimeout: Option[String] = None): Dataset[CusumOut] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: Long, it: Iterator[CusumPoint], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(CusumState(0.0, 0.0))
            val out = Seq.newBuilder[CusumOut]
            it.toSeq.sortBy(p => (p.epoch, p.id)).foreach { p =>
              val c = st.c + (p.value - p.ref - drift)
              val minc = math.min(st.minc, c)
              st = CusumState(c, minc)
              val s = c - math.min(0.0, minc)
              out += CusumOut(key, p.id, s, s > threshold)
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  /** Streaming heavy hitters per (metric, window) — the third member of
    * the bounded-state sketch family (theta distinct, KLL quantiles, and
    * now Misra-Gries frequent items): at most `m` (item, count) counters
    * per key WHATEVER the item cardinality. The MG update: increment a
    * present item, insert while under m, otherwise decrement ALL counters
    * (dropping zeros) — the classic guarantee is count error ≤ N/(m+1),
    * and with ≤ m distinct items per key the counts are EXACT, which is
    * the STREAM-TOPK-NATIVE oracle contract (fixture cardinality sits
    * inside m). Each batch that touches a key re-emits its CURRENT top-k
    * (count desc, item asc — deterministic) in Append mode; downstream
    * keeps the latest set per key, the running-aggregate contract
    * [[approxDistinctByWindow]] documents. Decrement order is
    * data-independent, so batch slicing never changes the surviving
    * counters in the exact regime. */
  def topkByWindow(points: Dataset[TopkPoint], k: Int = 3, m: Int = 64,
                   idleTimeout: Option[String] = None): Dataset[TopkOut] = {
    require(k >= 1 && m >= k, s"need m >= k >= 1, got k=$k m=$m")
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(p => (p.metric, p.window))
      .flatMapGroupsWithState[Map[String, Long], TopkOut](
        OutputMode.Append(), timeoutConf) {
        (key: (String, Long), it: Iterator[TopkPoint],
         state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var counters = state.getOption.getOrElse(Map.empty[String, Long])
            it.foreach { p =>
              counters.get(p.item) match {
                case Some(c) => counters = counters.updated(p.item, c + 1)
                case None if counters.size < m =>
                  counters = counters.updated(p.item, 1L)
                case None =>
                  counters = counters.transform((_, c) => c - 1)
                    .filter(_._2 > 0)
              }
            }
            state.update(counters)
            idleTimeout.foreach(state.setTimeoutDuration)
            val (metric, window) = key
            counters.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
              .zipWithIndex.map { case ((item, c), i) =>
                TopkOut(metric, window, item, c, i + 1)
              }.iterator
          }
      }
  }

  /** Streaming alert-rule evaluation with a FOR clause — the stateful
    * twin of TS-ALERT-FOR: per key, an alert fires for each CLOSED run of
    * consecutive above-threshold points with ≥ `minPts` points spanning
    * ≥ `holdSec` seconds. State is the one OPEN run (three longs per key,
    * bounded at any cardinality); a run spanning micro-batches keeps
    * growing in state and emits exactly once, when a sub-threshold point
    * closes it (or the idle timeout fires — an idle stream's run is over,
    * so the timeout flushes a qualifying open run instead of losing it).
    * Emit-on-closure is the deterministic streaming contract: an open run
    * cannot emit early because later points may still extend it. Points
    * fold in (epoch, id) order within each batch; a CROSS-batch late
    * arrival below an open run's frontier (`epoch < aend`) is DROPPED —
    * moving the frontier backwards would shrink an already-grown run and
    * make results slicing-dependent. With in-order (or single-batch)
    * data nothing is late, so batch mode equals order-preserving batch
    * slicings exactly; event-time-exact late handling needs a
    * watermarked pre-sort upstream, as with every run-detection state
    * machine. */
  def alertFor(points: Dataset[AlertPoint], threshold: Double,
               minPts: Long, holdSec: Long,
               idleTimeout: Option[String] = None): Dataset[AlertOut] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    def qualifies(r: AlertRunState): Boolean =
      r.npts >= minPts && r.aend - r.astart >= holdSec
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (key: String, it: Iterator[AlertPoint], state: GroupState[AlertRunState]) =>
          if (state.hasTimedOut) {
            val flushed = state.getOption.filter(qualifies)
              .map(r => AlertOut(key, r.astart, r.aend, r.npts, r.aend - r.astart))
            state.remove()
            flushed.iterator
          } else {
            var open = state.getOption
            val out = Seq.newBuilder[AlertOut]
            it.toSeq.sortBy(p => (p.epoch, p.id)).foreach { p =>
              // late arrival below the open run's frontier: dropped (see
              // scaladoc) — it must not shrink the run or close it in
              // the event-time past
              val late = open.exists(r => p.epoch < r.aend)
              if (!late) {
                if (p.value > threshold)
                  open = Some(open.map(r => AlertRunState(r.astart, p.epoch, r.npts + 1))
                    .getOrElse(AlertRunState(p.epoch, p.epoch, 1L)))
                else {
                  open.filter(qualifies).foreach(r =>
                    out += AlertOut(key, r.astart, r.aend, r.npts, r.aend - r.astart))
                  open = None
                }
              }
            }
            open match {
              case Some(r) =>
                state.update(r)
                // timeout only makes sense with an OPEN run to flush
                idleTimeout.foreach(state.setTimeoutDuration)
              case None => if (state.exists) state.remove()
            }
            out.result().iterator
          }
      }
  }

  def approxDistinctByWindow(points: Dataset[DistinctPoint],
                             lgK: Int = 12,
                             idleTimeout: Option[String] = None): Dataset[DistinctOut] = {
    val session = points.sparkSession
    import session.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    points.groupByKey(p => (p.metric, p.window))
      .flatMapGroupsWithState[Array[Byte], DistinctOut](
        OutputMode.Append(), timeoutConf) {
        (key: (String, Long), it: Iterator[DistinctPoint],
         state: GroupState[Array[Byte]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (metric, window) = key
            val union = org.apache.datasketches.theta.SetOperation.builder()
              .setLogNominalEntries(lgK).buildUnion()
            state.getOption.foreach { bytes =>
              union.union(org.apache.datasketches.theta.Sketches.wrapSketch(
                org.apache.datasketches.memory.Memory.wrap(bytes)))
            }
            it.foreach(p => union.update(p.item))
            val compact = union.getResult
            state.update(compact.toByteArray)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(DistinctOut(metric, window, compact.getEstimate))
          }
      }
  }
}
