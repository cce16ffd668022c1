package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Arbitrary stateful processing on the state-API-v2 path:
  * `transformWithState` + [[StatefulProcessor]] (Spark 4), the
  * production successor to `flatMapGroupsWithState` ([[Sessionize]]
  * keeps the v1 form). What v2 buys at 100 TB:
  *
  *  - typed state PRIMITIVES instead of one opaque blob: a ValueState
  *    update rewrites a single key, a MapState entry is its own store
  *    row — so per-key state can grow (distinct sets, timelines)
  *    without rewriting everything on every event;
  *  - state lives in the RocksDB store's column families (v2 REQUIRES
  *    the RocksDB provider), i.e. on local SSD with bounded heap —
  *    the same reason RocksDBStateStoreSpec pins that backend;
  *  - schema evolution + TTL per state variable.
  *
  * The processor here is the crawl/analytics staple: per-user running
  * totals (ValueState) plus a distinct event-type registry (MapState),
  * the streaming twin of `GROUP BY user_id` with `count`, `sum`,
  * `count(DISTINCT event_type)`. The reference's visited-set
  * (`web_spider_oo.py:87,99-101`) is exactly this shape of state —
  * membership keyed by value — held here per group key in MapState.
  *
  * Emission contract: one row per (key, micro-batch) in Update mode,
  * carrying the running totals AFTER folding that batch. `n` is
  * strictly increasing per key, so `max_by(struct, n)` downstream
  * recovers the final totals independent of batch layout — which is
  * what [[finalTotals]] does, making the result equal to the batch
  * aggregate bit-for-bit (cents are floor-quantized to LONG).
  */
object StateV2 {

  case class Ev(user_id: Long, event_id: Long, cents: Long, event_type: String)
  case class Totals(n: Long, cents: Long)
  case class UserTotals(user_id: Long, n: Long, cents: Long, n_types: Long)
  /** Warm-start seed: a user's pre-aggregated history. */
  case class Seed(user_id: Long, n: Long, cents: Long, types: Array[String])

  /** Shared fold: state init + per-batch input handling, reused by the
    * cold-start and warm-start processor shells below. */
  sealed trait TotalsLogic { self: StatefulProcessor[Long, Ev, UserTotals] =>
    @transient protected var totals: ValueState[Totals] = _
    @transient protected var types: MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)
      types = getHandle.getMapState[String, Boolean]("types",
        Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserTotals] = {
      var t = if (totals.exists()) totals.get() else Totals(0L, 0L)
      rows.foreach { e =>
        t = Totals(t.n + 1, t.cents + e.cents)
        if (!types.containsKey(e.event_type)) types.updateValue(e.event_type, true)
      }
      totals.update(t)
      // keys() streams the map's store rows — no whole-set deserialize
      var nTypes = 0L
      types.keys().foreach(_ => nTypes += 1)
      Iterator.single(UserTotals(key, t.n, t.cents, nTypes))
    }
  }

  /** Running (count, cents-sum, distinct-type-count) per user. */
  class RunningTotals extends StatefulProcessor[Long, Ev, UserTotals]
    with TotalsLogic

  /** Same fold, warm-started: each key's state is seeded from a batch
    * [[Seed]] before the first micro-batch — the incremental-crawl
    * bootstrap (the reference reloads its visited set when a crawl
    * resumes; here yesterday's aggregates seed today's stream). */
  class RunningTotalsWarmStart
    extends StatefulProcessorWithInitialState[Long, Ev, UserTotals, Seed]
    with TotalsLogic {
    override def handleInitialState(key: Long, seed: Seed,
        timerValues: TimerValues): Unit = {
      totals.update(Totals(seed.n, seed.cents))
      seed.types.foreach(t => types.updateValue(t, true))
    }
  }

  case class TimedEv(user_id: Long, us: Long,
                     ts: java.sql.Timestamp = new java.sql.Timestamp(0))
  case class IdleOut(user_id: Long, n: Long, last_us: Long)

  /** Event-time timers (state API v2's third leg beside typed state and
    * initial state): accumulate per-user (count, last-seen), keep ONE
    * timer parked at last_us + gap, and when the WATERMARK passes it,
    * emit the user's totals and clear state — the idle-key flush that
    * caps state size on an unbounded keyspace (the crawl analogue:
    * evict a host's politeness/visited context once it has gone quiet).
    * Append-mode output: rows exist only when a key goes idle, so a
    * finite fixture plus a far-future watermark sentinel emits exactly
    * one row per user — the batch GROUP BY, hash-checkable. */
  class IdleFlush(gapMs: Long) extends StatefulProcessor[Long, TimedEv, IdleOut] {
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals]("idle_totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEv],
        timerValues: TimerValues): Iterator[IdleOut] = {
      // Totals.cents doubles as last-seen micros here
      var t = if (totals.exists()) totals.get() else Totals(0L, Long.MinValue)
      rows.foreach(e => t = Totals(t.n + 1, math.max(t.cents, e.us)))
      totals.update(t)
      // one live timer per key: re-park it at the new idle horizon
      getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts))
      getHandle.registerTimer(t.cents / 1000 + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[IdleOut] = {
      val out = totals.get()
      totals.clear()
      Iterator.single(IdleOut(key, out.n, out.cents))
    }
  }

  /** events(user_id, ts TIMESTAMP) → one (user_id, n, last_us) row per
    * idle period. Input must be a STREAMING DataFrame; the watermark
    * drives timer expiry. */
  def idleFlush(spark: SparkSession, events: DataFrame, gapMs: Long,
      watermarkDelay: String = "1 hour"): Dataset[IdleOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[TimedEv]
      .groupByKey(_.user_id)
      .transformWithState(new IdleFlush(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** events(user_id, event_id, value, event_type) → per-batch running
    * totals per user. Input must be a STREAMING DataFrame. */
  def runningTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotals] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Update())
  }

  /** Warm-start variant of [[runningTotals]]: `seeds` is a BATCH
    * DataFrame (user_id, n, cents, types ARRAY<STRING>) loaded into
    * state before the first micro-batch. Keys that never appear in the
    * stream emit nothing (Update mode emits on input only). */
  def runningTotalsWarmStart(spark: SparkSession, events: DataFrame,
      seeds: DataFrame): Dataset[UserTotals] = {
    import spark.implicits._
    val init = seeds.as[Seed].groupByKey(_.user_id)
    events
      .select(col("user_id"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsWarmStart, TimeMode.None(),
        OutputMode.Update(), init)
  }

  /** Collapse Update-mode per-batch emissions to the final totals:
    * `n` strictly increases per key, so the lexicographically-max
    * struct is the last batch's row. */
  def finalTotals(perBatch: DataFrame): DataFrame =
    perBatch
      .groupBy("user_id")
      .agg(max(struct(col("n"), col("cents"), col("n_types"))).as("t"))
      .select(col("user_id"), col("t.n").as("n"), col("t.cents").as("cents"),
        col("t.n_types").as("n_types"))

  case class ScoredEv(user_id: Long, event_id: Long, us: Long, cents: Long)
  case class EwmaOut(user_id: Long, seq: Long, n_used: Long,
                     swx: Long, sw: Long)

  /** ListState (the third typed-state primitive beside ValueState and
    * MapState): a bounded per-key ROLLING WINDOW of the K most recent
    * events, folded incrementally — each batch merges into the stored
    * list and trims back to K, so state per key is K rows regardless of
    * stream length (the store appends/replaces list entries as their
    * own rows — no opaque-blob rewrite of a growing collection).
    *
    * The emission carries the dyadic-EWMA integer sums over the kept
    * window (weights 2^(K−j), newest j=1 — the q_ewma_exact lattice),
    * plus a strictly-increasing per-key `seq` so `max_by(_, seq)`
    * downstream recovers the final state independent of batch layout.
    * Keep-top-K by (us, event_id) desc is associative, so the fold is
    * batch-layout-independent too: the drained result equals the batch
    * last-K EWMA bit-for-bit. */
  class RollingEwma(k: Int)
    extends StatefulProcessor[Long, ScoredEv, EwmaOut] {
    @transient private var recent: ListState[ScoredEv] = _
    @transient private var seq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[ScoredEv]("recent",
        Encoders.product[ScoredEv], TTLConfig.NONE)
      seq = getHandle.getValueState[Long]("seq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ScoredEv],
        timerValues: TimerValues): Iterator[EwmaOut] = {
      val merged = (recent.get().toArray ++ rows)
        .sortBy(e => (-e.us, -e.event_id)).take(k)
      recent.put(merged)
      val s = (if (seq.exists()) seq.get() else 0L) + 1L
      seq.update(s)
      var swx = 0L; var sw = 0L
      merged.zipWithIndex.foreach { case (e, i) =>
        val wt = 1L << (k - (i + 1)); swx += wt * e.cents; sw += wt
      }
      Iterator.single(EwmaOut(key, s, merged.length.toLong, swx, sw))
    }
  }

  /** Rolling last-k EWMA per user over a ScoredEv stream. */
  def rollingEwma(spark: SparkSession, events: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    events.selectExpr("user_id", "event_id", "us", "cents").as[ScoredEv]
      .groupByKey(_.user_id)
      .transformWithState(new RollingEwma(k), TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }
}
