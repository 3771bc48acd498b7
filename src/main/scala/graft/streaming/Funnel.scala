package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP pattern matching (north rule: "structured-streaming / CEP
  * engine") — the time-bounded funnel `view →(≤H) click →(≤H) purchase`
  * run incrementally per user with `flatMapGroupsWithState`.
  *
  * Unlike [[Sessionize]] (whose gap semantics tolerate greedy per-batch
  * processing), an ordered-pattern machine is only deterministic if events
  * are consumed in event-time order. So this operator buffers arrivals in
  * state and advances the machine ONLY through events at or below the
  * current watermark — the standard CEP discipline (Flink's CEP library
  * does exactly this): within the watermark horizon, arrival order and
  * batch boundaries cannot change the output. Events that arrive after the
  * watermark has passed them (true stragglers) are dropped, mirroring how
  * the rest of the pipeline routes late rows. Result: output is a pure
  * function of (input set, watermark policy) — the north-rule determinism
  * contract — and [[graft.operators.EventOps.cepFunnel]]'s windowed state
  * machine is its exact batch twin (StreamingSpec proves per-event parity).
  *
  * State per user is O(events inside the watermark horizon) + two longs —
  * bounded by the lateness bound, not the stream length. At 10^12-event
  * scale the key space (actors) shards across the RocksDB state store; the
  * per-key buffer stays small because the watermark keeps draining it.
  */
object Funnel {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

  /** `pending` = buffered (tsUs, event_id, event_type) not yet below the
    * watermark; `frontierUs` = watermark at last advance (arrivals at or
    * below it are stragglers, dropped); sentinel Long.MinValue = "not
    * seen". Time is MICROSECONDS ([[Horizon]]): the batch twin orders and
    * bounds at full timestamp precision, so ms truncation would diverge
    * whenever two events share a millisecond across an order or bound
    * boundary.
    * `unitVer` exists to FAIL FAST on restart from a checkpoint written by
    * the millisecond-era state layout: the numeric fields reinterpret
    * silently (ms read as µs = Jan 1970), but an added field changes the
    * state schema, so Spark's compatibility check rejects the old
    * checkpoint with a clear error instead of replaying garbage. */
  case class FState(pending: List[(Long, Long, String)], frontierUs: Long,
                    lastViewUs: Long, lastQClickUs: Long, unitVer: Int = 2)

  case class Conversion(user_id: Long, event_id: Long, ts: Timestamp)

  val DefaultBoundMs: Long = 12L * 3600 * 1000 // EventOps.cepFunnel's 12h

  def process(boundMs: Long)(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[FState]): Iterator[Conversion] = {
    val boundUs = boundMs * 1000L
    val wmUs = Horizon.wmMicros(state)
    val cur = state.getOption.getOrElse(
      FState(Nil, Long.MinValue, Long.MinValue, Long.MinValue))
    val (ready, rest) = Horizon.advance(cur.pending,
      rows.map(e => (Horizon.micros(e.ts), e.event_id, e.event_type)),
      cur.frontierUs, wmUs, (t: (Long, Long, String)) => t._1)

    var lastView = cur.lastViewUs
    var lastQClick = cur.lastQClickUs
    val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
    ready.foreach { case (t, id, typ) =>
      typ match {
        case "view" => lastView = t
        case "click" =>
          if (lastView != Long.MinValue && t - lastView <= boundUs) lastQClick = t
        case "purchase" =>
          if (lastQClick != Long.MinValue && t - lastQClick <= boundUs)
            out += Conversion(key, id, Horizon.toTimestamp(t))
        case _ => ()
      }
    }

    // State hygiene: once pending has drained AND both remembered stage
    // timestamps are too old to ever qualify a future event (any future
    // click/purchase arrives above the watermark, so its gap to a stage
    // older than wm - bound exceeds the bound), the machine is re-creatable
    // from zero state — remove the key instead of keeping state forever
    // (else the store grows with lifetime-distinct users, not active
    // ones). Horizon.frontierPassed guards the ts == wm boundary: removal
    // must be indistinguishable from a live key's straggler filter.
    val expired = rest.isEmpty && Horizon.frontierPassed(cur.frontierUs, wmUs) &&
      (lastView == Long.MinValue || lastView < wmUs - boundUs) &&
      (lastQClick == Long.MinValue || lastQClick < wmUs - boundUs)
    if (expired) state.remove()
    else {
      state.update(FState(rest, wmUs, lastView, lastQClick))
      // re-arm so the buffer drains as soon as the watermark reaches its
      // earliest pending event, even if no further rows arrive for this
      // key; a drained-but-live key re-arms at the moment its stages
      // expire so the removal above happens without new arrivals
      val wmMs = state.getCurrentWatermarkMs()
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(Horizon.rearmMs(rest.head._1, wmMs))
      else state.setTimeoutTimestamp(
        Horizon.rearmMs(math.max(lastView, lastQClick) + boundUs + 1000, wmMs))
    }
    out.iterator
  }

  /** @param events stream with a watermark already set on `ts` */
  def apply(events: Dataset[Ev], boundMs: Long = DefaultBoundMs): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(boundMs))
  }
}
