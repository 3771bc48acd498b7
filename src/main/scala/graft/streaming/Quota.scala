package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-actor daily admission quota — the ingestion guard every
  * multi-tenant event collector runs (an LRS throttling a runaway
  * activity provider, a crawler capping per-domain fetches): admit the
  * FIRST `n` events of each (user, UTC day) in EVENT-TIME order, drop the
  * rest.
  *
  * "First n in event-time order" is only deterministic if arrival order
  * can't leak into the decision, so this reuses the [[Funnel]] CEP
  * discipline: buffer arrivals in state, admit ONLY through events at or
  * below the current watermark, in (ts, event_id) order. Within the
  * watermark horizon, batch boundaries and arrival order cannot change
  * which events win the quota — output is a pure function of
  * (input set, watermark policy), and the batch window-rank twin
  * ([[graft.operators.EventOps.rateQuota]], `q_rate_quota`) is its exact
  * oracle (StreamingSpec proves per-event parity under reversed-order
  * chunked delivery). At-least-once redelivery admits once: a duplicate
  * inside the horizon collapses in the [[Horizon]] buffer, one behind the
  * frontier is a straggler and drops — either way the decision matches
  * the batch twin over the unique-row input set.
  *
  * State per user: the watermark-horizon buffer plus one (day, admitted)
  * counter for the newest day at or below the watermark — earlier days
  * can never admit again (any future event above the watermark is in a
  * later or equal day), so finished days are dropped eagerly and state is
  * bounded by the lateness horizon, not the stream length. Keys expire
  * like [[Funnel]]: once drained and the counter's day is entirely below
  * the watermark horizon, the machine is re-creatable from zero state. */
object Quota {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)

  /** `pending` = buffered (tsUs, event_id) above the watermark at last
    * advance; `frontierUs` = that watermark (arrivals at or below it are
    * stragglers, dropped — the [[Horizon]] policy shared with [[Funnel]]);
    * `day`/`admitted` = the admission counter for the newest processed day
    * (sentinel day = Long.MinValue before any admission). Time is
    * MICROSECONDS, and the epoch-day uses the same truncating division as
    * the batch twin's `div` / the oracle's `//` — floorDiv would bucket
    * pre-1970 timestamps into a different day than the twins.
    * `unitVer` fails restarts from a ms-era checkpoint fast (added field →
    * state-schema mismatch) instead of reinterpreting ms as µs. */
  case class QState(pending: List[(Long, Long)], frontierUs: Long,
                    day: Long, admitted: Int, unitVer: Int = 2)

  case class Admitted(user_id: Long, event_id: Long, ts: Timestamp)

  private val DayUs = 86400000000L

  def process(n: Int)(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[QState]): Iterator[Admitted] = {
    val wmUs = Horizon.wmMicros(state)
    val cur = state.getOption.getOrElse(
      QState(Nil, Long.MinValue, Long.MinValue, 0))
    val (ready, rest) = Horizon.advance(cur.pending,
      rows.map(e => (Horizon.micros(e.ts), e.event_id)),
      cur.frontierUs, wmUs, (t: (Long, Long)) => t._1)
    var day = cur.day
    var admitted = cur.admitted
    val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
    ready.foreach { case (t, id) =>
      val d = t / DayUs // truncating, == the batch twin's integer `div`
      if (d != day) { day = d; admitted = 0 } // ts-ordered: strictly newer day
      if (admitted < n) {
        admitted += 1; out += Admitted(key, id, Horizon.toTimestamp(t))
      }
    }
    // state hygiene (the Horizon rule): forget the key only once the
    // watermark has strictly passed the frontier AND the counter's whole
    // day is below it — a fresh machine then reproduces the same decisions
    val expired = rest.isEmpty && Horizon.frontierPassed(cur.frontierUs, wmUs) &&
      (day == Long.MinValue || (day + 1) * DayUs <= wmUs)
    if (expired) state.remove()
    else {
      state.update(QState(rest, wmUs, day, admitted))
      val wmMs = state.getCurrentWatermarkMs()
      // sentinel day would overflow (day+1)*DayUs — re-arm at wm+1 instead
      val nextDayUs = if (day == Long.MinValue) wmUs + 1000 else (day + 1) * DayUs
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(Horizon.rearmMs(rest.head._1, wmMs))
      else state.setTimeoutTimestamp(Horizon.rearmMs(nextDayUs, wmMs))
    }
    out.iterator
  }

  /** @param events stream with a watermark already set on `ts` */
  def apply(events: Dataset[Ev], n: Int = 5): Dataset[Admitted] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(n))
  }
}
