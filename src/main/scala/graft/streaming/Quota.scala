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
  * oracle (QuotaSpec proves per-event parity, including under shuffled
  * arrival and redelivery).
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

  /** `pending` = buffered (tsMs, event_id) above the watermark at last
    * advance; `frontierMs` = that watermark (arrivals at or below it are
    * stragglers, dropped — same policy as [[Funnel]]); `day`/`admitted` =
    * the admission counter for the newest processed day (sentinel day =
    * Long.MinValue before any admission). */
  case class QState(pending: List[(Long, Long)], frontierMs: Long,
                    day: Long, admitted: Int)

  case class Admitted(user_id: Long, event_id: Long, ts: Timestamp)

  private val DayMs = 86400000L

  def process(n: Int)(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[QState]): Iterator[Admitted] = {
    val wm = state.getCurrentWatermarkMs()
    val cur = state.getOption.getOrElse(
      QState(Nil, Long.MinValue, Long.MinValue, 0))
    val fresh = rows.map(e => (e.ts.getTime, e.event_id))
      .filter(_._1 > cur.frontierMs)
    val all = (cur.pending ++ fresh).sortBy(identity)
    val (ready, rest) = all.partition(_._1 <= wm)
    var day = cur.day
    var admitted = cur.admitted
    val out = scala.collection.mutable.ArrayBuffer.empty[Admitted]
    ready.foreach { case (t, id) =>
      val d = Math.floorDiv(t, DayMs)
      if (d != day) { day = d; admitted = 0 } // ts-ordered: strictly newer day
      if (admitted < n) { admitted += 1; out += Admitted(key, id, new Timestamp(t)) }
    }
    // state hygiene (the Funnel rule): forget the key only once the
    // watermark has strictly passed the frontier AND the counter's whole
    // day is below it — a fresh machine then reproduces the same decisions
    val expired = rest.isEmpty && cur.frontierMs < wm &&
      (day == Long.MinValue || (day + 1) * DayMs <= wm)
    if (expired) state.remove()
    else {
      state.update(QState(rest, wm, day, admitted))
      // sentinel day would overflow (day+1)*DayMs — re-arm at wm+1 instead
      val nextDayMs = if (day == Long.MinValue) wm + 1 else (day + 1) * DayMs
      if (rest.nonEmpty) state.setTimeoutTimestamp(math.max(rest.head._1, wm + 1))
      else state.setTimeoutTimestamp(math.max(nextDayMs, wm + 1))
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
