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

  /** `pending` = buffered (tsMs, event_id, event_type) not yet below the
    * watermark; `frontierMs` = watermark at last advance (arrivals at or
    * below it are stragglers, dropped); sentinel Long.MinValue = "not seen". */
  case class FState(pending: List[(Long, Long, String)], frontierMs: Long,
                    lastViewMs: Long, lastQClickMs: Long)

  case class Conversion(user_id: Long, event_id: Long, ts: Timestamp)

  val DefaultBoundMs: Long = 12L * 3600 * 1000 // EventOps.cepFunnel's 12h

  def process(boundMs: Long)(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[FState]): Iterator[Conversion] = {
    val wm = state.getCurrentWatermarkMs()
    val cur = state.getOption.getOrElse(
      FState(Nil, Long.MinValue, Long.MinValue, Long.MinValue))
    val fresh = rows.map(e => (e.ts.getTime, e.event_id, e.event_type))
      .filter(_._1 > cur.frontierMs) // straggler policy: drop-before-frontier
    val all = (cur.pending ++ fresh).sortBy(t => (t._1, t._2))
    val (ready, rest) = all.partition(_._1 <= wm)

    var lastView = cur.lastViewMs
    var lastQClick = cur.lastQClickMs
    val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
    ready.foreach { case (t, id, typ) =>
      typ match {
        case "view" => lastView = t
        case "click" =>
          if (lastView != Long.MinValue && t - lastView <= boundMs) lastQClick = t
        case "purchase" =>
          if (lastQClick != Long.MinValue && t - lastQClick <= boundMs)
            out += Conversion(key, id, new Timestamp(t))
        case _ => ()
      }
    }

    // State hygiene: once pending has drained AND both remembered stage
    // timestamps are too old to ever qualify a future event (any future
    // click/purchase arrives above the watermark, so its gap to a stage
    // older than wm - bound exceeds the bound), the machine is re-creatable
    // from zero state — remove the key instead of keeping (frontier,
    // lastViewMs, lastQClickMs) forever. Without this, state-store size
    // grows with lifetime-distinct users, not active ones.
    // `frontierMs < wm` keeps removal indistinguishable from a live key:
    // a live key drops ts <= frontier; Spark's watermark filter drops only
    // ts < wm. Removing while frontier == wm would let a redelivered event
    // with ts == wm convert on an expired key but not on a live one —
    // breaking the "pure function of (input set, watermark policy)"
    // contract at the boundary. Once frontier < wm, everything a live key
    // would drop is already below the watermark, so zero state is exact.
    val expired = rest.isEmpty && cur.frontierMs < wm &&
      (lastView == Long.MinValue || lastView < wm - boundMs) &&
      (lastQClick == Long.MinValue || lastQClick < wm - boundMs)
    if (expired) state.remove()
    else {
      state.update(FState(rest, wm, lastView, lastQClick))
      // re-arm so the buffer drains as soon as the watermark reaches its
      // earliest pending event, even if no further rows arrive for this key;
      // a drained-but-live key re-arms at the moment its stages expire so
      // the removal above actually happens without new arrivals
      if (rest.nonEmpty) state.setTimeoutTimestamp(math.max(rest.head._1, wm + 1))
      // wm+1 floor: with the frontier guard above, this branch is reachable
      // with stages already older than wm - bound (kept only until the
      // watermark passes the frontier) — Spark rejects a timeout <= wm
      else state.setTimeoutTimestamp(
        math.max(math.max(lastView, lastQClick) + boundMs + 1, wm + 1))
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
