package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CEP pattern matching (north rule: "structured-streaming / CEP
  * engine") — a time-bounded ordered funnel over an ARBITRARY stage list
  * `p₀ →(≤H) p₁ →(≤H) … →(≤H) pₙ₋₁` run incrementally per user with
  * `flatMapGroupsWithState` (r6: the stages were hardcoded
  * view→click→purchase through r5; real usage is any ordered verb list —
  * e.g. xAPI video funnels initialized→played→completed — VERDICT r5
  * Next #4).
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
  * machine is its exact batch twin (StreamingSpec proves per-event parity
  * for the default 3-stage config AND a 4-stage one with a repeated type).
  *
  * State per user is O(events inside the watermark horizon) + (n−1) longs —
  * bounded by the lateness bound and the pattern length, not the stream
  * length. At 10^12-event scale the key space (actors) shards across the
  * RocksDB state store; the per-key buffer stays small because the
  * watermark keeps draining it.
  */
object Funnel {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

  /** `pending` = buffered (tsUs, event_id, event_type) not yet below the
    * watermark; `frontierUs` = watermark at last advance (arrivals at or
    * below it are stragglers, dropped); `stageUs(j)` = timestamp of the
    * last QUALIFIED occurrence of stage j (0 ≤ j < n−1; the final stage
    * emits instead of remembering), sentinel Long.MinValue = "not seen".
    * Time is MICROSECONDS ([[Horizon]]): the batch twin orders and bounds
    * at full timestamp precision, so ms truncation would diverge whenever
    * two events share a millisecond across an order or bound boundary.
    * `unitVer` exists to FAIL FAST on restart from a checkpoint written by
    * an earlier state layout (the ms-era fields, or the r5 fixed
    * two-stage-scalar shape): numeric fields reinterpret silently, but the
    * changed schema makes Spark's compatibility check reject the old
    * checkpoint with a clear error instead of replaying garbage; a
    * PATTERN-LENGTH change on restart passes the schema check (same
    * List[Long] type), so `process` additionally fails fast on a stage
    * vector whose length disagrees with the configured pattern. */
  case class FState(pending: List[(Long, Long, String)], frontierUs: Long,
                    stageUs: List[Long], unitVer: Int = 3)

  case class Conversion(user_id: Long, event_id: Long, ts: Timestamp)

  val DefaultPattern: Seq[String] = Seq("view", "click", "purchase")
  val DefaultBoundMs: Long = 12L * 3600 * 1000 // EventOps.cepFunnel's 12h

  def process(boundMs: Long, pattern: IndexedSeq[String])(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[FState]): Iterator[Conversion] = {
    val boundUs = boundMs * 1000L
    val n = pattern.length
    val wmUs = Horizon.wmMicros(state)
    val cur = state.getOption.getOrElse(
      FState(Nil, Long.MinValue, List.fill(n - 1)(Long.MinValue)))
    require(cur.stageUs.length == n - 1,
      s"checkpointed stage vector has ${cur.stageUs.length} entries but the " +
        s"configured pattern needs ${n - 1} — restarting with a different " +
        "pattern over an old checkpoint is not upgradable")
    val (ready, rest) = Horizon.advance(cur.pending,
      rows.map(e => (Horizon.micros(e.ts), e.event_id, e.event_type)),
      cur.frontierUs, wmUs, (t: (Long, Long, String)) => t._1)

    val stage = cur.stageUs.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
    ready.foreach { case (t, id, typ) =>
      // every stage check reads the PRE-event snapshot, so an event can
      // never qualify itself — the batch twin's window is strictly
      // previous rows; load-bearing when a type repeats in the pattern
      // (e.g. view→click→view), where one event may match several stages
      val prev = stage.clone()
      var j = 0
      while (j < n) {
        if (pattern(j) == typ) {
          if (j == 0) stage(0) = t
          else if (prev(j - 1) != Long.MinValue && t - prev(j - 1) <= boundUs) {
            if (j == n - 1) out += Conversion(key, id, Horizon.toTimestamp(t))
            else stage(j) = t
          }
        }
        j += 1
      }
    }

    // State hygiene: once pending has drained AND every remembered stage
    // timestamp is too old to ever qualify a future event (any future
    // arrival sits above the watermark, so its gap to a stage older than
    // wm - bound exceeds the bound), the machine is re-creatable from zero
    // state — remove the key instead of keeping state forever (else the
    // store grows with lifetime-distinct users, not active ones).
    // Horizon.frontierPassed guards the ts == wm boundary: removal must be
    // indistinguishable from a live key's straggler filter.
    val maxStage = stage.max // stage is nonempty (n ≥ 2)
    val expired = rest.isEmpty && Horizon.frontierPassed(cur.frontierUs, wmUs) &&
      (maxStage == Long.MinValue || maxStage < wmUs - boundUs)
    if (expired) state.remove()
    else {
      state.update(FState(rest, wmUs, stage.toList))
      // re-arm so the buffer drains as soon as the watermark reaches its
      // earliest pending event, even if no further rows arrive for this
      // key; a drained-but-live key re-arms at the moment its stages
      // expire so the removal above happens without new arrivals
      val wmMs = state.getCurrentWatermarkMs()
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(Horizon.rearmMs(rest.head._1, wmMs))
      else state.setTimeoutTimestamp(
        Horizon.rearmMs(maxStage + boundUs + 1000, wmMs))
    }
    out.iterator
  }

  /** @param events stream with a watermark already set on `ts`
    * @param pattern the ordered stage list (≥ 2 stages; the last emits) */
  def apply(events: Dataset[Ev], boundMs: Long = DefaultBoundMs,
            pattern: Seq[String] = DefaultPattern): Dataset[Conversion] = {
    require(pattern.length >= 2, "a funnel needs at least two stages")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(boundMs, pattern.toIndexedSeq))
  }
}
