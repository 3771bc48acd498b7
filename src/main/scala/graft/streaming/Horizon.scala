package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** The shared watermark-horizon buffer discipline behind the ordered CEP
  * machines ([[Funnel]], [[Quota]]): buffer arrivals in state, advance the
  * machine only through events at or below the watermark in EVENT-TIME
  * order, drop frontier stragglers, re-arm event-time timeouts strictly
  * above the watermark. One home for the boundary reasoning — the
  * straggler policy, the ts==watermark removal-equivalence guard, the
  * timeout floor — so the machines can't silently drift apart (each once
  * carried its own copy).
  *
  * Time is MICROSECONDS end to end: the batch twins order by the full
  * timestamp precision (`orderBy(ts, event_id)` on µs-precision parquet)
  * and measure gaps with µs interval arithmetic, so a machine that
  * truncates to `Timestamp.getTime` milliseconds diverges from its twin
  * whenever two events share a millisecond across a quota/bound boundary.
  * Spark reports the watermark in ms ([[GroupState.getCurrentWatermarkMs]]);
  * scaling it by 1000 is conservative in the right direction (an event in
  * the watermark's partial millisecond stays buffered one batch longer —
  * order, not membership, decides the output). */
private[graft] object Horizon {

  /** Full-precision epoch microseconds (valid pre-1970: `getTime` carries
    * the ms and `getNanos` the entire sub-second). */
  def micros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  def toTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Current watermark in µs. */
  def wmMicros(state: GroupState[_]): Long =
    state.getCurrentWatermarkMs() * 1000L

  /** Merge fresh arrivals into the pending buffer and split at the
    * watermark: (ready, rest), both in ascending `ord` order. Arrivals at
    * or below the frontier — the watermark at the buffer's last advance —
    * are stragglers, dropped (a live key already processed that horizon;
    * [[expireable]] keeps removal consistent with this). Exact duplicates
    * are collapsed so at-least-once redelivery inside the horizon admits
    * once, like the batch twin over the (unique-row) input set. */
  def advance[E](pending: List[E], fresh: Iterator[E], frontierUs: Long,
                 wmUs: Long, ts: E => Long)(
                 implicit ord: Ordering[E]): (List[E], List[E]) = {
    val f = fresh.filter(e => ts(e) > frontierUs)
    val all = (pending ++ f).distinct.sorted
    all.partition(e => ts(e) <= wmUs)
  }

  /** True when forgetting the key is indistinguishable from keeping it:
    * the frontier is strictly below the watermark, so everything a live
    * key's straggler filter would drop is already below Spark's own late
    * filter. Removing while frontier == wm would let a redelivered event
    * at exactly the watermark behave differently on an expired key than
    * on a live one — the machine must also check its own state is
    * re-creatable (stages aged out, day complete) before removing. */
  def frontierPassed(frontierUs: Long, wmUs: Long): Boolean =
    frontierUs < wmUs

  /** Event-time re-arm in ms, strictly above the current watermark (Spark
    * rejects a timeout <= wm). `candidateUs` is where the machine next
    * needs waking — the earliest pending event, or the moment its state
    * becomes removable. */
  def rearmMs(candidateUs: Long, wmMs: Long): Long =
    math.max(Math.floorDiv(candidateUs, 1000L), wmMs + 1)
}
