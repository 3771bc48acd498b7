package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-actor sessionization (A3, north rule):
  * `flatMapGroupsWithState` keyed by (actor, source) with an event-time gap
  * timeout, RocksDB-backed state. Emits CLOSED sessions only (append mode):
  * a session closes when a new event arrives past the gap, or when the
  * watermark passes session_end + gap (timeout path) — so results are
  * deterministic for a given input + watermark, per the north rule.
  *
  * The session payload (count, bounds, verb histogram) is the custom state
  * the reference never had (its only aggregates were counters); the plain
  * count/bounds variant is also expressible with the built-in
  * `session_window` — kept in [[StreamPipeline.sessionWindowCounts]].
  */
object Sessionize {

  case class Event(actor_key: String, source: String, ts: Timestamp, verb_id: String)

  case class SessionState(start: Long, end: Long, n: Long, verbs: Map[String, Long])

  case class Session(
      actor_key: String, source: String,
      session_start: Timestamp, session_end: Timestamp,
      n_events: Long, n_verbs: Int, top_verb: String)

  val DefaultGapMs: Long = 30L * 60 * 1000 // 30 minutes (SURVEY.md §2.8 A3)

  private def toSession(key: (String, String), s: SessionState): Session = {
    val top = s.verbs.toSeq.sortBy { case (v, n) => (-n, v) }.head._1
    Session(key._1, key._2, new Timestamp(s.start), new Timestamp(s.end),
      s.n, s.verbs.size, top)
  }

  def process(gapMs: Long)(
      key: (String, String),
      rows: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(key, _)).iterator
      state.remove()
      return out
    }
    // within a microbatch rows are unordered — sort by event time
    val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.verb_id))
    var cur = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.end <= gapMs =>
          cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1,
            s.verbs.updated(e.verb_id, s.verbs.getOrElse(e.verb_id, 0L) + 1)))
        case Some(s) => // gap exceeded → close previous, open new
          closed += toSession(key, s)
          cur = Some(SessionState(t, t, 1, Map(e.verb_id -> 1L)))
        case None =>
          cur = Some(SessionState(t, t, 1, Map(e.verb_id -> 1L)))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close when the event-time watermark passes end-of-session + gap
      state.setTimeoutTimestamp(s.end + gapMs)
    }
    closed.iterator
  }

  /** @param statements stream with actor_key/source/ts/verb_id and a
    *                    watermark already set on ts */
  def apply(statements: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import statements.sparkSession.implicits._
    statements
      .groupByKey(e => (e.actor_key, e.source))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapMs))
  }
}
