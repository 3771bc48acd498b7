package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SQL-oracle-checkable twins of the LRS/streaming operators, expressed
  * over the sandbox `events` proxy table
  * `(event_id, ts, user_id, event_type, value, props)` — statement-shaped
  * per FIXTURES.md §7: event_id≈statement id, user_id≈actor, event_type≈verb.
  *
  * Every query here is the exact batch semantics of a SURVEY.md §2 operator;
  * the streaming pipeline reuses the same expressions incrementally.
  */
object EventOps {

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  def tsStr(c: org.apache.spark.sql.Column) = date_format(c, tsFmt)

  /** F5+F8+F9+O1+O2: verb filter, since-exclusive/until-inclusive window,
    * timestamp-desc sort with id tiebreak, limit clamp. */
  def getWindow(spark: SparkSession, dir: String, ascending: Boolean = false): DataFrame = {
    val base = events(spark, dir)
      .filter(col("event_type") === "click" &&
        col("ts") > lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") <= lit("2024-01-20 00:00:00").cast("timestamp"))
    val sorted =
      if (ascending) base.orderBy(asc("ts"), asc("event_id"))
      else base.orderBy(desc("ts"), desc("event_id"))
    sorted.limit(Lrs.MaxHits)
      .select(col("event_id"), tsStr(col("ts")).as("ts_str"), col("user_id"), col("event_type"))
  }

  /** F1: by statement id. */
  def byId(spark: SparkSession, dir: String, id: Long = 4242L): DataFrame =
    events(spark, dir).filter(col("event_id") === id)
      .select(col("event_id"), tsStr(col("ts")).as("ts_str"), col("user_id"),
        col("event_type"), col("value"))

  /** F2: by agent. */
  def byAgent(spark: SparkSession, dir: String, uid: Long = 13L): DataFrame =
    events(spark, dir).filter(col("user_id") === uid)
      .orderBy(desc("ts"), desc("event_id")).limit(Lrs.MaxHits)
      .select(col("event_id"), tsStr(col("ts")).as("ts_str"), col("event_type"))

  /** F11+O3: keyset pagination. Page 1 = top-100; its last (ts, id) becomes
    * the cursor (driver-side request-scoped scalar, exactly like the
    * reference's `more` link); page 2 = the keyset predicate + limit. */
  def keysetPage2(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val page1 = ev.orderBy(desc("ts"), desc("event_id")).limit(Lrs.MaxHits)
      .select(col("ts"), col("event_id"))
      .collect()
    // ts may be TIMESTAMP or TIMESTAMP_NTZ depending on the parquet writer;
    // lit() handles both java.sql.Timestamp and java.time.LocalDateTime
    val cts = lit(page1.last.get(0))
    val cid = page1.last.getLong(1)
    ev.filter(col("ts") < cts || (col("ts") === cts && col("event_id") < cid))
      .orderBy(desc("ts"), desc("event_id")).limit(Lrs.MaxHits)
      .select(col("event_id"), tsStr(col("ts")).as("ts_str"))
  }

  /** S15/S16: JSON field extraction (GELF `short_message` pattern).
    * Filtering on a computed column substitutes its DEFINING expression
    * into the filter (no CSE across filter conjuncts), so every extra
    * conjunct is another full JSON parse per row: `k.isNotNull && k < 10`
    * parsed every row twice. `k < 10` alone is equivalent (NULL < 10 is
    * NULL → dropped) and halves the per-row parse cost; the projection's
    * own parse only runs for the surviving ~0.5%. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") < 10)

  /** F13: anonymous filter — drop events with an empty username
    * (/root/reference/src/ralph/filters.py:8-27). */
  def anonymous(df: DataFrame, username: org.apache.spark.sql.Column): DataFrame =
    df.filter(username.isNotNull && username =!= "")

  /** A4: exact distinct counts per verb. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))

  /** A4 approximate variant: HLL sketch for 10^12-scale cardinalities where
    * exactness is not required (SURVEY.md §2.8 — `approx_count_distinct`). */
  def approxDistinctUsers(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    events(spark, dir).groupBy("event_type")
      .agg(count(lit(1)).as("n"), approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))

  /** A1: tumbling per-verb counts (1 hour). Uses the native `window()`
    * expression — identical alignment to the streaming job's windows. */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(tsStr(col("window.start")).as("win_start"), col("event_type"), col("n"))

  /** A2: sliding per-verb counts (6 hours every 1 hour). */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "6 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(tsStr(col("window.start")).as("win_start"), col("event_type"), col("n"))

  /** CEP ordered-pattern match (north rule: "structured-streaming / CEP
    * engine") — the classic time-bounded funnel
    * `view →(≤H h) click →(≤H h) purchase` per user, as a windowed state
    * machine: `last_view` = latest view strictly before this row, a click
    * "qualifies" iff a view happened within the bound, `last_qclick` chains
    * the second transition, a purchase "converts" iff a qualified click
    * happened within the bound. Strictly-preceding frames make a row never
    * match itself, so the pattern is genuinely ordered (ties broken by
    * event_id, deterministic).
    *
    * Scale shape: both window passes and the final groupBy share ONE hash
    * partitioning on user_id — a single exchange + per-partition sort
    * carries the whole query (EventOpsSpec asserts exactly one Exchange).
    * This is the batch twin of [[graft.streaming.Funnel]], which runs the
    * same machine incrementally under a watermark. */
  def cepFunnel(spark: SparkSession, dir: String, boundHours: Int = 12): DataFrame = {
    val prev = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bound = expr(s"INTERVAL $boundHours HOURS")
    val staged = cepFunnelStaged(events(spark, dir), prev, bound)
    staged.groupBy("user_id")
      .agg(sum(when(col("qclick"), 1L).otherwise(0L)).as("n_qclicks"),
        sum(when(col("conv"), 1L).otherwise(0L)).as("n_conversions"),
        tsStr(min(when(col("conv"), col("ts")))).as("first_conv"))
      .filter(col("n_qclicks") > 0)
  }

  /** The funnel state columns on every event row for an ARBITRARY ordered
    * stage pattern (r6) — the exact batch twin of the generalized
    * [[graft.streaming.Funnel]] machine. Stage j's last qualified
    * timestamp is a strictly-previous-rows window max (`stage_ts_j`), so an
    * event can never qualify itself — the same pre-event-snapshot rule the
    * streaming machine applies, load-bearing when a type repeats in the
    * pattern. `qual_j` flags a qualified intermediate stage; `conv` flags
    * the final stage. */
  private[graft] def cepFunnelStagedPattern(ev: DataFrame,
      prev: org.apache.spark.sql.expressions.WindowSpec,
      bound: org.apache.spark.sql.Column,
      pattern: Seq[String]): DataFrame = {
    require(pattern.length >= 2, "a funnel needs at least two stages")
    var df = ev.withColumn("stage_ts_0",
      max(when(col("event_type") === pattern.head, col("ts"))).over(prev))
    for (j <- 1 until pattern.length - 1) {
      df = df
        .withColumn(s"qual_$j",
          col("event_type") === pattern(j) &&
            col(s"stage_ts_${j - 1}").isNotNull &&
            col("ts") <= col(s"stage_ts_${j - 1}") + bound)
        .withColumn(s"stage_ts_$j",
          max(when(col(s"qual_$j"), col("ts"))).over(prev))
    }
    val last = pattern.length - 1
    df.withColumn("conv",
      col("event_type") === pattern(last) &&
        col(s"stage_ts_${last - 1}").isNotNull &&
        col("ts") <= col(s"stage_ts_${last - 1}") + bound)
  }

  /** The default view→click→purchase staging — shared by [[cepFunnel]]
    * and the streaming-parity test (which compares per-event `conv` flags,
    * not just the aggregate). */
  private[graft] def cepFunnelStaged(ev: DataFrame,
      prev: org.apache.spark.sql.expressions.WindowSpec,
      bound: org.apache.spark.sql.Column): DataFrame =
    cepFunnelStagedPattern(ev, prev, bound, Seq("view", "click", "purchase"))
      .withColumnRenamed("qual_1", "qclick")

  private[graft] def cepStagedDefault(spark: SparkSession, dir: String): DataFrame =
    cepFunnelStaged(events(spark, dir),
      Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1),
      expr("INTERVAL 12 HOURS"))

  /** As-of (attribution) join — each click joined to the most recent view
    * by the same user at or before it: the point-in-time join every
    * event-to-profile or touch-attribution pipeline needs, and the batch
    * twin of the stream-stream interval join (J3).
    *
    * Implementation is the scalable union trick, NOT a range join: tag both
    * sides, sort (ts, kind) inside each user partition, and carry the last
    * non-null view id/ts forward with `last(_, ignoreNulls)` — one
    * exchange, one sort, zero join operators, no range-explosion. At equal
    * timestamps the view (kind 0) sorts before the click, giving the
    * inclusive `v.ts <= c.ts` semantics DuckDB's ASOF JOIN verifies.
    * A plain range join would build (click × all prior views) before
    * aggregating — quadratic per hot user; this stays O(n log n). */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id").as("eid"),
        col("event_id").as("view_id"), lit(null).cast("long").as("click_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
        col("event_id").as("eid"),
        lit(null).cast("long").as("view_id"), col("event_id").as("click_id"))
    // event_id is the FINAL order key: two views by one user at the same
    // timestamp would otherwise make last()'s pick nondeterministic (and
    // potentially diverge from the oracle's ASOF pick) — with it, the
    // max-event_id view deterministically wins a tie, and the oracle
    // collapses tied views to max(event_id) to match (r4 ADVICE)
    val w = Window.partitionBy("user_id").orderBy("ts", "kind", "eid")
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(clicks)
      .withColumn("attr_view", last(col("view_id"), ignoreNulls = true).over(w))
      .withColumn("attr_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      // micros-difference is timezone-shift invariant, so TIMESTAMP vs
      // TIMESTAMP_NTZ parquet readings agree (cf. keysetPage2 note)
      .select(col("click_id"), col("user_id"),
        col("attr_view").as("view_id"),
        round((unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("attr_ts").cast("timestamp"))).cast("double") / 1e6, 6)
          .as("lag_sec"))
  }

  /** `q_range_join`: point-in-interval range join via grid bucketing — the
    * join shape Spark has no native operator for. Written naively
    * (`a JOIN b ON a.ts BETWEEN b.lo AND b.hi`, no equi-key) Catalyst can
    * only plan a broadcast-nested-loop or cartesian product: every point
    * row visits every interval, O(|P|·|I|) at any scale. The grid trick
    * restores an equi-join: intervals explode to the fixed-width time
    * cells they cover (bounded fan-out — cell width ≥ max interval length
    * ⇒ ≤ 2 cells each), points map to their one containing cell, the join
    * runs on the cell key, and the exact predicate filters inside each
    * cell. A (point, interval) match meets in exactly one cell — the
    * point's — so no post-join dedup is needed. Work is O(|P| + |I| +
    * matches-per-cell), shuffles hash-partition on the cell key, and cell
    * width is the skew dial. The global PlanSpec no-CartesianProduct gate
    * proves the plan.
    *
    * The interval table is derived deterministically from the events
    * themselves (every 37th event opens a 30–210 min window — overlap
    * exists by construction), so the DuckDB oracle re-derives both sides
    * and joins with the plain theta predicate. µs integer arithmetic both
    * sides — bit-exact, timezone-shift invariant. */
  def rangeJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val bucketUs = 14400000000L // 4 h ≥ the 3.5 h max interval → ≤ 2 cells
    val ev = events(spark, dir).select(col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val iv = ev.filter(col("event_id") % 37 === 0)
      .select(col("event_id").as("interval_id"), col("ts_us").as("lo"),
        (col("ts_us") + (col("event_id") % 7 + 1) * lit(1800000000L)).as("hi"))
    val cells = iv.withColumn("cell",
      explode(sequence(expr(s"lo div $bucketUs"), expr(s"hi div $bucketUs"))))
    val pts = ev.withColumn("cell", expr(s"ts_us div $bucketUs"))
    pts.join(cells, Seq("cell"))
      .filter(col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .select(col("event_id"), col("interval_id"),
        (col("ts_us") - col("lo")).as("off_us"))
  }

  /** `q_scd2_islands`: gaps-and-islands — collapse each actor's
    * consecutive runs of equal `event_type` into validity intervals
    * (SCD-2 dimension rows: the state an entity was in, valid_from →
    * valid_to). The fundamental change-data shape a warehouse build runs;
    * distinct from [[sessionize]] (time-gap islands) — here the island
    * boundary is a VALUE change. Window is per-actor (bounded partitions,
    * the sessionize shape); µs integer timestamps keep the oracle compare
    * bit-exact. `seq` is the per-actor island ordinal — it keeps two
    * same-type islands of one actor distinct in the output contract. */
  def scd2Islands(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull ||
          lag("event_type", 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("seq",
        sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "seq", "event_type")
      .agg(min("us").as("valid_from_us"), max("us").as("valid_to_us"),
        count(lit(1)).as("n_events"))
  }

  /** A3 (batch twin): sessionization per actor with a gap timeout — the
    * exact semantics `session_window`/flatMapGroupsWithState apply
    * incrementally in the streaming job. Gap boundary = lag-diff > gap;
    * session id = running sum of boundaries. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 360): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = events(spark, dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    gapped.groupBy("user_id", "sid")
      .agg(min("ts").as("s"), max("ts").as("e"), count(lit(1)).as("n_events"))
      .select(col("user_id"), tsStr(col("s")).as("session_start"),
        tsStr(col("e")).as("session_end"), col("n_events"))
  }
  /** Hot-key skew audit over the event stream: per-key cardinalities, each
    * hot key's share of all rows, its skew factor (count ÷ mean per-key
    * count) and the salt fan-out a salted repartition would need to bring
    * it back to the mean — the number the streaming job's skew-salting
    * stage actually consumes. Top-N heaviest keys only.
    *
    * Scale: one map-side-combined groupBy; the (total, n_keys) roll-up is a
    * one-row broadcast, and Spark's ReuseExchange serves both aggregations
    * from the same shuffle. The top-N lands as TakeOrderedAndProject — no
    * global sort ever materializes. */
  def skewAudit(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val k = events(spark, dir).groupBy("user_id").agg(count(lit(1)).as("n"))
    val tot = k.agg(sum("n").cast("long").as("total"),
      count(lit(1)).as("n_keys"))
    val skew = (col("n").cast("double") * col("n_keys")) / col("total")
    k.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n"),
        round(col("n") / col("total").cast("double"), 6).as("share"),
        round(skew, 6).as("skew"),
        ceil(skew).cast("long").as("salt"))
      .orderBy(desc("n"), asc("user_id"))
      .limit(topN)
  }

  /** Cohort retention: users grouped by their first-activity week (Monday
    * truncation), distinct active users per (cohort, week offset) — the
    * classic product-analytics retention matrix. Shapes: the first-seen
    * frame is a user-keyed aggregate (map-side combining), the join back is
    * user-keyed (AQE broadcast at small scale, shuffle-colocated at 100 TB),
    * and the final distinct count partially aggregates on
    * (cohort, offset, user) before the distinct expansion — no row ever
    * carries more than (ts-week, user_id). Weeks are emitted as formatted
    * date strings (cross-engine timestamp representation drift). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val firstWk = ev.groupBy("user_id").agg(min("wk").as("cohort"))
    ev.join(firstWk, "user_id")
      .withColumn("week_off",
        (datediff(col("wk"), col("cohort")) / 7).cast("long"))
      .groupBy(col("cohort"), col("week_off"))
      .agg(countDistinct("user_id").as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("week_off"), col("n_users"))
  }

  /** `q_rate_quota`: per-actor daily admission quota — keep the first `n`
    * events of each (user, UTC day) in (ts, event_id) order, the batch
    * twin of the streaming [[graft.streaming.Quota]] machine (StreamingSpec
    * proves per-event parity under shuffled arrival).
    *
    * Ranking is the bounded two-phase [[graft.functions.TopKAgg]], not a
    * per-(user, day) `row_number` window: the window shape sorts a user's
    * ENTIRE day in one task to keep only n rows — bounded by a day, but a
    * bot actor at 100× produces a hot partition doing work proportional to
    * its daily volume (VERDICT r5 What's-wrong #2). The aggregator keeps
    * ≤n entries per (group × map task), so the shuffle carries ≤n rows per
    * task per user-day regardless of actor skew. "First n by ts asc" rides
    * the existing descending comparator as score = −epoch-µs: µs values
    * (≈1.7e15) are < 2^53, so the double negation is exact, and the
    * (sim desc, id asc) tie-break reproduces orderBy(ts, event_id) exactly.
    * The epoch-day is µs-integer division (`unix_micros div 86400e6`, the
    * cross-engine-exact arithmetic — epoch-seconds casts round on one
    * engine and truncate on the other). */
  def rateQuota(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val day = expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    val negUs = -expr("unix_micros(cast(ts as timestamp))").cast("double")
    events(spark, dir)
      .select(col("user_id"), day.as("day"), negUs.as("neg_us"), col("event_id"))
      .groupBy("user_id", "day")
      .agg(graft.functions.TopKAgg.topk(n, col("neg_us"), col("event_id")).as("firstn"))
      .select(col("user_id"), col("day"), posexplode(col("firstn")))
      .select(col("user_id"), col("day"), col("col.id").as("event_id"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** `q_quantile_sketch`: per-event-type value quantiles via the mergeable
    * KLL-shaped sketch ([[graft.functions.QuantileSketch]]). The oracle
    * config is EXACT — capacity 2^16 ≥ any group at the test scale factors,
    * so no compaction fires and the output matches DuckDB `quantile_disc`
    * bit-for-bit; the production dial is a small capacity whose rank-error
    * floor QuantileSpec pins. The plan is one partial-aggregating
    * ObjectHashAggregate: the shuffle carries one O(k log(n/k)) buffer per
    * (task, type), never the 100 TB of values. */
  def quantileSketchQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.QuantileSketch
    val qs = QuantileSketch.DefaultQs
    events(spark, dir)
      .filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(QuantileSketch.qsketch(1 << 16, qs, col("value")).as("ests"))
      .select(col("event_type"), posexplode(col("ests")))
      .select(col("event_type"),
        element_at(lit(qs.toArray), col("pos").cast("int") + 1).as("q"),
        round(col("col"), 6).as("est"))
  }
}
