package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Uuid5

/** edX → xAPI conversion, reproducing the reference's nine conversion sets
  * (/root/reference/src/ralph/models/edx/converters/xapi/{server,
  * navigational,enrollment,video}.py) and its canonical output
  * `model_dump_json(exclude_none=True, by_alias=True)`
  * (converter.py:226-258).
  *
  * Each ConversionItem becomes a Catalyst column expression; the whole
  * converter is a single projection (no UDFs except none — uuid5 is a native
  * expression) dispatched by one `when()` chain per family, so Catalyst
  * short-circuits untaken branches and the stage stays inside whole-stage
  * codegen. `exclude_none` maps to `to_json(..., ignoreNullFields=true)`.
  */
object Convert {

  val Viewed = "http://id.tincanapi.com/verb/viewed"
  val Terminated = "http://adlnet.gov/expapi/verbs/terminated"
  val Registered = "http://adlnet.gov/expapi/verbs/registered"
  val Unregistered = "http://id.tincanapi.com/verb/unregistered"
  val Initialized = "http://adlnet.gov/expapi/verbs/initialized"
  val Played = "https://w3id.org/xapi/video/verbs/played"
  val Paused = "https://w3id.org/xapi/video/verbs/paused"
  val Seeked = "https://w3id.org/xapi/video/verbs/seeked"

  val PageType = "http://activitystrea.ms/schema/1.0/page"
  val CourseType = "http://adlnet.gov/expapi/activities/course"
  val VideoType = "https://w3id.org/xapi/video/activity-type/video"
  val ProfileType = "http://adlnet.gov/expapi/activities/profile"
  val LmsCategory = "https://w3id.org/xapi/lms"
  val VideoCategory = "https://w3id.org/xapi/video"

  val ExtSessionId = "https://w3id.org/xapi/video/extensions/session-id"
  val ExtUserAgent = "https://w3id.org/xapi/video/extensions/user-agent"
  val ExtLength = "https://w3id.org/xapi/video/extensions/length"
  val ExtTime = "https://w3id.org/xapi/video/extensions/time"
  val ExtTimeFrom = "https://w3id.org/xapi/video/extensions/time-from"
  val ExtTimeTo = "https://w3id.org/xapi/video/extensions/time-to"
  val ExtProgress = "https://w3id.org/xapi/video/extensions/progress"

  import graft.model.Schemas

  val VideoFams: Seq[String] = Seq("load_video", "play_video", "pause_video",
    "stop_video", "seek_video")
  val EnrollFams: Seq[String] = Seq("edx.course.enrollment.activated",
    "edx.course.enrollment.deactivated")
  /** Models with a conversion set (converter.py registry — 9 sets). */
  val ConvertibleModels: Seq[String] = Seq("server", "page_close") ++ EnrollFams ++ VideoFams

  /** Cheap "has a conversion set" predicate. Use THIS to drop unconvertible
    * rows, never `xapi.isNotNull`: predicate pushdown substitutes the filter
    * column's defining expression into the condition, so filtering on the
    * xapi JSON re-evaluates the whole envelope-parse + to_json chain per row
    * (the same 10×-row-cost trap the single-expression verdict avoids). */
  def convertible(model: Column): Column = model.isin(ConvertibleModels: _*)

  private def jsonOpts = Map("ignoreNullFields" -> "true")

  /** Convert validated rows (Validate output with status=ok) to xAPI.
    * Adds `xapi` (canonical JSON string) and `actor_key` / `verb_id` /
    * `object_id` typed columns used downstream (dedup, sessionize, query).
    *
    * @param uuidNamespace converter UUID namespace (base.py:26-29)
    * @param platformUrl   platform URL (base.py:41-47)
    * @param storedIso     when set, emit ingest enrichment (D2 `stored`,
    *                      D3 `authority`) directly in the converted JSON —
    *                      one to_json instead of a convert-then-JsonMerge
    *                      re-parse per row. The converter's own output
    *                      (goldens) carries no stored/authority: pass None.
    * @param authorityJson authority agent JSON (with storedIso)
    */
  def apply(validated: DataFrame, uuidNamespace: String, platformUrl: String,
            storedIso: Option[String] = None,
            authorityJson: String = Enrich.DefaultAuthority): DataFrame = {
    // envelope fields come from the verdict struct (`env`) — the validate
    // expression's single Jackson parse; the separate `event` from_json
    // column stays out of this plan entirely
    val e = col("env")
    val ns = lit(uuidNamespace)
    val urlClean = platformUrl.reverse.dropWhile(_ == '/').reverse

    // base items (base.py:31-49)
    val id = Uuid5.uuid5Col(ns, col("raw"))
    // `str(user_id) if user_id else "anonymous"` — user_id is int|""|None in
    // the reference (edx/base.py), so 0/""/null are all falsy (base.py:43-47)
    val actorName = when(e("user_id").isNotNull &&
      !e("user_id").isin("", "0"),
      e("user_id")).otherwise(lit("anonymous"))
    val actor = struct(
      struct(lit(platformUrl).as("homePage"), actorName.as("name")).as("account"),
      lit("Agent").as("objectType"))
    val timestamp = e("time")

    // payload fields ride the verdict struct — extracted from the SAME
    // Jackson parse the payload validation walked (EdxModels.verdict), so
    // the former two from_json(event, …) re-parses per row are gone
    def video(f: String) = f match {
      case "id" => e("event_video_id")
      case "currentTime" => e("event_current_time")
      case "old_time" => e("event_old_time")
      case "new_time" => e("event_new_time")
    }
    val enrCourseId = e("event_pl_course_id")

    // object ids
    val serverObjId = concat(lit(urlClean), e("event_type"))
    val pageObjId = e("page")
    val courseObjId = concat(lit(urlClean), lit("/courses/"),
      regexp_replace(enrCourseId, "^/+|/+$", ""), lit("/info"))
    val videoObjId = concat(lit(urlClean), lit("/xblock/block-v1:"),
      e("course_id"), lit("-course-v1:+type@video+block@"), video("id"))

    // One SUPERSET statement struct + ONE to_json(ignoreNullFields) instead
    // of nine per-family struct literals behind a when() chain: per-field
    // when-chains select each family's content and null fields vanish in the
    // JSON, reproducing model_dump_json(exclude_none=True) byte-for-byte.
    // This keeps the projection's generated code small — the r1 nine-branch
    // dispatch (9 full-statement structs × 9 to_json) blew Janino's method
    // limit and dropped the hottest stage to interpreted eval (VERDICT r1).
    val m = col("model")
    val videoFams = Convert.VideoFams
    val enrollFams = Convert.EnrollFams
    val convertible = Convert.ConvertibleModels

    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")

    // context: enrollment = lms category; video = video category + per-family
    // extensions; server/page_close = absent
    val ctxCategory = when(m.isin(enrollFams: _*), lit(LmsCategory))
      .when(m.isin(videoFams: _*), lit(VideoCategory))
    val ctxExtensions = struct(
      when(m.isin("load_video", "pause_video", "stop_video"), lit(0.0))
        .otherwise(nullD).as(ExtLength),
      when(m.isin(videoFams: _*), e("session")).otherwise(nullS).as(ExtSessionId),
      when(m === "load_video", e("agent")).otherwise(nullS).as(ExtUserAgent))
    val context = when(m.isin((enrollFams ++ videoFams): _*), struct(
      struct(array(struct(
        struct(lit(ProfileType).as("type")).as("definition"),
        ctxCategory.as("id"))).as("category")).as("contextActivities"),
      when(m.isin(videoFams: _*), ctxExtensions).as("extensions")))

    // object: page (server/page_close) | course (enrollment) | video
    val objId = when(m === "server", serverObjId)
      .when(m === "page_close", pageObjId)
      .when(m.isin(enrollFams: _*), courseObjId)
      .otherwise(videoObjId)
    val objType = when(m.isin("server", "page_close"), lit(PageType))
      .when(m.isin(enrollFams: _*), lit(CourseType))
      .otherwise(lit(VideoType))
    val objName = when(m.isin(videoFams: _*), map(lit("en-US"), video("id")))
    val objectCol = struct(
      struct(objName.as("name"), objType.as("type")).as("definition"),
      objId.as("id"))

    // result: play/pause/stop → time (+progress for stop); seek → from/to
    val resultExt = struct(
      when(m.isin("play_video", "pause_video", "stop_video"),
        video("currentTime")).otherwise(nullD).as(ExtTime),
      when(m === "stop_video", lit(0.0)).otherwise(nullD).as(ExtProgress),
      when(m === "seek_video", video("old_time")).otherwise(nullD).as(ExtTimeFrom),
      when(m === "seek_video", video("new_time")).otherwise(nullD).as(ExtTimeTo))
    val result = when(m.isin("play_video", "pause_video", "stop_video", "seek_video"),
      struct(resultExt.as("extensions")))

    val verbId = when(m === "server", Viewed)
      .when(m === "page_close", Terminated)
      .when(m === "edx.course.enrollment.activated", Registered)
      .when(m === "edx.course.enrollment.deactivated", Unregistered)
      .when(m === "load_video", Initialized)
      .when(m === "play_video", Played)
      .when(m === "pause_video", Paused)
      .when(m === "stop_video", Terminated)
      .when(m === "seek_video", Seeked)

    val enrichFields = storedIso.toSeq.flatMap { iso =>
      Seq(lit(iso).as("stored"),
        from_json(lit(authorityJson), Schemas.actorType).as("authority"))
    }
    val xapi = when(m.isin(convertible: _*), to_json(struct(Seq(
      id.as("id"), actor.as("actor"), timestamp.as("timestamp"),
      lit("1.0.0").as("version"), context.as("context"),
      objectCol.as("object"), result.as("result"),
      struct(verbId.as("id")).as("verb")) ++ enrichFields: _*), jsonOpts))

    validated
      .withColumn("id", id)
      .withColumn("actor_key", actor.getField("account").getField("name"))
      .withColumn("verb_id", verbId)
      .withColumn("object_id", objId)
      .withColumn("xapi", xapi)
  }
}
