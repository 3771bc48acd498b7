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

  private def jsonOpts = Map("ignoreNullFields" -> "true")

  /** Convert validated rows (Validate output with status=ok) to xAPI.
    * Adds `xapi` (canonical JSON string) and `actor_key` / `verb_id` /
    * `object_id` typed columns used downstream (dedup, sessionize, query).
    *
    * @param uuidNamespace converter UUID namespace (base.py:26-29)
    * @param platformUrl   platform URL (base.py:41-47)
    */
  def apply(validated: DataFrame, uuidNamespace: String, platformUrl: String): DataFrame = {
    val e = col("event")
    val ns = lit(uuidNamespace)
    val urlClean = platformUrl.reverse.dropWhile(_ == '/').reverse

    // base items (base.py:31-49)
    val id = Uuid5.uuid5Col(ns, col("raw"))
    // `str(user_id) if user_id else "anonymous"` — user_id is int|""|None in
    // the reference (edx/base.py), so 0/""/null are all falsy (base.py:43-47)
    val actorName = when(e("context").getField("user_id").isNotNull &&
      !e("context").getField("user_id").isin("", "0"),
      e("context").getField("user_id").cast("string")).otherwise(lit("anonymous"))
    val actor = struct(
      struct(lit(platformUrl).as("homePage"), actorName.as("name")).as("account"),
      lit("Agent").as("objectType"))
    val timestamp = e("time")

    val video = from_json(e("event"), Schemas.videoPayload)
    val enr = from_json(e("event"), Schemas.enrollmentPayload)

    def verb(vid: String) = struct(lit(vid).as("id"))
    def defn(t: String) = struct(lit(t).as("type"))
    def category(catId: String) = struct(array(
      struct(struct(lit(ProfileType).as("type")).as("definition"), lit(catId).as("id"))
    ).as("category"))

    // object ids
    val serverObjId = concat(lit(urlClean), e("event_type"))
    val pageObjId = e("page")
    val courseObjId = concat(lit(urlClean), lit("/courses/"),
      regexp_replace(enr("course_id"), "^/+|/+$", ""), lit("/info"))
    val videoObjId = concat(lit(urlClean), lit("/xblock/block-v1:"),
      e("context").getField("course_id"), lit("-course-v1:+type@video+block@"), video("id"))

    def videoObject = struct(
      struct(
        map(lit("en-US"), video("id")).as("name"),
        lit(VideoType).as("type")).as("definition"),
      videoObjId.as("id"))

    // Per-family full statements as typed structs; to_json(ignoreNullFields)
    // reproduces model_dump_json(exclude_none=True). Field names carry the
    // extension IRIs directly (struct field names may contain any chars).
    def stmt(fields: Column*): Column = to_json(struct(fields: _*), jsonOpts)

    val base = Seq(id.as("id"), actor.as("actor"), timestamp.as("timestamp"),
      lit("1.0.0").as("version"))

    val serverJson = stmt(base ++ Seq(
      struct(defn(PageType).as("definition"), serverObjId.as("id")).as("object"),
      verb(Viewed).as("verb")): _*)

    val pageCloseJson = stmt(base ++ Seq(
      struct(defn(PageType).as("definition"), pageObjId.as("id")).as("object"),
      verb(Terminated).as("verb")): _*)

    def enrollJson(verbId: String) = stmt(base ++ Seq(
      struct(category(LmsCategory).as("contextActivities")).as("context"),
      struct(defn(CourseType).as("definition"), courseObjId.as("id")).as("object"),
      verb(verbId).as("verb")): _*)

    def vctx(extensions: Column) = struct(
      category(VideoCategory).as("contextActivities"),
      extensions.as("extensions"))

    val loadJson = stmt(base ++ Seq(
      vctx(struct(
        lit(0.0).as(ExtLength),
        e("session").as(ExtSessionId),
        e("agent").as(ExtUserAgent))).as("context"),
      videoObject.as("object"),
      verb(Initialized).as("verb")): _*)

    val playJson = stmt(base ++ Seq(
      vctx(struct(e("session").as(ExtSessionId))).as("context"),
      videoObject.as("object"),
      struct(struct(video("currentTime").as(ExtTime)).as("extensions")).as("result"),
      verb(Played).as("verb")): _*)

    val pauseJson = stmt(base ++ Seq(
      vctx(struct(
        lit(0.0).as(ExtLength),
        e("session").as(ExtSessionId))).as("context"),
      videoObject.as("object"),
      struct(struct(video("currentTime").as(ExtTime)).as("extensions")).as("result"),
      verb(Paused).as("verb")): _*)

    val stopJson = stmt(base ++ Seq(
      vctx(struct(
        lit(0.0).as(ExtLength),
        e("session").as(ExtSessionId))).as("context"),
      videoObject.as("object"),
      struct(struct(
        video("currentTime").as(ExtTime),
        lit(0.0).as(ExtProgress)).as("extensions")).as("result"),
      verb(Terminated).as("verb")): _*)

    val seekJson = stmt(base ++ Seq(
      vctx(struct(e("session").as(ExtSessionId))).as("context"),
      videoObject.as("object"),
      struct(struct(
        video("old_time").as(ExtTimeFrom),
        video("new_time").as(ExtTimeTo)).as("extensions")).as("result"),
      verb(Seeked).as("verb")): _*)

    val xapi = when(col("model") === "server", serverJson)
      .when(col("model") === "page_close", pageCloseJson)
      .when(col("model") === "edx.course.enrollment.activated", enrollJson(Registered))
      .when(col("model") === "edx.course.enrollment.deactivated", enrollJson(Unregistered))
      .when(col("model") === "load_video", loadJson)
      .when(col("model") === "play_video", playJson)
      .when(col("model") === "pause_video", pauseJson)
      .when(col("model") === "stop_video", stopJson)
      .when(col("model") === "seek_video", seekJson)
      .otherwise(lit(null))

    val verbId = when(col("model") === "server", Viewed)
      .when(col("model") === "page_close", Terminated)
      .when(col("model") === "edx.course.enrollment.activated", Registered)
      .when(col("model") === "edx.course.enrollment.deactivated", Unregistered)
      .when(col("model") === "load_video", Initialized)
      .when(col("model") === "play_video", Played)
      .when(col("model") === "pause_video", Paused)
      .when(col("model") === "stop_video", Terminated)
      .when(col("model") === "seek_video", Seeked)

    val objectId = when(col("model") === "server", serverObjId)
      .when(col("model") === "page_close", pageObjId)
      .when(col("model").startsWith("edx.course.enrollment"), courseObjId)
      .otherwise(videoObjId)

    validated
      .withColumn("id", id)
      .withColumn("actor_key", actor.getField("account").getField("name"))
      .withColumn("verb_id", verbId)
      .withColumn("object_id", objectId)
      .withColumn("xapi", xapi)
  }
}
