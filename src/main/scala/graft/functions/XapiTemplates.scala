package graft.functions

import java.util.regex.Pattern

import com.fasterxml.jackson.databind.JsonNode

/** Per-template xAPI payload rules — the xAPI twin of the [[EdxModels]]
  * registry: each selected template's required `context`/`result` shape,
  * transcribed from the reference's pydantic models
  * (/root/reference/src/ralph/models/xapi/video/{statements,results,
  * contexts}.py, virtual_classroom/{statements,results,contexts}.py,
  * lms/{statements,contexts}.py, navigation/statements.py).
  *
  * Pydantic-v2 semantics preserved:
  *  - a field annotated `Optional[X]` WITHOUT a default is a REQUIRED KEY
  *    whose value may be null (e.g. every video extension model's
  *    session-id, the virtual-classroom planned-duration);
  *  - extension models are `extra="allow"`, so only DECLARED fields are
  *    type-checked and unknown extension IRIs pass through;
  *  - extension models are `coerce_numbers_to_str=True`, so a numeric value
  *    satisfies a declared string field;
  *  - lax-mode float/int fields accept string-encoded numerics ("3.5" for
  *    a NonNegativeFloat, "3" for an int) — see [[numOf]];
  *  - `volume` is an int field: lax-mode pydantic accepts 3 or 3.0 but
  *    rejects a number with a fractional part — this single rule is what
  *    rejects 989 of the reference corpus' 3546 `interacted` statements
  *    (verified by running the reference models over the corpus);
  *  - profile category validators require the statement's
  *    `context.contextActivities.category` to contain the profile activity
  *    id (video/virtual-classroom/lms) — what rejects the corpus' 54
  *    LMSDownloadedVideo statements, whose category is the VIDEO profile.
  *
  * Calibration: [[graft.XapiValidateSpec]] pins the corpus split this
  * registry must reproduce — 20,955 ok / 1,045 invalid over the 22k
  * reference corpus, the exact numbers the reference's own models produce.
  */
object XapiTemplates {

  // ---- Jackson helpers (shared shape with XapiModels) ----------------------
  private def g(n: JsonNode, f: String): JsonNode = {
    if (n == null) return null
    val v = n.get(f)
    if (v == null || v.isNull) null else v
  }
  /** Key PRESENT (value may be JSON null) — pydantic required-nullable. */
  private def has(n: JsonNode, f: String): Boolean = n != null && n.has(f)
  private def text(n: JsonNode, f: String): String = {
    val v = g(n, f)
    if (v != null && v.isTextual) v.asText else null
  }

  // ---- field type checks (null value handled by the requirement level) ----
  /** Lax-mode pydantic numerics also accept STRING-encoded numbers ("3.5"
    * for a float field, "3" — and "3.0", via the int-from-float rule — for
    * an int field). The decimal-literal regex gate keeps Java's permissive
    * `parseDouble` from accepting forms pydantic rejects ("3f", hex
    * floats, "Infinity"). */
  private val DecimalRe =
    Pattern.compile("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$")
  private def numOf(v: JsonNode): Option[Double] =
    if (v == null) None
    else if (v.isNumber) Some(v.asDouble)
    else if (v.isTextual) {
      val s = v.asText.trim
      if (DecimalRe.matcher(s).matches()) Some(java.lang.Double.parseDouble(s))
      else None
    } else None
  private def nonNegNum(v: JsonNode): Boolean = numOf(v).exists(_ >= 0)
  /** Int-field variant of [[numOf]]: pydantic v2 lax int REJECTS
    * exponent-notation strings ("1e2" is not an int literal even though its
    * value is integral) AND trailing-dot strings ("3." raises in
    * TypeAdapter(int).validate_python — r5 ADVICE), so the string path
    * requires a plain integer-or-float literal with at least one digit on
    * each side of any dot; the integral-value test below still applies
    * (what admits "3.0" via the int-from-float rule and rejects "3.5"). */
  private val IntLaxRe = Pattern.compile("^[+-]?\\d+(\\.\\d+)?$")
  private def numOfInt(v: JsonNode): Option[Double] =
    if (v == null) None
    else if (v.isNumber) Some(v.asDouble)
    else if (v.isTextual) {
      val s = v.asText.trim
      if (IntLaxRe.matcher(s).matches()) Some(java.lang.Double.parseDouble(s))
      else None
    } else None
  private def posInt(v: JsonNode): Boolean =
    numOfInt(v).exists(d => d == Math.floor(d) && !d.isInfinite && d > 0)
  /** Lax-mode pydantic `int`: integral value, fractional part rejected. */
  private def intNum(v: JsonNode): Boolean =
    numOfInt(v).exists(d => d == Math.floor(d) && !d.isInfinite)
  /** Lax-mode pydantic `bool`. */
  private def boolish(v: JsonNode): Boolean =
    v != null && (v.isBoolean ||
      (v.isNumber && (v.asDouble == 0 || v.asDouble == 1)) ||
      (v.isTextual && Set("true", "false", "0", "1", "yes", "no", "on", "off")
        .contains(v.asText.toLowerCase)))
  /** Extension-model string: `coerce_numbers_to_str` accepts numbers too. */
  private def strish(v: JsonNode): Boolean =
    v != null && (v.isTextual || v.isNumber)
  private val UuidRe = Pattern.compile(
    "^(urn:uuid:)?[0-9a-fA-F]{8}-?[0-9a-fA-F]{4}-?[0-9a-fA-F]{4}-?" +
      "[0-9a-fA-F]{4}-?[0-9a-fA-F]{12}$")
  private def uuidish(v: JsonNode): Boolean =
    v != null && v.isTextual && UuidRe.matcher(v.asText).matches()
  private def datetimeish(v: JsonNode): Boolean =
    v != null && (v.isNumber ||
      (v.isTextual && EdxModels.parseTsMicros(v.asText) != EdxModels.NoTs))
  /** pydantic timedelta: seconds number or ISO-8601 duration string. */
  private def durationish(v: JsonNode): Boolean =
    v != null && (v.isNumber || (v.isTextual && v.asText.matches("^-?P.+")))

  /** Requirement levels mirroring pydantic field declarations. */
  private def req(ext: JsonNode, key: String, ok: JsonNode => Boolean): Boolean =
    ok(g(ext, key)) // required, non-null
  private def reqKey(ext: JsonNode, key: String, ok: JsonNode => Boolean): Boolean =
    has(ext, key) && (g(ext, key) == null || ok(g(ext, key))) // Optional[X], no default
  private def opt(ext: JsonNode, key: String, ok: JsonNode => Boolean): Boolean =
    g(ext, key) == null || ok(g(ext, key)) // Optional[X] = None

  /** `context.contextActivities.category` contains the profile activity. */
  private def categoryHas(ctx: JsonNode, profile: String): Boolean = {
    val cat = g(g(ctx, "contextActivities"), "category")
    if (cat == null) false
    else if (cat.isArray) {
      var i = 0
      while (i < cat.size()) {
        if (text(cat.get(i), "id") == profile) return true
        i += 1
      }
      false
    } else text(cat, "id") == profile
  }

  // ---- video profile (video/contexts.py, video/results.py) ----------------
  private def vx(n: String) = s"https://w3id.org/xapi/video/extensions/$n"
  private val VSession = vx("session-id")
  private val VLength = vx("length")
  private val VTime = vx("time")
  private val VTimeFrom = vx("time-from")
  private val VTimeTo = vx("time-to")
  private val VProgress = vx("progress")
  private val VCcEnabled = vx("cc-enabled")
  private val VCcLang = vx("cc-subtitle-lang")
  private val VFullScreen = vx("full-screen")
  private val VScreenSize = vx("screen-size")
  private val VPlaybackSize = vx("video-playback-size")
  private val VVolume = vx("volume")
  private val VThreshold = vx("completion-threshold")
  private val VSegments = vx("played-segments")
  private val VideoProfile = "https://w3id.org/xapi/video"

  /** Shared preconditions: video category + (if the extensions object
    * exists) the required-key session-id (VideoContextExtensions). */
  private def videoCtx(ctx: JsonNode, extRequired: Boolean)(
      more: JsonNode => Boolean): Boolean = {
    if (ctx == null || !categoryHas(ctx, VideoProfile)) return false
    val ext = g(ctx, "extensions")
    if (ext == null) !extRequired
    else reqKey(ext, VSession, uuidish) && more(ext)
  }

  /** `segmentsDeclared`: every video result-extensions model except
    * VideoSeekedResultExtensions declares the optional playedSegments
    * field — where undeclared, extra=allow means ANY value passes. */
  private def videoResult(res: JsonNode, segmentsDeclared: Boolean = true)(
      more: JsonNode => Boolean): Boolean = {
    if (res == null) return false
    val ext = g(res, "extensions")
    ext != null && (!segmentsDeclared || opt(ext, VSegments, strish)) && more(ext)
  }

  // ---- virtual-classroom profile (virtual_classroom/contexts.py) ----------
  private val VcProfile = "https://w3id.org/xapi/virtual-classroom"
  private val VcActivityType =
    "https://w3id.org/xapi/virtual-classroom/activity-types/virtual-classroom"
  private val VcSession = "https://w3id.org/xapi/cmi5/context/extensions/sessionid"
  private val VcPlannedDuration = "http://id.tincanapi.com/extension/planned-duration"

  /** VirtualClassroomContext: category + required registration UUID +
    * required extensions object (session-id optional STRING, default ""). */
  private def vcCtx(ctx: JsonNode)(more: JsonNode => Boolean): Boolean = {
    if (ctx == null || !categoryHas(ctx, VcProfile)) return false
    if (!uuidish(g(ctx, "registration"))) return false
    val ext = g(ctx, "extensions")
    ext != null && opt(ext, VcSession, strish) && more(ext)
  }

  /** contextActivities.parent present; every entry a VC activity. */
  private def vcParent(ctx: JsonNode): Boolean = {
    val par = g(g(ctx, "contextActivities"), "parent")
    def vcTyped(a: JsonNode) = text(g(a, "definition"), "type") == VcActivityType
    if (par == null) false
    else if (par.isArray) { // an empty list is legal: List[...] has no min length
      var i = 0
      while (i < par.size()) {
        if (!vcTyped(par.get(i))) return false
        i += 1
      }
      true
    } else vcTyped(par)
  }

  // ---- lms profile (lms/contexts.py) --------------------------------------
  private val LmsProfile = "https://w3id.org/xapi/lms"
  private val LmsStart = "https://w3id.org/xapi/lms/extensions/starting-date"
  private val LmsEnd = "https://w3id.org/xapi/lms/extensions/ending-date"
  private val LmsRole = "https://w3id.org/xapi/lms/extensions/role"
  private val LmsQuality = "https://w3id.org/xapi/video/extensions/quality"

  private def lmsCtx(ctx: JsonNode)(more: JsonNode => Boolean): Boolean = {
    if (ctx == null || !categoryHas(ctx, LmsProfile)) return false
    val ext = g(ctx, "extensions")
    ext == null || more(ext) // every LMS extensions object is Optional = None
  }
  private def lmsCommonExt(ext: JsonNode): Boolean =
    opt(ext, VcSession, uuidish) // LMSCommonContextExtensions.session_id

  /** The per-template rule. `model` is the label from
    * [[graft.operators.XapiValidate.Templates]]; unknown labels pass (the
    * selector already scoped the namespace). */
  def ok(model: String, root: JsonNode): Boolean = {
    val ctx = g(root, "context")
    val res = g(root, "result")
    model match {
      // ---- navigation: no payload constraints beyond the base statement
      case "navigation.PageViewed" | "navigation.PageTerminated" => true

      // ---- video ----------------------------------------------------------
      case "video.VideoInitialized" =>
        videoCtx(ctx, extRequired = true) { ext =>
          req(ext, VLength, nonNegNum) &&
          opt(ext, VCcEnabled, boolish) && opt(ext, VCcLang, strish) &&
          opt(ext, VFullScreen, boolish) && opt(ext, VScreenSize, strish) &&
          opt(ext, VPlaybackSize, strish) && opt(ext, vx("speed"), strish) &&
          opt(ext, vx("user-agent"), strish) && opt(ext, VVolume, intNum) &&
          opt(ext, VThreshold, nonNegNum)
        }
      case "video.VideoPlayed" =>
        videoCtx(ctx, extRequired = false)(_ => true) &&
          videoResult(res)(ext => req(ext, VTime, nonNegNum))
      case "video.VideoPaused" =>
        videoCtx(ctx, extRequired = true)(ext =>
          req(ext, VLength, nonNegNum) && opt(ext, VThreshold, nonNegNum)) &&
          videoResult(res)(ext =>
            req(ext, VTime, nonNegNum) && opt(ext, VProgress, nonNegNum))
      case "video.VideoSeeked" =>
        videoCtx(ctx, extRequired = false)(_ => true) &&
          videoResult(res, segmentsDeclared = false)(ext =>
            req(ext, VTimeFrom, nonNegNum) && req(ext, VTimeTo, nonNegNum))
      case "video.VideoCompleted" =>
        videoCtx(ctx, extRequired = true)(ext =>
          req(ext, VLength, nonNegNum) && opt(ext, VThreshold, nonNegNum)) &&
          videoResult(res)(ext =>
            req(ext, VTime, nonNegNum) && req(ext, VProgress, nonNegNum)) &&
          (g(res, "completion") == null || (g(res, "completion").isBoolean &&
            g(res, "completion").asBoolean)) && // Literal[True]
          opt(res, "duration", durationish)
      case "video.VideoTerminated" =>
        videoCtx(ctx, extRequired = true)(ext =>
          req(ext, VLength, nonNegNum) && opt(ext, VThreshold, nonNegNum)) &&
          videoResult(res)(ext =>
            req(ext, VTime, nonNegNum) && req(ext, VProgress, nonNegNum))
      case "video.VideoInteracted" =>
        // first-parse-wins over the three `interacted` models sharing the
        // selector (video/statements.py:171-231)
        def ecc = videoCtx(ctx, extRequired = true)(ext =>
          req(ext, VCcLang, strish)) &&
          videoResult(res)(ext =>
            req(ext, VTime, nonNegNum) && req(ext, VCcEnabled, boolish))
        def volume = videoCtx(ctx, extRequired = true)(ext =>
          req(ext, VVolume, intNum)) &&
          videoResult(res)(ext => req(ext, VTime, nonNegNum))
        def screen = videoCtx(ctx, extRequired = true)(ext =>
          req(ext, VFullScreen, boolish) && req(ext, VScreenSize, strish) &&
            req(ext, VPlaybackSize, strish)) &&
          videoResult(res)(ext => req(ext, VTime, nonNegNum))
        ecc || volume || screen

      // ---- virtual classroom ---------------------------------------------
      case "virtual_classroom.VirtualClassroomInitialized" |
           "virtual_classroom.VirtualClassroomJoined" |
           "virtual_classroom.VirtualClassroomTerminated" =>
        vcCtx(ctx)(ext => reqKey(ext, VcPlannedDuration, datetimeish))
      case "virtual_classroom.VirtualClassroomStartedPoll" =>
        vcCtx(ctx)(_ => true) && vcParent(ctx)
      case "virtual_classroom.VirtualClassroomAnsweredPoll" =>
        vcCtx(ctx)(_ => true) && vcParent(ctx) && res != null && {
          val r = g(res, "response") // NonEmptyStrictStr
          r != null && r.isTextual && r.asText.nonEmpty
        }
      case "virtual_classroom.VirtualClassroomPostedPublicMessage" =>
        vcCtx(ctx)(_ => true) && vcParent(ctx)
      case m if m.startsWith("virtual_classroom.") =>
        vcCtx(ctx)(_ => true) // Left/Muted/…/LoweredHand: base VC context

      // ---- lms ------------------------------------------------------------
      case "lms.LMSRegisteredCourse" | "lms.LMSUnregisteredCourse" =>
        lmsCtx(ctx)(ext =>
          reqKey(ext, LmsStart, datetimeish) && reqKey(ext, LmsEnd, datetimeish) &&
            reqKey(ext, LmsRole, strish))
      case "lms.LMSDownloadedVideo" =>
        lmsCtx(ctx)(ext => lmsCommonExt(ext) &&
          opt(ext, VLength, nonNegNum) && opt(ext, LmsQuality, posInt))
      case "lms.LMSDownloadedAudio" =>
        lmsCtx(ctx)(ext => lmsCommonExt(ext) && opt(ext, VLength, nonNegNum))
      case "lms.LMSAccessedPage" | "lms.LMSAccessedFile" =>
        lmsCtx(ctx)(_ => true)
      case m if m.startsWith("lms.") => // uploaded/downloaded file+doc+etc.
        lmsCtx(ctx)(lmsCommonExt)

      case _ => true
    }
  }
}
