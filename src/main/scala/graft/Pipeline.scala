package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Convert, Store, Validate}
import graft.sources.Synth

/** The end-to-end batch pipeline: pre-tokenized input → validate → convert →
  * enrich → dedup → lake layout. This is the batch twin of the streaming job
  * (graft.streaming.StreamPipeline); both share every stage expression, so
  * the streaming path is the same Catalyst plan incrementalised.
  *
  * Stage boundaries mirror the reference CLI pipeline
  * `read | validate | convert | write` (/root/reference/src/ralph/cli.py) —
  * UNIX pipes become narrow projections; the only shuffle in the whole plan
  * is the final dedup exchange on `stmt_id`.
  */
/** Sequential ground-truth derivation of the 2000-row pipeline digest,
  * computed directly from the generator's index classification (no Spark,
  * no shared stage expressions) — the differential oracle for
  * `q_pipeline_store`: the distributed validate→convert→dedup plan must
  * reproduce exactly what this single-threaded walk over the generator
  * rules says. */
object PipelineGolden {

  val N = 2000L

  private val verbOf = Map(
    "server" -> operators.Convert.Viewed,
    "page_close" -> operators.Convert.Terminated,
    "edx.course.enrollment.activated" -> operators.Convert.Registered,
    "edx.course.enrollment.deactivated" -> operators.Convert.Unregistered,
    "load_video" -> operators.Convert.Initialized,
    "play_video" -> operators.Convert.Played,
    "pause_video" -> operators.Convert.Paused,
    "stop_video" -> operators.Convert.Terminated,
    "seek_video" -> operators.Convert.Seeked)

  /** (verb_id, source, n, n_ids): distinct statement ids per (verb, source)
    * among convertible rows — dedup keeps one row per uuid5(ns, raw), so
    * n == n_ids by construction on both sides. */
  lazy val rows: Seq[(String, String, Long, Long)] = {
    val ids = scala.collection.mutable.Map.empty[(String, String),
      scala.collection.mutable.Set[String]]
    (0L until N).foreach { i =>
      if (Synth.isConvertible(i)) {
        val key = (verbOf(Synth.familyOf(i)), Synth.sourceOf(i))
        val id = graft.functions.Uuid5.uuid5(Synth.UuidNamespace, Synth.edxJson(i))
        ids.getOrElseUpdate(key, scala.collection.mutable.Set.empty) += id
      }
    }
    ids.toSeq.map { case ((v, s), set) =>
      (v, s, set.size.toLong, set.size.toLong)
    }.sortBy(r => (r._1, r._2))
  }
}

object Pipeline {

  val StoredIso = "2024-06-01T00:00:00.000000+00:00"

  /** Rows whose model has no conversion set (e.g. the seq_* navigational
    * family: validated but not convertible) are dropped like the reference's
    * MissingConversionSetException + ignore_errors path
    * (converter.py:212-224). */
  def validateConvert(input: DataFrame,
                      ns: String = Synth.UuidNamespace,
                      url: String = Synth.PlatformUrl,
                      storedIso: Option[String] = None): DataFrame =
    Convert(Validate.observed(Validate(input)).filter(col("status") === Validate.StatusOk),
      ns, url, storedIso).filter(Convert.convertible(col("model")))

  /** Full batch run: returns the deduped lake frame ([[Store]] layout).
    * Ingest enrichment (D2/D3) is emitted inside the convert projection —
    * converted statements always carry id/timestamp already (D1 = the
    * converter's own uuid5), so the POST-path JsonMerge re-parse
    * ([[operators.Enrich]]) would be pure per-row overhead here. */
  def run(input: DataFrame,
          ns: String = Synth.UuidNamespace,
          url: String = Synth.PlatformUrl,
          storedIso: String = StoredIso): DataFrame = {
    val converted = validateConvert(input, ns, url, Some(storedIso))
    // prune BEFORE the dedup exchange: only the store projection's inputs
    // cross the wire (~4× less shuffle than dragging raw/tokens/event along)
    val deduped = converted.select(col("id").as("stmt_id"), col("xapi"), col("source"))
      .dropDuplicates("stmt_id")
    Store.project(deduped, "xapi")
  }
}
