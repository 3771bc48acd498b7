package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Convert, Enrich, Store, Validate}
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
object Pipeline {

  val StoredIso = "2024-06-01T00:00:00.000000+00:00"

  /** Rows whose model has no conversion set (e.g. the seq_* navigational
    * family: validated but not convertible) are dropped like the reference's
    * MissingConversionSetException + ignore_errors path
    * (converter.py:212-224). */
  def validateConvert(input: DataFrame,
                      ns: String = Synth.UuidNamespace,
                      url: String = Synth.PlatformUrl): DataFrame =
    Convert(Validate.observed(Validate(input)).filter(col("status") === Validate.StatusOk),
      ns, url).filter(col("xapi").isNotNull)

  /** Full batch run: returns the deduped lake frame ([[Store]] layout). */
  def run(input: DataFrame,
          ns: String = Synth.UuidNamespace,
          url: String = Synth.PlatformUrl,
          storedIso: String = StoredIso): DataFrame = {
    val converted = validateConvert(input, ns, url)
    val enriched = Enrich(converted, "xapi", storedIso, uuidNamespace = ns)
    val deduped = enriched.dropDuplicates("stmt_id")
    Store.project(deduped, "xapi")
  }
}
