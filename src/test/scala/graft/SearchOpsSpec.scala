package graft

import org.apache.spark.sql.functions._

import graft.operators.SearchOps

/** r6 retrieval/privacy family: BM25 plan shape, the winnowing guarantee
  * (shared runs always share a fingerprint; selection density bounded),
  * k-anonymity audit recomputation. */
class SearchOpsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("winnowing guarantee: a shared run of >= w+k-1 words shares a fingerprint") {
    // doc 1 and doc 2 share an 8-word run (>= w+k-1 = 6) embedded in
    // otherwise-disjoint text at DIFFERENT positions; doc 3 is disjoint
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"uno dos $run tres cuatro cinco seis siete ocho"),
      (3L, "completely different words everywhere nothing shared at all here"))
      .toDF("doc_id", "text")
    val fps = SearchOps.winnowFingerprintsDf(docs)
      .select("doc_id", "fp").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared run must yield at least one common fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty &&
      (fps(2L) intersect fps(3L)).isEmpty,
      "disjoint texts should share nothing (32-bit collision would be a fixture fluke)")
  }

  test("winnowing density: every full window covered, selections bounded") {
    val k = 3
    val w = 4
    val perDoc = SearchOps.winnowFingerprints(spark, dir, k, w)
      .groupBy("doc_id").agg(count(lit(1)).as("n_sel"))
    val grams = graft.operators.TextOps.documents(spark, dir)
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - (k - 1)).as("n_grams"))
    val joined = perDoc.join(grams, "doc_id")
      .select(col("doc_id"), col("n_sel"), (col("n_grams") - (w - 1)).as("n_windows"))
      .as[(Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (d, nSel, nWindows) =>
      // one selection covers at most w windows; selections never exceed
      // window count (each window contributes at most one NEW fingerprint)
      assert(nSel <= nWindows, s"doc $d overselected")
      assert(nSel >= (nWindows + w - 1) / w, s"doc $d underselected")
    }
  }

  test("bm25: plan is explode + partial agg + broadcast stats + bounded top-k tail") {
    val df = SearchOps.bm25TopK(spark, dir)
    val rows = df.collect()
    assert(rows.length === 20)
    // scores descending with doc_id tiebreak
    val scores = rows.map(r => (r.getDouble(1), r.getLong(0)))
    assert(scores.sliding(2).forall {
      case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"bm25 plans a window:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 lacks the bounded top-k tail:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"stats side not broadcast:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.toLowerCase.contains("partial")),
      s"doc aggregate lacks a partial stage:\n$plan")
  }

  test("k-anonymity audit equals a recomputed group-by (and k actually bites)") {
    val audit = SearchOps.kAnonAudit(spark, dir, k = 4)
      .as[(String, String, Long, Long)].collect().toSet
    val all = graft.operators.TextOps.documents(spark, dir)
      .groupBy(col("source"), col("lang"), expr("n_chars div 200").as("b"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long, Long)].collect()
    assert(audit === all.filter(_._4 < 4).toSet)
    assert(audit.nonEmpty && audit.size < all.length,
      "fixture must have both risky and safe groups")
  }
}
