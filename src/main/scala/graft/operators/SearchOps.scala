package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-flavoured corpus operators (r6): BM25 scoring for
  * query-driven curation (dedup-against-eval-sets, topical slicing, "find
  * the docs this benchmark question leaks into") and MOSS-style winnowing
  * fingerprints (Schleimer/Wilkerson/Aiken 2003) for partial-overlap
  * detection — the local-fingerprint family that set-based MinHash/SimHash
  * cannot provide (they score whole-document similarity; winnowing marks
  * WHERE the shared runs are).
  */
object SearchOps {

  /** Okapi BM25 top-k over a fixed term set, k1 = 1.2, b = 0.75 (the
    * standard constants), Lucene's +1 idf form (never negative).
    *
    * Plan shape, built for 10^12 docs:
    *  - one explode + map-side-combining groupBy(doc_id) computes length
    *    and per-term tfs — the shuffle carries ONE short row per document,
    *    never the words;
    *  - document frequencies and the average length come from a second
    *    1-row aggregate over that doc-level frame (no distinct expansion:
    *    df_t = Σ 1[tf_t > 0]) and ride a broadcast crossJoin — request
    *    -sized, never corpus-sized;
    *  - the tail is orderBy+limit = TakeOrderedAndProject (per-partition
    *    bounded top-k + driver merge of k·P rows), no global sort.
    *
    * Cross-engine float discipline (the DuckDB oracle recomputes every
    * score): the ONLY libm call is ln() inside idf, rounded to 6 BEFORE any
    * multiplication (JVM Math.log and DuckDB ln differ in the last ulp);
    * everything else — tf, len, avgdl, the norm fraction — is IEEE double
    * arithmetic over exact integers with the same parenthesization on both
    * sides, then one final round(6). Ranking uses the ROUNDED score with a
    * doc_id tiebreak, so order is engine-exact by construction. */
  def bm25TopK(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("join", "vector", "scan", "window"),
               k: Int = 20): DataFrame = {
    val docs = TextOps.documents(spark, dir)
    val exploded = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val docAggs = count(lit(1)).as("len") +: tfCols
    val perDoc = exploded.groupBy("doc_id")
      .agg(docAggs.head, docAggs.tail: _*)
    // avgdl as one exact-integer division (NOT avg(): an engine summing
    // longs as accumulating doubles would make avgdl order-dependent)
    val statAggs = count(lit(1)).as("n_docs") +:
      sum(col("len")).as("sum_len") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
      .withColumn("avgdl",
        col("sum_len").cast("double") / col("n_docs").cast("double"))
    // constants as DECIMAL LITERALS only (2.2 = k1+1 written out): the SQL
    // oracle parses the same literal text to the same double; a
    // Scala-computed 1.2+1 is a DIFFERENT double than the literal 2.2
    def termScore(i: Int): Column = {
      // idf rounded to 6 BEFORE the product — the one libm call
      val idf = round(log((col("n_docs") - col(s"df$i") + lit(0.5)) /
        (col(s"df$i") + lit(0.5)) + lit(1.0)), 6)
      val tf = col(s"tf$i").cast("double")
      idf * ((tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("len").cast("double") / col("avgdl"))))
    }
    val score = round(terms.indices.map(termScore).reduce(_ + _), 6)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Winnowing document fingerprints: k-word grams, window w over the gram
    * hash sequence, select each window's MINIMUM hash breaking ties to the
    * RIGHT (the standard robust-winnowing rule), dedupe selections →
    * `(doc_id, pos, fp)`. Guarantees: any shared run of ≥ w+k-1 words
    * between two documents shares at least one fingerprint, and the
    * selected density is ~2/(w+1) — the local-overlap index exact-substring
    * span dedup and plagiarism-style detection build on.
    *
    * The argmin-with-rightmost-tiebreak is ONE integer min: key =
    * h32·2^24 + (2^24−1−pos) — lexicographic (hash asc, pos desc) packed
    * into 56 bits, computed identically by Spark and DuckDB (md5-prefix
    * hash, integer ops only, no float anywhere). Positions are capped at
    * 2^24 words/doc by the packing (a 16M-word document is a corpus bug —
    * packing/chunking runs far upstream of fingerprinting).
    *
    * Plan: split + posexplode (one Generate), grams via two lead() windows
    * and the min via a following-frame window — all three share the
    * (doc_id, pos) partitioning+ordering, so ONE per-document sort feeds
    * them; per-partition work is bounded by document length, and the
    * final distinct's shuffle carries only selected fingerprints
    * (~2/(w+1) of gram count). */
  def winnowFingerprints(spark: SparkSession, dir: String,
                         k: Int = 3, w: Int = 4): DataFrame =
    // fan out before the gram Generate: the split+posexplode runs in the
    // scan stage, which plans as one task on a single-file table
    winnowFingerprintsDf(Par.fanOut(
      TextOps.documents(spark, dir).select("doc_id", "text"), col("doc_id")),
      k, w)

  /** [[winnowFingerprints]] over an explicit `(doc_id, text)` frame. */
  def winnowFingerprintsDf(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val grams = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w0")
      .withColumn("gram",
        concat_ws(" ", (0 until k).map(j =>
          if (j == 0) col("w0") else lead(col("w0"), j).over(byPos)): _*))
      .withColumn("n_words", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("n_words") - k) // full grams only
      .withColumn("h32", conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long"))
      .withColumn("key",
        col("h32") * lit(1L << 24) + (lit((1L << 24) - 1) - col("pos")))
    val sel = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("n_grams", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("sel_key", min(col("key")).over(sel))
      // full windows only — AFTER the min: a window anchored inside the
      // domain still reaches following grams beyond it
      .filter(col("pos") <= col("n_grams") - w)
      .select(col("doc_id"),
        (lit((1L << 24) - 1) - pmod(col("sel_key"), lit(1L << 24))).as("pos"),
        expr(s"sel_key div ${1L << 24}").as("fp"))
      .distinct()
  }

  /** `q_winnow_pairs`: document pairs sharing ≥ `minShared` winnowing
    * fingerprints, with the matched span localized on each side — the
    * MOSS report shape: not "these docs are similar" (MinHash's answer)
    * but "doc A's region [a_lo, a_hi] overlaps doc B's [b_lo, b_hi]".
    *
    * Plan shape, built for 10^12 docs:
    *  - the fingerprint table is materialized ONCE (eager localCheckpoint)
    *    before the self-join — both join sides would otherwise re-evaluate
    *    the whole gram/window subtree (the r6 `q_simhash_pairs` lesson,
    *    measured 1.5× there);
    *  - boilerplate fingerprints shared by more than `maxFpDocs` documents
    *    are dropped BEFORE the self-join (same role as the hot-shingle
    *    cap): each fp bucket then yields ≤ maxFpDocs² pairs, so candidate
    *    volume scales with overlap structure, never corpus²;
    *  - the self-join is a plain equi-join on fp; the pair aggregate
    *    shuffles one row per (pair, fp, pos) candidate and emits one row
    *    per pair. No window functions anywhere on the pair path. */
  def winnowPairs(spark: SparkSession, dir: String,
                  k: Int = 3, w: Int = 4,
                  minShared: Int = 2, maxFpDocs: Int = 64): DataFrame = {
    val fps = winnowFingerprintsDf(Par.fanOut(
        TextOps.documents(spark, dir).select("doc_id", "text"), col("doc_id")),
        k, w)
      .localCheckpoint(true)
    val hot = fps.groupBy("fp")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") <= maxFpDocs)
      .select("fp")
    val kept = fps.join(hot, "fp")
    val a = kept.select(col("fp"), col("doc_id").as("id_a"), col("pos").as("pa"))
    val b = kept.select(col("fp"), col("doc_id").as("id_b"), col("pos").as("pb"))
    val out = a.join(b, Seq("fp")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(countDistinct("fp").as("n_shared"),
        min("pa").as("a_lo"), max("pa").as("a_hi"),
        min("pb").as("b_lo"), max("pb").as("b_hi"))
      .filter(col("n_shared") >= minShared)
    // the checkpointed fingerprint blocks stay referenced by `out`'s plan —
    // released when the frame is GC'd, same lifecycle as simhashPairs
    out
  }

  /** `q_k_anon`: k-anonymity audit over quasi-identifier tuples — the
    * privacy gate a training-data release runs: any (source, lang,
    * length-bucket) combination matched by fewer than k documents is a
    * re-identification risk surface. Plain map-side-combining aggregate;
    * the shuffle carries one row per QI tuple. */
  def kAnonAudit(spark: SparkSession, dir: String, k: Int = 4): DataFrame =
    TextOps.documents(spark, dir)
      .groupBy(col("source"), col("lang"),
        expr("n_chars div 200").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
}
