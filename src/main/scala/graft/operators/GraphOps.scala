package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. Web-scale pretraining
  * pipelines weight pages by link centrality (the Common-Crawl-rank /
  * harmonic-centrality signal quality filters consume); the operator here
  * is the classic damped PageRank power iteration (Brin & Page 1998),
  * expressed as the iterative join+aggregate Spark plan — a Pregel
  * superstep without the RDD API.
  *
  * Scale notes (the part that matters at 10^12 edges):
  *  - each iteration is ONE shuffle of (dst, contribution) pairs keyed by
  *    node id — never the adjacency lists; the edge table is checkpointed
  *    once and re-read, and on a real cluster would be bucketed by `src`
  *    so the per-iteration join co-locates with the score table's hash
  *    partitioning from the previous groupBy;
  *  - scores are `localCheckpoint(eager)`ed per iteration — the iterative
  *    plan-explosion trap (each round otherwise nests the previous plan:
  *    analysis cost grows 16×/round and OOMs the driver long before data
  *    does; see BpeTrainer for the same pattern);
  *  - arithmetic is FIXED-POINT int64 (micro-units): integer sums are
  *    exactly associative, so the result is independent of Spark's
  *    aggregation order AND bit-identical to the DuckDB recursive-CTE
  *    oracle — a float PageRank would drift by summation order and flip
  *    round(6) hashes.
  */
object GraphOps {

  /** Damped PageRank over an explicit edge list, fixed-point int64.
    * `nodes`: one `doc_id` per vertex; `edges`: (src, dst) with UNIFORM
    * out-degree `outDeg` per src (the synthetic-graph contract below; a
    * general out-degree would divide by a joined per-src count instead).
    * score_0 = 1e6; score_{t+1} = 150000 + (85 · Σ_in (score_t div outDeg))
    * div 100 — i.e. damping 0.85 in micro-units with truncating division,
    * mirrored exactly by the oracle's `//`. */
  def pageRank(nodes: DataFrame, edges: DataFrame, outDeg: Int,
               iters: Int = 10): DataFrame = {
    val spark = nodes.sparkSession
    val e = edges.localCheckpoint(true) // computed once, re-read per iteration
    var scores = nodes.select(col("doc_id"),
      lit(1000000L).as("score")).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val contrib = e.join(scores, e("src") === scores("doc_id"))
        .select(col("dst"), expr(s"score div $outDeg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      // vertex set = the previous generation's keys (one row per doc_id by
      // construction) — re-reading the checkpoint instead of re-evaluating
      // the `nodes` lineage saves a full vertex-source scan per iteration
      val prevIds = scores.select("doc_id")
      val next = prevIds.join(contrib, prevIds("doc_id") === contrib("dst"), "left")
        .select(prevIds("doc_id"),
          (lit(150000L) + expr("(85 * coalesce(in_sum, 0L)) div 100")).as("score"))
        .localCheckpoint(true)
      // release the replaced generation's blocks (plan is already truncated)
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpointQuietly(scores)
      scores = next
      it += 1
    }
    // the edge checkpoint is dead once the last generation is materialized
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpointQuietly(e)
    scores
  }

  /** `q_pagerank`: deterministic synthetic link graph over the documents
    * table — every doc links to its successor (a Hamiltonian cycle, so
    * min in-degree ≥ 1 and no vertex ever leaves the recursion), plus two
    * non-bijective maps ((id²+1) mod n funnels quadratic residues,
    * (id div 3 + 7) mod n funnels triples) that skew in-degree, giving a
    * non-trivial ranking the DuckDB recursive CTE reproduces exactly.
    * Top 50 by (score desc, doc_id) — a TakeOrderedAndProject tail. */
  def pageRankQuery(spark: SparkSession, dir: String): DataFrame = {
    val nodes = TextOps.documents(spark, dir).select("doc_id")
    // driver scalar: one 1-row agg. The synthetic edge maps below use
    // `% n`, which is a permutation-free funnel ONLY over a dense id space:
    // with gapped ids the engine would drop contributions to phantom dst
    // ids while the recursive-CTE oracle still scores them — a silent
    // divergence. Fail loudly instead of diverging quietly (r5 ADVICE).
    val stats = nodes.agg(count("*"), min("doc_id"), max("doc_id")).head()
    val n = stats.getLong(0)
    if (n == 0L) // min/max are null on zero rows — empty in, empty out
      return nodes.select(col("doc_id"), col("doc_id").as("pagerank_fp"))
    require(stats.getLong(1) == 0L && stats.getLong(2) == n - 1,
      s"pageRankQuery requires contiguous doc_id [0, n): saw " +
        s"min=${stats.getLong(1)} max=${stats.getLong(2)} n=$n")
    val id = col("doc_id")
    val edges = nodes.select(id.as("src"), ((id + 1) % n).as("dst"))
      .unionAll(nodes.select(id.as("src"), ((id * id + 1) % n).as("dst")))
      .unionAll(nodes.select(id.as("src"),
        (expr("doc_id div 3") + 7) % n as "dst"))
    pageRank(nodes, edges, outDeg = 3)
      .select(col("doc_id"), col("score").as("pagerank_fp"))
      .orderBy(col("pagerank_fp").desc, col("doc_id"))
      .limit(50)
  }
}
