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

  /** `q_triangles`: per-document triangle participation in the near-dup
    * pair graph — the clustering-coefficient audit a dedup pipeline runs
    * BEFORE connected components: a component can be a chain of borderline
    * pairs (transitive drift — A≈B≈C with A̸≈C) or a genuinely mutual
    * clique; triangle density distinguishes them, and collapsing a chain
    * to one survivor loses different content than collapsing a clique.
    *
    * Algorithm: degree-oriented node-iterator (Schank & Wagner 2005 /
    * Suri & Vassilvitskii's MR formulation). Each undirected edge is
    * oriented from its lower-(degree, id) endpoint to the higher; wedges
    * are enumerated only at each triangle's UNIQUE minimum-rank apex, so a
    * hot hub of degree d (the exact skew the dup graph has — boilerplate
    * clusters) never enumerates its d² neighbor pairs unless it also
    * ranks lowest; total wedge volume is O(m^1.5) regardless of skew.
    * Three shuffles total (degree agg, wedge self-join, closure join) —
    * all equi-joins on node/pair keys, pair-graph-sized, never
    * corpus-sized. Rides the session's cached pair graph (the
    * q_cluster_split family), adding no new corpus scan. */
  def triangleCounts(spark: SparkSession, dir: String,
                     threshold: Double = 0.5): DataFrame =
    triangleCountsFromPairs(
      CorpusOps.nearDupPairs(spark, dir, threshold).select("id_a", "id_b"))

  /** Core algorithm over an arbitrary CANONICAL edge list (id_a < id_b,
    * no duplicates) — unit-tested on planted cliques/chains in GraphSpec. */
  def triangleCountsFromPairs(pairs: DataFrame): DataFrame = {
    val deg = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = pairs
      .join(deg.select(col("v").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("v").as("id_b"), col("deg").as("db")), "id_b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    val oriented = withDeg.select(
      when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
      when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"))
    // wedges at the apex, normalized to plain id order so the closing edge
    // can be matched against the CANONICAL pair set directly
    val e1 = oriented.select(col("src"), col("dst").as("x"))
    val e2 = oriented.select(col("src"), col("dst").as("y"))
    val wedges = e1.join(e2, "src").filter(col("x") < col("y"))
    val tri = wedges.join(
      pairs.select(col("id_a").as("x"), col("id_b").as("y")), Seq("x", "y"))
    // every triangle found exactly once (at its min-rank apex); each of its
    // three vertices participates
    tri.select(explode(array(col("src"), col("x"), col("y"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
  }
}
