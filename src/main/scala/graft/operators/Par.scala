package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan fan-out for under-partitioned inputs.
  *
  * A small table stored as one parquet file (or one row group) plans as a
  * ONE-task scan, so every per-row-expensive stage fused onto that scan —
  * shingling, signature hashing, container synthesis/decode, regex scans,
  * BPE encoding — runs on a single core no matter how many the session has.
  * At 100 TB the same tables arrive as thousands of splits and the scan
  * stage parallelizes by itself; this helper closes the gap for the small
  * end WITHOUT penalizing the large end: it hash-repartitions on the
  * table's unique key ONLY when the planned scan has fewer partitions than
  * the session's default parallelism, and is a no-op otherwise. The moved
  * bytes are one pass over a table that is, by the trigger condition,
  * smaller than a handful of splits — the cheapest shuffle in the plan.
  *
  * Apply it SURGICALLY, at sites whose downstream per-row cost dominates
  * the ~0.1 s extra exchange+stage a small-data shuffle costs (container
  * synthesis/decode, shingling+signatures feeding self-joins, corpus-wide
  * BPE encoding) — measured on the full 103-query pass, fanning out every
  * base-table read cost more in added stages on the ~70 cheap queries than
  * it saved on the heavy ones (+18 s total), while the surgical form keeps
  * the heavy queries' 3-8× stage speedups.
  *
  * Hash partitioning on the primary key (not round-robin) keeps the
  * row-to-partition assignment deterministic under task retry (no
  * sort-before-repartition pass, no SPARK-38388-style reassignment) and
  * lets downstream per-key operations reuse the exchange when partition
  * counts line up.
  */
object Par {

  /** `df` repartitioned to the session's default parallelism on `key` when
    * its planned scan is narrower than that; `df` unchanged otherwise. */
  def fanOut(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
