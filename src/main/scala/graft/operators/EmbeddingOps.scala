package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * `(vec_id, embedding array<float>, label)`.
  *
  * Baseline: brute-force cosine top-k (broadcast the query side — the data
  * side is never replicated, so it scales to arbitrarily many vectors with a
  * single shuffle for the per-query top-k). Scale path: random-hyperplane
  * LSH bucketing — candidates only meet inside a bucket, turning the
  * quadratic scan into an equi-join on bucket keys.
  */
object EmbeddingOps {

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))

  /** Cosine similarity via higher-order array functions (all arithmetic in
    * double, left-to-right — the same deterministic order DuckDB's
    * list_cosine_similarity uses). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))

  /** Embeddings with the L2 norm precomputed ONCE per vector — pairwise
    * scoring then costs a dot product only (3× fewer array passes than
    * recomputing both norms per pair; same bits, norms are a pure function
    * of the vector). */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))

  /** Brute-force top-k: queries broadcast against the full table. */
  def bruteTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val all = withNorm(embeddings(spark, dir))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
    val scored = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("sim"), col("rank"))
  }

  /** All near-dup pairs above a cosine threshold (embedding-cosine near-dup
    * dedup). Quadratic ground truth at test scale; the LSH variant below is
    * the scale path. */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = withNorm(embeddings(spark, dir))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  // ---- Random-hyperplane LSH (ANN scale path) -----------------------------

  /** Multi-table LSH: L independent tables of k hyperplanes. A candidate
    * must share a full k-bit bucket in at least one table — recall
    * ≈ 1 - (1 - p^k)^L with p = 1 - θ/π per plane. More tables buy recall
    * linearly in index size; k controls bucket selectivity. */
  val NumTables = 16
  val PlanesPerTable = 6

  /** Deterministic hyperplanes from the splitmix stream (no RNG state). */
  def planes(dim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(NumTables) { t =>
      Array.tabulate(PlanesPerTable) { p =>
        Array.tabulate(dim) { d =>
          val u = graft.sources.Synth.mix((t.toLong * 64 + p) * 1000 + d, 131L)
          u.toDouble / Long.MaxValue.toDouble // uniform-ish in [-1, 1]
        }
      }
    }

  /** Array of (table, bucket) keys — one per table — for a vector. */
  def bucketsOf(v: Column, pl: Array[Array[Array[Double]]]): Column = {
    val perTable = pl.zipWithIndex.map { case (table, t) =>
      val bits = table.zipWithIndex.map { case (plane, i) =>
        val planeCol = array(plane.map(lit): _*)
        val dot = aggregate(zip_with(v, planeCol, (x, y) => x * y), lit(0.0), (s, x) => s + x)
        when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      // encode table id in the high bits so keys never collide across tables
      bits.reduce(_ + _) + lit(t.toLong << 32)
    }
    array(perTable: _*)
  }

  // ---- IVF (inverted-file) ANN -------------------------------------------

  /** Mini-Lloyd k-means codebook: deterministic seeds (stride over vec_id),
    * a few assignment/update rounds. Centroids are tiny (k × dim) and live
    * on the driver / in the plan — the data side is only ever scanned. */
  def trainCentroids(df: DataFrame, k: Int = 16, iters: Int = 2): Array[Array[Double]] = {
    import org.apache.spark.sql.Row
    val seeds = df.orderBy("vec_id").limit(k * 7)
      .collect().zipWithIndex.filter(_._2 % 7 == 0).take(k)
      .map(_._1.getAs[Seq[Double]]("embedding").toArray)
    var cents = seeds
    (0 until iters).foreach { _ =>
      val assigned = df.withColumn("cluster",
        graft.functions.ArgMinCentroid.argminCentroid(col("embedding"), cents))
      val means = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg("x").as("m"))
        .collect().groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        means.get(c).map { rows =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }.getOrElse(cents(c)) // empty cluster keeps its seed
      }.toArray
    }
    cents
  }

  /** IVF ANN top-k: vectors indexed by nearest centroid; a query probes its
    * `nProbe` closest cells only. The scale path pre-materialises the
    * `cluster` column (partition/bucket the lake table by it); probing is an
    * equi-join on cluster ids — never a full scan. */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
              nProbe: Int = 4, nCells: Int = 16): DataFrame = {
    import spark.implicits._
    val all = withNorm(embeddings(spark, dir))
    val cents = trainCentroids(all, nCells)
    val indexed = all.withColumn("cluster",
      graft.functions.ArgMinCentroid.argminCentroid(col("embedding"), cents))
    // queries: nProbe nearest cells each (driver-side — nQueries is request-sized)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
      .collect().flatMap { r =>
        val vec = r.getAs[Seq[Double]]("qv").toArray
        graft.functions.ArgMinCentroid.ranked(vec, cents).take(nProbe)
          .map(cell => (r.getLong(0), vec, r.getDouble(2), cell))
      }.toSeq.toDF("qid", "qv", "qn", "cluster")
    val scored = indexed.join(broadcast(q), Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("sim"), col("rank"))
  }

  /** Multi-table LSH ANN top-k: candidates share a bucket in ≥1 table.
    * Recall vs brute force is asserted in EmbeddingSpec; scale path for the
    * quadratic bruteTopK (candidates meet via equi-join on bucket keys). */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val pl = planes(64)
    val all = embeddings(spark, dir)
      .withColumn("bucket", explode(bucketsOf(col("embedding"), pl)))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
    val scored = all.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("qv"), col("embedding"))
      .distinct() // a pair may collide in several tables
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("sim"), col("rank"))
  }
}
