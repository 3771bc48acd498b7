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

  /** Cosine similarity via higher-order array functions (codegen-free but
    * allocation-light; all arithmetic in double, left-to-right — the same
    * deterministic order DuckDB's list_cosine_similarity uses). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Brute-force top-k: queries broadcast against the full table. */
  def bruteTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val all = embeddings(spark, dir)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("sim"), col("rank"))
  }

  /** All near-dup pairs above a cosine threshold (embedding-cosine near-dup
    * dedup). Quadratic ground truth at test scale; the LSH variant below is
    * the scale path. */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val a = embeddings(spark, dir).select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = embeddings(spark, dir).select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  // ---- Random-hyperplane LSH (ANN scale path) -----------------------------

  val NumPlanes = 12

  /** Deterministic hyperplanes from the splitmix stream (no RNG state). */
  def planes(dim: Int): Array[Array[Double]] =
    Array.tabulate(NumPlanes) { p =>
      Array.tabulate(dim) { d =>
        val u = graft.sources.Synth.mix(p.toLong * 1000 + d, 131L)
        (u.toDouble / Long.MaxValue.toDouble) // uniform-ish in [-1, 1]
      }
    }

  def bucketOf(v: Column, pl: Array[Array[Double]]): Column = {
    val bits = pl.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      val dot = aggregate(zip_with(v, planeCol, (x, y) => x * y), lit(0.0), (s, x) => s + x)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k: candidates share a bucket (single-probe;
    * multi-probe = also search hamming-1 buckets — documented scale knob).
    * Recall vs brute force is asserted in EmbeddingSpec. */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val dim = 64
    val pl = planes(dim)
    val all = embeddings(spark, dir).withColumn("bucket", bucketOf(col("embedding"), pl))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
    val scored = all.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(cosine(col("qv"), col("embedding")), 6))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("sim"), col("rank"))
  }
}
