package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Variant timing for `q_simhash_pairs` (VERDICT r5 Next #8): is the
  * ~19.8KB un-JIT-able fused Generate+aggregate method its real cost, and
  * does splitting the signature projection from the band explode pay?
  * Not part of the driver contract. */
object SimhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.methodSplitThreshold", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)

    def time(name: String, reps: Int = 5)(df: => DataFrame): Unit = {
      df.count() // warmup: codegen + JIT
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s min=${times.min}%6.3f s  med=${times.sorted.apply(reps / 2)}%6.3f s")
    }

    // A: the shipped shape — project(simhash) + posexplode fused
    time("A shipped (fused explode)")(TextOps.simhashPairs(spark, dir))

    // A1: signature projection alone (is the md5 sig the floor?)
    time("A1 sigs only")(TextOps.simhashDocs(spark, dir))

    // A2/A3/A4: peel the stages — explode, join, distinct
    def banded0 = {
      val sigs = TextOps.simhashDocs(spark, dir)
      val bandCols = (0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)))
      sigs.select(col("doc_id"), col("simhash"), posexplode(array(bandCols: _*)))
        .toDF("doc_id", "simhash", "band", "bkey")
    }
    time("A2 +banded explode")(banded0)
    time("A3 +self-join (no distinct)")(banded0.as("x").join(banded0.as("y"),
      col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id")))
    time("A4 +distinct")(TextOps.simhashCandidates(TextOps.simhashDocs(spark, dir)))

    // B: split via localCheckpoint — sig stage and explode stage JIT apart
    def variantB(): DataFrame = {
      val sigs = TextOps.simhashDocs(spark, dir).localCheckpoint(true)
      val out = TextOps.simhashCandidates(sigs)
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
      out
    }
    val t0 = System.nanoTime(); variantB().count()
    println(f"B checkpoint-split (cold, 1 rep)     ${(System.nanoTime() - t0) / 1e9}%6.3f s")

    // C: no Generate — four band projections unioned (sig recomputed 4×,
    // but every stage is a small JIT-able method)
    def variantC(): DataFrame = {
      val sigs = TextOps.simhashDocs(spark, dir)
      val banded = (0 until 4).map { b =>
        sigs.select(col("doc_id"), col("simhash"), lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bkey"))
      }.reduce(_ unionAll _)
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          col("x.simhash").as("sa"), col("y.simhash").as("sb"))
        .distinct()
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    }
    time("C union-of-4 (no Generate)")(variantC())

    spark.stop()
  }
}
