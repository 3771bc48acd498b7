package graft

import org.apache.spark.sql.SparkSession

/** Headline-query timing only (no streaming phase) — the inner-loop tool
  * for plan iteration; graft.Bench remains the driver contract. Args:
  * [sfDir] [substring filter | comma-separated name list]. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val only = args.drop(1).headOption
      .map(f => (n: String) => f.split(",").exists(n.contains))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    try SparkEntry.queries("q_lrs_by_id")(spark, sfDir).count() // untimed warmup
    catch { case _: Throwable => () }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_(q._1))).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      }
    spark.stop()
  }
}
