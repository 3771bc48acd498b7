package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiling of the streaming map path in batch mode: isolates
  * decode / envelope parse / payload validate / convert / dedup costs at
  * local[N] so optimization effort lands where the rows actually burn time.
  * Not part of the driver contract. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    import graft.functions.TokenCodec
    import graft.model.Schemas
    import graft.sources.Synth

    val inputPath = java.nio.file.Files.createTempDirectory("prof").toString + "/in"
    Synth.inputTable(spark, n, 128).write.mode("overwrite").parquet(inputPath)
    def input = spark.read.parquet(inputPath)

    def time(name: String)(df: => DataFrame): Unit = {
      df.count() // warmup incl codegen
      val t0 = System.nanoTime()
      val c = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s $dt%7.2f s   ${n / dt / 1000}%8.0f krows/s   out=$c")
    }

    time("0 scan only")(input)
    time("1 +decode tokens")(input.select(TokenCodec.decodeTokens(col("tokens")).as("raw")))
    time("2 +envelope from_json")(input
      .select(from_json(TokenCodec.decodeTokens(col("tokens")), Schemas.edxEvent).as("e"))
      .select(col("e.username")))
    time("3 +full validate")(Validate0.validate(input))
    time("4 +convert (map path)")(Pipeline.validateConvert(input))
    time("5 +batch dedup")(Pipeline.validateConvert(input).dropDuplicates("id"))
    time("6 full batch pipeline")(Pipeline.run(input))
    spark.stop()
  }

  private object Validate0 {
    def validate(df: DataFrame): DataFrame =
      graft.operators.Validate(df).filter(col("status") === graft.operators.Validate.StatusOk)
  }
}

/** CSE-hypothesis probe: project-only vs filter-substituted plans. */
object StageProfile2 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.tune(spark)
    import graft.sources.Synth
    val inputPath = java.nio.file.Files.createTempDirectory("prof2").toString + "/in"
    Synth.inputTable(spark, n, 128).write.mode("overwrite").parquet(inputPath)
    def input = spark.read.parquet(inputPath)
    def time(name: String)(df: => DataFrame): Unit = {
      df.count()
      val t0 = System.nanoTime()
      df.count()
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val v = graft.operators.Validate
    time("project status, no filter")(v(input).select("status"))
    time("groupBy status count")(v(input).groupBy("status").count())
    time("filter status==ok")(v(input).filter(col("status") === "ok"))
    time("filter via cached-col barrier")(
      v(input).select("status").filter(col("status") === "ok"))
    spark.stop()
  }
}
