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
    // count() prunes the convert projection (nothing consumes xapi), so the
    // lines above only measure the FILTER side; these materialize the
    // payload columns the sink actually writes
    def mat(df: DataFrame): DataFrame =
      df.agg(sum(xxhash64(col("xapi"))).as("h"), count(lit(1)).as("n"))
    time("4m convert materialized")(mat(Pipeline.validateConvert(input)))
    val nValidate = Pipeline.validateConvert(input).queryExecution.executedPlan
      .toString.sliding("edx_row_validate".length).count(_ == "edx_row_validate")
    println(s"edx_row_validate occurrences in physical plan: $nValidate")
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

/** Streaming-stage split at one parallelism level: where do the
  * statements/sec go — map path, dedup state, session state, or sink? */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    import graft.streaming.{LakeSink, StreamPipeline}
    val shm = "/dev/shm/graft-prof"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(shm))
    def session() = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", s"$shm/local")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    val gen = session()
    val inputPath = s"$shm/input"
    graft.sources.Synth.inputTable(gen, n, 128).write.mode("overwrite").parquet(inputPath)
    gen.stop()

    def run(name: String)(build: (SparkSession, String) => org.apache.spark.sql.streaming.DataStreamWriter[_]): Unit = {
      val spark = session()
      try {
        val cp = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(shm), "cp").toString
        val q = build(spark, cp).start()
        q.awaitTermination()
        val batches = q.recentProgress.filter(_.numInputRows > 0)
        val steady = if (batches.length > 1) batches.drop(1) else batches
        val rows = steady.map(_.numInputRows).sum
        val sec = steady.map(_.durationMs.get("triggerExecution").toLong).sum / 1000.0
        println(f"$name%-28s ${rows / sec / 1000}%8.1f krows/s")
      } finally spark.stop()
    }
    val fpt = sys.env.getOrElse("SPARK_GRAFT_FPT", "64")
    def input(spark: SparkSession) = {
      val r = spark.readStream.schema(graft.model.Schemas.inputTable)
      (if (fpt == "all") r else r.option("maxFilesPerTrigger", fpt)).parquet(inputPath)
    }
    def noop(df: org.apache.spark.sql.DataFrame, cp: String) =
      df.writeStream.format("noop").option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())

    run("A map path only")((s, cp) => noop(StreamPipeline.statements(input(s)), cp))
    run("B +dedup state")((s, cp) =>
      noop(StreamPipeline.deduped(StreamPipeline.statements(input(s))), cp))
    run("C +sessions state")((s, cp) =>
      noop(StreamPipeline.sessions(
        StreamPipeline.deduped(StreamPipeline.statements(input(s)))).toDF(), cp))
    run("D full with LakeSink")((s, cp) => {
      val sink = new LakeSink(java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(shm), "sink").toString)
      StreamPipeline.sessions(
        StreamPipeline.deduped(StreamPipeline.statements(input(s)))).toDF()
        .writeStream.outputMode("append").option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.addBatch(id, b); () }
    })
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(new java.io.File(shm))
  }
}
