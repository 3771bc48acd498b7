package graft

/** Driver-local micro-profile of the verdict parse path (no Spark): where
  * do the per-row microseconds actually go? Not part of the driver
  * contract — the inner-loop tool behind the map-path optimization notes
  * in BASELINE.md. */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val rows = (0 until n).map(i => graft.sources.Synth.edxJson(i.toLong)).toArray
    def time(name: String, reps: Int = 3)(body: => Long): Unit = {
      body // warmup
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val acc = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name%-30s $dt%7.3f s  ${n / dt / 1000}%8.0f krows/s  (acc=$acc)")
      }
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    time("jackson readTree only") {
      var acc = 0L; var i = 0
      while (i < n) {
        try acc += mapper.readTree(rows(i)).size()
        catch { case _: Exception => () } // Synth plants malformed rows
        i += 1
      }
      acc
    }
    time("full verdict") {
      var acc = 0L; var i = 0
      while (i < n) {
        acc += (if (graft.functions.EdxModels.verdict(rows(i)).status == "ok") 1 else 0)
        i += 1
      }
      acc
    }
    time("parseTsMicros only") {
      var acc = 0L; var i = 0
      val ts = "2024-01-01T10:00:00.123456+00:00"
      while (i < n) { acc += graft.functions.EdxModels.parseTsMicros(ts); i += 1 }
      acc
    }
    time("readTree + 10 field gets") {
      var acc = 0L; var i = 0
      while (i < n) {
        try {
          val root = mapper.readTree(rows(i))
          def s(f: String) = { val v = root.get(f); if (v == null) null else v.asText }
          Seq("username", "event_source", "event_type", "time", "event",
            "session", "agent", "page", "name", "ip").foreach(f =>
            acc += (if (s(f) == null) 0 else 1))
        } catch { case _: Exception => () }
        i += 1
      }
      acc
    }
  }
}
