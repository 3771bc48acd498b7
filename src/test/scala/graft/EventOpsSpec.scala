package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSuite {
  import spark.implicits._

  test("anonymous filter drops empty usernames (F13, filters.py:8-27)") {
    val df = Seq(("john", 1), ("", 2), (null.asInstanceOf[String], 3)).toDF("username", "v")
    val kept = EventOps.anonymous(df, col("username")).select("v").as[Int].collect()
    assert(kept.toSeq === Seq(1))
  }

  test("approx distinct (HLL) is within rsd of the exact count (A4)") {
    val exact = EventOps.distinctUsers(spark, sf("sf0.01"))
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = EventOps.approxDistinctUsers(spark, sf("sf0.01"))
      .select("event_type", "n_users_approx").as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.1, s"$k: approx $a vs exact $n")
    }
  }
}
