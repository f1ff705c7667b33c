package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asofJoin: latest right at-or-before each left, inclusive ties, null when none") {
    val left = Seq(
      (100L, 1L, ts(5)),   // matches right at :05 (inclusive)
      (101L, 1L, ts(9)),   // matches right at :07 (latest <= :09)
      (102L, 1L, ts(1)),   // before any right -> null
      (103L, 2L, ts(30))   // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(3), 7L, 0.3),
      (1L, ts(5), 8L, 0.5),
      (1L, ts(7), 9L, 0.7)
    ).toDF("user_id", "ts", "view_event_id", "view_value")

    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts", "ts",
        Seq("view_event_id", "view_value"))
      .orderBy("event_id")
      .select("event_id", "view_event_id", "view_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq

    assert(out == Seq(
      (100L, Some(8L), Some(0.5)),
      (101L, Some(9L), Some(0.7)),
      (102L, None, None),
      (103L, None, None)))
  }

  test("asofJoin keeps every left row exactly once") {
    val left = (1 to 50).map(i => (i.toLong, i % 3L, ts(i % 60))).toDF("event_id", "user_id", "ts")
    val right = Seq((0L, ts(0), 1L, 1.0)).toDF("user_id", "ts", "view_event_id", "view_value")
    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts", "ts",
      Seq("view_event_id", "view_value"))
    assert(out.count() == 50)
    assert(out.select("event_id").distinct().count() == 50)
  }

  test("intervalJoinCount counts only rows strictly inside (t, t+w]") {
    val anchors = Seq((1L, 1L, ts(0))).toDF("event_id", "user_id", "ts")
    val others = Seq(
      (1L, ts(0)),   // == anchor ts: excluded (strict >)
      (1L, ts(3)),   // inside
      (1L, ts(10)),  // == t + w: included (inclusive end)
      (1L, ts(11)),  // outside
      (2L, ts(3))    // other key
    ).toDF("user_id", "ts")
    val out = TemporalJoin.intervalJoinCount(anchors, others, "user_id", "ts", "ts",
        windowUs = 10L * 60 * 1000000, countCol = "n")
      .select("event_id", "n").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)))
  }
}
