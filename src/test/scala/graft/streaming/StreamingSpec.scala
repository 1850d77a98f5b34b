package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("streaming windowed counts equal the batch transform") {
    // FileStreamSource needs a directory, not a single parquet file
    val tmp = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("part-0.parquet"))
    val q = EventStream.runFromParquet(spark, tmp.toString, "ws_counts")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ws_counts")
      .select($"w_start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val batch = EventStream.windowedCounts(spark.read.parquet(s"$dir/events.parquet"))
      .select($"w_start", $"event_type", $"n").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    // append-mode emits only watermark-closed windows: subset of batch, and
    // every emitted window must agree exactly with the batch computation
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), s"streamed rows disagree with batch: ${streamed.diff(batch).take(3)}")
  }

  test("stateful per-user activity counts match groupBy") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val got = EventStream.userActivity(spark, events)
      .collect().map(u => u.user_id -> u.events).toMap
    val exp = events.groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }
}
