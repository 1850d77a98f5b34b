package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming surface for the events table. The reference is
  * strictly batch (SURVEY §2.12), so this is forward-looking pipeline
  * infrastructure: watermarked windowed aggregation + a stateful
  * per-user session counter via mapGroupsWithState. Batch and streaming
  * share the same transformation so results are comparable. */
object EventStream {

  /** Tumbling-window aggregation (shared by batch + streaming). */
  def windowedCounts(events0: DataFrame): DataFrame = {
    val events = events0.withColumn("ts", col("ts").cast("timestamp"))
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).as("sv"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sv"))
  }

  /** Run the streaming query against a parquet directory source and drain
    * it into an in-memory table; returns the query for inspection.
    * Append mode emits only watermark-CLOSED windows: the trailing
    * watermark-delay's worth of windows (and everything, if the data spans
    * less than the delay) intentionally stays open and unemitted — exactly
    * what a production run would hold back too. */
  def runFromParquet(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema).parquet(dir)
    windowedCounts(src).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming exact dedup: keep the FIRST document per content
    * fingerprint within the watermark horizon
    * (dropDuplicatesWithinWatermark) — dedup state is bounded by the
    * watermark, which is the only shape that survives an unbounded stream
    * (an un-watermarked dropDuplicates accumulates state forever at
    * 100 TB/day). Duplicates that straddle horizons are caught by the
    * batch exact/MinHash jobs downstream. Works unchanged on a batch
    * frame via plain dropDuplicates for A/B parity. */
  def dedupDocs(docs: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val fp = docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
    if (docs.isStreaming)
      fp.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(Seq("fp"))
    else {
      // batch A/B side: keep the EARLIEST row per fingerprint so the
      // survivor matches the streaming first-arrival semantics (a plain
      // dropDuplicates keeps an arbitrary row per key)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("fp")).orderBy(col("ts"))
      fp.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }
  }

  final case class UserState(count: Long, lastTs: Long)
  final case class UserActivity(user_id: Long, events: Long)

  /** Stateful custom operator: running per-user event counts
    * (KeyValueGroupedDataset.mapGroupsWithState, no timeout — state is
    * per-user and PERMANENT, so this surface fits bounded key spaces;
    * an open-ended user id stream should evict via
    * GroupStateTimeout.ProcessingTimeTimeout + state.setTimeoutDuration,
    * trading exactness of long-idle users' counts for bounded state). */
  def userActivity(spark: SparkSession, events: DataFrame): Dataset[UserActivity] = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts").cast("timestamp").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var c = prev.count; var last = prev.lastTs
          rows.foreach { r => c += 1; last = math.max(last, r._2) }
          state.update(UserState(c, last))
          UserActivity(user, c)
      }
  }
}
