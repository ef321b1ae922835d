package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * The reference is batch-only (SURVEY.md §2.5); this is the north-star
  * streaming extension, built so every aggregation has a batch twin in
  * SparkEntry (`events_hourly`, `events_by_type`) — the same code path
  * `readStream` drives incrementally is what the DuckDB oracle checks in
  * batch form.
  *
  * Scale: watermark + windowed aggregation keeps state bounded (late
  * data beyond 2h is dropped, window state is evicted past the
  * watermark); sessionization uses the declarative `session_window`
  * (state store managed) and custom state uses
  * `mapGroupsWithState` keyed by user — both shuffle once on the group
  * key and scale with active keys, not history.
  */
object EventStream {

  /** Streaming twin of the `events_hourly`/`events_by_type` batch
    * queries: 1-hour tumbling windows per event type, 2-hour watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000)).as("sum_value_q"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value_q"))

  /** Gap-based sessionization, declarative: `session_window` merges
    * events per user whose gaps are under `gap`. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("events"),
        sum(floor(col("value") * 1000)).as("sum_value_q"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("events"), col("sum_value_q"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, events: Long, sum_value_q: Long)

  /** Custom running state via `mapGroupsWithState`: cumulative per-user
    * counters that survive across micro-batches — the escape hatch for
    * semantics `session_window`/windowed aggs can't express. */
  def runningUserStats(events: Dataset[UserEvent])
                      (implicit spark: SparkSession): Dataset[UserStats] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0L))
          val next = batch.foldLeft(prev) { (s, e) =>
            UserStats(uid, s.events + 1, s.sum_value_q + math.floor(e.value * 1000).toLong)
          }
          state.update(next)
          next
      }
  }

  /** Stream-stream temporal enrichment: join a purchase stream to a
    * click stream per user within a time bound (click in the `window`
    * before or at the purchase) — the streaming twin of
    * `Temporal.rangeJoinBucketed`. Watermarks on BOTH sides bound the
    * join state: clicks older than purchase-watermark − window are
    * evicted, so state size tracks the window, not history.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
                        window: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window"))
      .select("user_id", "p_ts", "purchase_id", "c_ts", "click_id")
  }

  /** Streaming ingestion dedup: drop re-delivered events by id while the
    * watermark keeps the dedup state bounded (ids older than the
    * watermark are evicted — at-least-once upstream becomes effectively-
    * once downstream without unbounded state). */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Wire a directory of events parquet as a stream (file source) —
    * production entry: `readStream` over an append-only events lake. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** Sink helper: append to parquet with checkpointing (exactly-once
    * file sink). Returns the query handle — callers must
    * awaitTermination/stop it (dropping it races driver shutdown against
    * the first micro-batch commit). */
  def writeParquetStream(df: DataFrame, outDir: String,
                         checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .start()
}
