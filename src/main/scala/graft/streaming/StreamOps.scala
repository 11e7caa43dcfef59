package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured Streaming variants of the engine's windowed operators.
  *
  * The reference is strictly batch (SURVEY.md §2.11) and the graft's
  * resumability story is snapshot-based, but the engine also exposes the
  * streaming formulation for pipelines that want incremental ingestion:
  * the same event schema flows through `readStream` with watermarked
  * event-time windows and native session windows.
  */
object StreamOps {

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean_v"))

  /** Native session windows (gap-based), the streaming twin of
    * Windows.sessionize.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup, the incremental twin of [[graft.operators.Dedup
    * .exact]]: keep the first occurrence per content key, where the state
    * store retains keys only within the watermark horizon (unbounded dedup
    * state is the classic streaming-pipeline OOM at 10^12 docs — late
    * re-occurrences beyond the horizon are the documented tradeoff, exactly
    * as in the batch engine's snapshot-incremental reprocessing).
    */
  def dedupExact(events: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .withColumn("__k", xxhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("__k")
      .drop("__k")

  /** Drive a streaming query synchronously over a bounded source into an
    * in-memory table (test/bench harness path). Append mode only emits
    * watermark-closed windows (the last open session per key stays pending);
    * pass Complete for bounded-input comparisons against batch.
    */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
