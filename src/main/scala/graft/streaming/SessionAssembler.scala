package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SESSION-DOCUMENT assembly — the streaming face of
  * [[graft.pipeline.TextAnalysis.sessionDocs]], built on Spark's native
  * `session_window` (the one window kind the rest of this repo's streaming
  * plane never needed: candles are fixed windows, gates are per-key state;
  * gap sessions are the genuinely dynamic-window case).
  *
  * An interaction stream (chats, searches, clickstreams) assembles into
  * one training document per activity session ONLINE: the watermark closes
  * a session once no event can extend it (event time past session end +
  * lateness), and append mode emits each session document exactly once —
  * the ingest-side version of the batch log→text pass, no batch replay
  * needed.
  *
  * GAP CONVENTION (differs from the batch twin by a half-open boundary,
  * deliberately documented rather than papered over): `session_window`
  * merges two events iff their gap is STRICTLY below `gap`, while the
  * batch operator splits on `diff > gapSeconds` (keeps equal-gap pairs
  * together). With integer event seconds the two align exactly via
  * `gap = gapSeconds + 1`: stream splits iff diff >= gapSeconds + 1 iff
  * diff > gapSeconds iff batch splits (spec-asserted on the driver feed,
  * and stream == this function's own batch mode row-for-row).
  *
  * Scale shape: one exchange keyed by the user (identical to the batch
  * window's partitioning); session state is bounded by the watermark; the
  * per-session collected array is bounded by session length. The md5
  * assembly is the batch twin's sorted-struct form, so face drift in the
  * rendered text is structurally impossible.
  */
object SessionAssembler {

  def sessionDocsStream(
      ticks: DataFrame,
      gapSeconds: Long = 1800L,
      lateness: String = "10 minutes"): DataFrame = {
    require(gapSeconds > 0, s"sessionDocsStream: gapSeconds must be positive, got $gapSeconds")
    val needed = Seq("symbol", "secs", "event_id", "event_type", "price_micros")
      .filterNot(ticks.columns.contains)
    require(needed.isEmpty,
      s"sessionDocsStream needs the ticks-view columns ${needed.mkString(", ")} " +
        s"(got ${ticks.columns.mkString(", ")})")
    // stream splits at diff >= gap; to match the batch twin's diff > gapSeconds
    // convention on integer seconds, the session gap is gapSeconds + 1
    val gap = s"${gapSeconds + 1} seconds"
    val withTs = ticks.withColumn("__evt", timestamp_seconds(col("secs")))
    val wm = if (withTs.isStreaming) withTs.withWatermark("__evt", lateness) else withTs
    wm
      .withColumn("__entry",
        concat(col("event_type"), lit(":"), col("price_micros").cast("string")))
      .groupBy(col("symbol"), session_window(col("__evt"), gap).as("__w"))
      .agg(
        min(col("secs")).as("session_start"),
        max(col("secs")).as("session_end"),
        count(lit(1)).as("n_events"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("secs"), col("event_id"), col("__entry")))),
            s => s.getField("__entry")))).as("doc_md5"))
      .select(col("symbol"), col("session_start"), col("session_end"),
        col("n_events"), col("doc_md5"))
  }
}
