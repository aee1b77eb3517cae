package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Streaming session windows — the ws1 batch operator's live leg,
  * completing the window family (W1 sliding / W2 hopping / W3 tumbling
  * all have streaming twins; gap-based sessions were batch-only until
  * round 8).
  *
  * The aggregation body IS batch ws1's ([[graft.ops.Extended
  * .sessionAgg]] — `session_window` + count / exact-cents sum /
  * min-max bounds), applied to a watermarked stream: Structured
  * Streaming keeps per-(user, session) state in the aggregation
  * layer, MERGES sessions when a new event bridges two open ones —
  * including across micro-batches, the case a per-batch groupBy could
  * never produce — and closes a session once the watermark passes its
  * end + gap. StreamingSessionSpec pins both: cross-batch merge
  * equality with the batch twin, and append-mode emission only at
  * session close with late rows dropped.
  *
  * At 100 TB-scale ingest this is one shuffle on the session key with
  * incremental state merge on the RocksDB store — identical shape to
  * the batch plan, which is the point of sharing the body. */
object SessionStream {

  /** `events` must carry (user_id, ts: timestamp, value) and a
    * watermark already set on `ts` (the caller owns lateness policy);
    * output schema matches batch ws1 exactly. */
  def sessions(events: DataFrame, gap: String = "2 hours"): DataFrame =
    graft.ops.Extended.sessionAgg(events, gap)

  /** Convenience with the watermark applied here: `delay` bounds both
    * late-event acceptance and state retention. */
  def sessionsWithWatermark(events: DataFrame, gap: String,
      delay: String): DataFrame =
    sessions(events.withWatermark("ts", delay), gap)

  /** Column pruning helper shared with the spec: the narrow projection
    * a session aggregation needs (everything else would ride through
    * the shuffle as dead weight). */
  def narrow(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("ts"), col("value"))
}
