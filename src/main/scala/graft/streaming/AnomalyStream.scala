package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-user z-score ANOMALY detection: batch an1's exact
  * integer test — (c·n − S)² > 4·(n·Q − S²) on cents, the |v − μ| > 2σ
  * square-out — evaluated AT ARRIVAL against the statistics of
  * everything the user has streamed so far (the arrival included).
  * This is the detect-at-ingest semantics a monitoring pipeline wants:
  * early events judge against little history, and the verdict for an
  * event never changes retroactively (append mode, exactly once per
  * event). When the stream has delivered a user's full history, the
  * LAST event's test is evaluated against exactly batch an1's
  * population — and the running state equals the batch aggregates,
  * which is what AnomalyStreamSpec asserts (making the state
  * arithmetic transitively DuckDB-verified through an1's oracle).
  *
  * Scale/state shape: state per user is THREE integers — (n, S, Q) —
  * so state size is user-cardinality × ~100 bytes, the cheapest
  * possible keyed-state footprint (contrast the dedup legs, which
  * must retain member vectors). Q is held as a BigInt (string-encoded
  * in the state row): per-event c² stays well inside a long, but a
  * production power-user key accumulates Q past 2^63 — the same
  * silent-wrap regime batch an1's DECIMAL(38) widening guards — and
  * the verdict products (d², n·Q, S²) run in BigInt for the same
  * reason. One keyed shuffle on user_id; `ttlMs > 0` ages out cold
  * users (finite monitoring horizon, the DedupStream TTL contract —
  * a TTL'd query needs a real trigger interval).
  *
  * Within a micro-batch, a user's events process in event_id order —
  * the deterministic arrival order the spec replays; across batches,
  * order is arrival order (the streaming contract: verdicts depend on
  * what has actually been seen, same as the dedup legs).
  */
object AnomalyStream {

  final case class EventRow(event_id: Long, user_id: Long, c: Long)
  final case class AnomState(n: Long, s: Long, q: String)
  final case class AnomVerdict(event_id: Long, user_id: Long, c: Long,
      n_so_far: Long, anom: Boolean)

  /** The an1 test on running stats, wrap-safe. */
  private[streaming] def isAnom(c: Long, n: Long, s: Long, q: BigInt): Boolean = {
    val d = BigInt(c) * n - s
    d * d > 4 * (BigInt(n) * q - BigInt(s) * s)
  }

  /** (event_id, user_id, value_cents) stream → one [[AnomVerdict]] per
    * event, exactly once, append mode, checkpoint-recoverable. */
  def verdicts(events: DataFrame, ttlMs: Long = 0L): Dataset[AnomVerdict] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("c").cast("long"))
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[EventRow],
            state: GroupState[AnomState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (n, s, q) = state.getOption
              .map(st => (st.n, st.s, BigInt(st.q)))
              .getOrElse((0L, 0L, BigInt(0)))
            val out = rows.toSeq.sortBy(_.event_id).map { e =>
              n += 1; s += e.c; q += BigInt(e.c) * e.c
              AnomVerdict(e.event_id, user, e.c, n, isAnom(e.c, n, s, q))
            }
            if (n > 0L) {
              state.update(AnomState(n, s, q.toString))
              if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
            }
            out.iterator
          }
        })
  }
}
