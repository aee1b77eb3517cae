package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.RkLsh

/** Streaming near-duplicate detection: the dd2 banded-MinHash index
  * maintained INCREMENTALLY as documents arrive — the "dedup on
  * ingest" shape a continuously-crawling corpus pipeline needs, where
  * re-running batch dedup over the full corpus per increment is the
  * thing you're trying to avoid.
  *
  * Design: each document flatMaps to its 8 (band, bkey) rows (same
  * signature arithmetic as batch dd2 — [[RkLsh]] end to end, so
  * StreamingDedupSpec can assert streaming output == batch dd2 output
  * on the same corpus); state is keyed by the band bucket and holds
  * that bucket's (doc_id, signature) members; a new arrival compares
  * against ONLY its bucket's members (the whole LSH point — candidate
  * comparisons, never corpus comparisons) and emits pairs whose
  * signature-estimated Jaccard clears the dd2 threshold.
  *
  * Emission is at-least-once per PAIR (a pair sharing two band buckets
  * emits from both — buckets can't see each other's state); exact
  * batch semantics come from a downstream `dropDuplicates`, or
  * `dropDuplicatesWithinWatermark` once emissions carry event time.
  * State is per-bucket and grows with the corpus by design (an index
  * IS its members); production bounds it the same way batch LSH
  * shards postings — band-key partitioning spreads it across
  * executors, and the WIRED TTL (`ttlMs` →
  * `GroupStateTimeout.ProcessingTimeTimeout`, re-armed on every
  * arrival) ages out cold buckets when the dedup horizon is finite: a
  * bucket untouched for `ttlMs` is removed on the next trigger and
  * rebuilds from scratch on its next arrival (StreamingDedupSpec
  * proves drop + clean re-create). `ttlMs = 0` (the default) keeps
  * the index unbounded for exact batch-dd2 equivalence.
  */
object DedupStream {

  final case class Banded(band: Int, bkey: Long, docId: Long, sig: Seq[Long])
  /** a bucket's members, flattened to primitive arrays: `sigs` holds
    * NUM_PERM longs per doc, arrival-ordered like `ids`. The obvious
    * `Seq[Member(id, sig: Seq[Long])]` state paid the nested-Seq
    * encoder (per-element boxing on every read AND rewrite of every
    * touched bucket, every batch) — primitive arrays ride
    * UnsafeArrayData's bulk copy and cut the dedup leg's addBatch time
    * roughly in half at sf1.
    *
    * STATE-FORMAT BREAK (round 11): this replaced `Seq[Member]`
    * (array<struct>) as the stored state schema. Spark's
    * StateSchemaCompatibilityChecker rejects a checkpoint written
    * under the old layout — a pre-round-11 checkpoint must be
    * DISCARDED (replay the source into a fresh checkpoint); there is
    * no in-place migration. Recovery guarantees hold only across
    * restarts on one state-schema generation. */
  final case class Bucket(ids: Array[Long], sigs: Array[Long])
  /** per-member view — [[CurationStream]]'s band-bucket state shape */
  final case class Member(id: Long, sig: Seq[Long])
  final case class DupPair(da: Long, db: Long, est_jaccard: Double)

  private val NUM_PERM = 32
  private[streaming] val BANDS = 8
  private val ROWS = NUM_PERM / BANDS

  /** dd2's MinHash signature from a document's RK shingle hashes;
    * empty in = empty out (a doc too short to shingle has no
    * signature and can near-dup nothing). */
  private[streaming] def signatureOf(sh: Seq[Long]): Seq[Long] =
    if (sh.isEmpty) Seq.empty
    else {
      val sig = Array.fill(NUM_PERM)(Long.MaxValue)
      sh.foreach { h =>
        var j = 0
        while (j < NUM_PERM) {
          val p = RkLsh.perm(j, h)
          if (p < sig(j)) sig(j) = p
          j += 1
        }
      }
      sig.toSeq
    }

  /** The BANDS (band, bucket-key) pairs of a signature — dd2's banding
    * arithmetic verbatim. */
  private[streaming] def bandKeysOf(sig: Seq[Long]): Seq[(Int, Long)] =
    (0 until BANDS).map { b =>
      var acc = 0L
      var r = 0
      while (r < ROWS) { acc = (acc * RkLsh.MUL + sig(b * ROWS + r)) % RkLsh.M40; r += 1 }
      (b, acc)
    }

  /** (doc_id, text) rows → one row per (band, bucket): the exact dd2
    * signature/banding arithmetic, computed per row (no aggregation —
    * a streaming groupBy would itself be a stateful operator) from the
    * same RkShingleHashes expression and [[RkLsh]] constants. */
  def banded(docs: DataFrame): Dataset[Banded] = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.registerAll(spark)
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        call_function("rk_shingle_hashes", split(col("text"), " "), lit(3)).as("sh"))
      .as[(Long, Seq[Long])]
      .flatMap { case (id, sh) =>
        val s = signatureOf(sh)
        if (s.isEmpty) Seq.empty[Banded]
        else bandKeysOf(s).map { case (b, acc) => Banded(b, acc, id, s) }
      }
  }

  /** matching-permutation estimate, identical truncation to batch dd2's
    * `Exact.intRatio(matches, 32)` (m·1e6/32 = m·31250 is exact) */
  private[graft] def est(a: Seq[Long], b: Seq[Long]): Double = {
    var m = 0; var i = 0
    while (i < NUM_PERM) { if (a(i) == b(i)) m += 1; i += 1 }
    (m * 1000000L / NUM_PERM) / 1e6
  }

  /** the incremental index: near-dup pairs (da < db, est ≥ 0.5),
    * at-least-once per pair across bands (see scaladoc). `ttlMs > 0`
    * bounds state: each arrival re-arms its bucket's processing-time
    * timeout, and a bucket cold for `ttlMs` is evicted wholesale. */
  def nearDupPairs(docs: DataFrame, ttlMs: Long = 0L): Dataset[DupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // register the timeout machinery ONLY when a TTL is requested:
    // with ProcessingTimeTimeout the engine treats every batch as
    // "timeouts may fire" (shouldRunAnotherBatch == true) and an
    // untriggered query busy-loops empty micro-batches — a TTL'd
    // deployment pairs with a real trigger interval (see the spec)
    val timeoutConf =
      if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded(docs)
      .groupByKey(b => (b.band, b.bkey))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: (Int, Long), rows: Iterator[Banded], state: GroupState[Bucket]) => {
          if (state.hasTimedOut) {
            // cold bucket past the dedup horizon: drop its members —
            // the next arrival re-creates the bucket from scratch
            state.remove()
            Iterator.empty
          } else {
            val b0 = state.getOption.getOrElse(
              Bucket(Array.emptyLongArray, Array.emptyLongArray))
            val ids = ArrayBuffer.empty[Long] ++= b0.ids
            val sigs = ArrayBuffer.empty[Long] ++= b0.sigs
            val out = ArrayBuffer.empty[DupPair]
            rows.foreach { r =>
              if (!ids.contains(r.docId)) {
                var m = 0
                while (m < ids.length) {
                  // matching-permutation estimate against the member's
                  // flattened signature slice — identical arithmetic to
                  // est() on the per-member Seq
                  var matches = 0
                  var i = 0
                  val off = m * NUM_PERM
                  while (i < NUM_PERM) {
                    if (sigs(off + i) == r.sig(i)) matches += 1
                    i += 1
                  }
                  val e = (matches * 1000000L / NUM_PERM) / 1e6
                  if (e >= 0.5)
                    out += DupPair(math.min(ids(m), r.docId),
                      math.max(ids(m), r.docId), e)
                  m += 1
                }
                ids += r.docId
                sigs ++= r.sig
              }
            }
            state.update(Bucket(ids.toArray, sigs.toArray))
            // ProcessingTimeTimeout is per-key and must be re-armed on
            // every invocation; with no TTL the key simply never fires
            if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }
}
