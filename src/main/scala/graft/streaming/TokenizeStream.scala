package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming BPE tokenization: batch tok4's per-document encode run on
  * ingest — the leg every live training-data pipeline needs between
  * arrival and packing (token budgets, mixture weights, and sequence
  * packing are all denominated in tokens, so the count has to exist
  * the moment a document lands).
  *
  * Deployment shape (the production tokenizer reality): the merge
  * sequence is trained OFFLINE over a corpus snapshot — tok3's loop,
  * published through TextOps' model registry — and shipped to
  * executors inside the plan's serialized closure as plain string
  * pairs (BPE_MERGES entries; a production 50k-merge table is still
  * only ~MBs, the same closure-held-model argument as
  * [[SemanticDedupStream]]'s centroid matrix). Online, each arrival is
  * ONE stateless narrow map: split to words, fold the merges over each
  * word's characters ([[TextOps.bpeEncodeCols]] — the IDENTICAL greedy
  * non-overlapping fold the trainer applied, so counts are bit-equal
  * to batch tok4's vocab-join for every in-vocabulary word, and
  * out-of-vocabulary words — a live stream's reality that the batch
  * join form cannot see — still encode instead of dropping), then the
  * per-document count/fold aggregates over the in-row word array.
  * Zero shuffle, zero state: the plan is scan → project → sink, so
  * throughput is scan-bound and scales with input partitions alone
  * (StreamingTokenizeSpec pins the no-Exchange plan and streaming ≡
  * batch tok4 row equality on the corpus the model was trained on).
  */
object TokenizeStream {

  /** Encode documents (`doc_id`, `text`) under an offline-trained merge
    * sequence. Pure stateless projection: works identically on a
    * streaming or batch DataFrame — the spec's equality assertion IS
    * this polymorphism. */
  def encoded(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id") +: TextOps.bpeEncodeCols(merges): _*)
}
