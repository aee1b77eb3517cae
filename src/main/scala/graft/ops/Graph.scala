package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph operators for dedup pipelines. Near-dup detection (dd2/dd4)
  * emits PAIRS; an actual dedup pass needs CLUSTERS — the transitive
  * closure of the pair relation — so that `keep = (doc_id == rep_id)`
  * deletes every duplicate exactly once even when A~B, B~C but A!~C.
  *
  * Connected components run as alternating large-star / small-star
  * rounds (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SOCC 2014) — the standard shuffle-based CC algorithm:
  * converges in O(log^2 n) rounds on any graph (2-3 rounds on the
  * near-clique components dedup produces), each round is two keyed
  * shuffles over the EDGE list only (never the corpus), and the driver
  * sees one 16-byte checksum per round — model state, not data.
  *
  * Neighborhood minima are a groupBy(u).min + equi-join back, NOT a
  * `Window.partitionBy(u)` min: a window puts a node's ENTIRE
  * neighborhood in one task, and one viral boilerplate document with
  * millions of near-dup edges would serialize a round behind a single
  * straggler (AQE skew-split does not apply to Window). The groupBy
  * computes the min with map-side partial aggregation (the hub's
  * million edges partial-combine before the shuffle), and the join
  * back is a plain equi-join — the operator class AQE's skew-join
  * split DOES handle (the Kiveris paper's own implementation note).
  */
object Graph {

  /** distinct (bigger, smaller) orientation with self-loops dropped */
  private def canon(e: DataFrame): DataFrame =
    e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()

  /** both orientations of every edge in ONE pass: a
    * `e.union(e.select(v, u))` re-plans `e` as two subtrees (and their
    * exchanges don't reuse when column pruning differs between the
    * copies); exploding a 2-array of structs emits both rows from a
    * single scan (optimization r13 — shuffle-count audit of the CC
    * rounds). */
  private def bothWays(e: DataFrame, a: String, b: String): DataFrame =
    e.select(explode(array(
        struct(col(a).as("u"), col(b).as("v")),
        struct(col(b).as("u"), col(a).as("v")))).as("s"))
      .select(col("s.u").as("u"), col("s.v").as("v"))

  /** per-node neighborhood minimum as partial-agg + join-back — the
    * skew-safe form (see object scaladoc); `private[graft]` so
    * GraphSpec can plan-assert the hub case on a single round */
  private def withNbrMin(e: DataFrame): DataFrame =
    e.join(e.groupBy(col("u")).agg(min(col("v")).as("m")), "u")

  /** large-star: every node links its LARGER neighbors to its
    * neighborhood minimum (cuts long chains in half each round).
    *
    * The output is BAG-semantics (no trailing distinct — optimization
    * r13): every consumer is duplicate-insensitive ([[smallStar]]'s
    * neighborhood MIN, whose join-back dups wash out in its final
    * distinct), rows never grow (exactly one of an edge's two
    * orientations passes `v > u`, so |output| ≤ |input| with or
    * without the dedup), and dropping the distinct removes one full
    * (u,v) shuffle+aggregate from every CC round. Rows are always
    * strictly `u > v` — canonical orientation by construction
    * (m ≤ node < v). */
  private[graft] def largeStar(e: DataFrame): DataFrame =
    withNbrMin(bothWays(e, "u", "v"))
      .withColumn("m", least(col("m"), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))

  /** small-star: every node links its smaller neighbors (and itself) to
    * its smallest neighbor (flattens local trees into stars).
    *
    * PRECONDITION (optimization r13): input must be canonically
    * oriented (`u > v`, no self-loops) — true of [[largeStar]]'s output
    * by construction and of [[connectedComponents]]' canon'd seed. The
    * previous `canon(e)` here re-sorted and re-deduped an
    * already-canonical edge list: one redundant full shuffle per round.
    * Duplicate input rows are fine (min is dup-insensitive; the final
    * distinct dedupes the join-back). The two output orientations come
    * from one [[bothWays]]-style explode rather than a union that
    * would re-plan the nbr-min JOIN twice. */
  private[graft] def smallStar(e: DataFrame): DataFrame =
    withNbrMin(e)
      .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u"), col("m").as("v")))).as("s"))
      .select(col("s.u").as("u"), col("s.v").as("v"))
      .filter(col("u") =!= col("v")).distinct()

  /** order-independent edge-set fingerprint: one row to the driver */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Connected components of an undirected edge list (columns `u`, `v`,
    * any integral type). Returns (u, rep) for every non-root node —
    * callers map absent nodes (singletons and roots) to themselves.
    *
    * Each round LOCAL-CHECKPOINTS its result: the star steps reference
    * the previous edge set twice (symmetrize = union of e and its
    * swap), so a lineage-preserving persist() would double the LOGICAL
    * plan per round — by round ~20 merely stringifying the plan for
    * the SQL-execution-start event is intractable. localCheckpoint
    * replaces the plan with the materialized partitions, keeping every
    * round's plan O(1). (On a cluster an iterative job would
    * reliable-checkpoint every few rounds instead, for the same
    * reason plus executor-loss recovery.) Convergence = the canonical
    * edge set's (count, xor-of-hashes) fingerprint repeating. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // lazy checkpoints: the checksum is the one action per round and
    // triggers the materialization, so each round costs a single job
    var e = canon(edges).localCheckpoint(eager = false)
    var fp = checksum(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 25) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val fp2 = checksum(next)
      converged = fp2 == fp
      e.unpersist()
      e = next; fp = fp2; rounds += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $rounds rounds")
    // at the fixpoint the edge list IS a star forest (u -> component
    // min); the groupBy is a no-op safety net for determinism
    e.groupBy(col("u")).agg(min(col("v")).as("rep"))
  }

  /** pair list → full-corpus cluster assignment: every document gets a
    * cluster representative (the component's smallest doc_id;
    * singletons represent themselves) plus its cluster size. The
    * cluster-size join shuffles on rep_id — clusters number ~N so
    * neither side broadcasts; at 100 TB this is one bounded shuffle of
    * (doc_id, rep_id) pairs, dwarfed by the pair-generation step it
    * follows. */
  private def clusterize(spark: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    val reps = connectedComponents(pairs).withColumnRenamed("u", "doc_id")
    val asg = Tables.documents(spark, dir).select(col("doc_id"))
      .join(reps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep_id"))
    val cs = asg.groupBy(col("rep_id")).agg(count(lit(1)).as("cluster_size"))
    asg.join(cs, "rep_id")
      .select(col("doc_id"), col("rep_id"), col("cluster_size"))
  }

  /** CC1 — dedup clustering over the oracle-checked dd4 exact-Jaccard
    * pairs: DuckDB can recompute the identical pair set, so the whole
    * clustering is hash-verified. Inherits dd4's O(pairs) oracle-path
    * cost at scale by construction — cc2 is the production pairing. */
  def cc1DedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterize(spark, dir, Dedup.dd4NgramJaccard(spark, dir)
      .select(col("da").as("u"), col("db").as("v")))

  /** CC2 — the PRODUCTION dedup pipeline end to end: banded-LSH
    * candidate pairs (dd2, the scale path — equi-join on band keys,
    * never O(N²)) → star-contraction clustering → per-document keep
    * decision. Since round 3 dd2's minhash arithmetic is engine-neutral
    * ([[graft.functions.RkLsh]]), so the whole pipeline is DuckDB-hash-
    * checked: the oracle recomputes the identical pair set and closes
    * it with a recursive CTE. GraphSpec additionally pins closure
    * consistency, and dd2's spec pins recall against exact Jaccard. */
  def cc2DedupClustersLsh(spark: SparkSession, dir: String): DataFrame =
    clusterize(spark, dir, Dedup.dd2MinHashLsh(spark, dir)
      .select(col("da").as("u"), col("db").as("v")))

  /** transitive closure over a pair-CTE block ending in `selName(da,
    * db, …)`: DuckDB's recursive CTE dedups the frontier, so the
    * closure terminates on any graph. Shared by cc1 (dd4's exact pairs)
    * and cc2 (dd2's LSH pairs) — each clustering oracle closes over the
    * EXACT pair set its Spark twin consumes. */
  private def closureOracle(pairCtes: String, selName: String): String =
    s"""WITH RECURSIVE $pairCtes,
       |e AS (SELECT da AS u, db AS v FROM $selName
       |      UNION SELECT db AS u, da AS v FROM $selName),
       |reach(u, v) AS (
       |  SELECT u, v FROM e
       |  UNION
       |  SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
       |rep AS (SELECT u AS doc_id, least(u, min(v)) AS rep_id
       |        FROM reach GROUP BY u),
       |asg AS (SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id
       |        FROM documents d LEFT JOIN rep r ON d.doc_id = r.doc_id),
       |cs AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM asg GROUP BY 1)
       |SELECT a.doc_id, a.rep_id, c.cluster_size
       |FROM asg a JOIN cs c ON a.rep_id = c.rep_id""".stripMargin

  private val cc1Oracle = closureOracle(Dedup.dd4PairCtes, "sel")
  private val cc2Oracle = closureOracle(Dedup.dd2PairCtes, "sel2")

  val queries: Seq[Q] = Seq(
    Q("cc1_dedup_clusters", cc1DedupClusters, Some(cc1Oracle)),
    Q("cc2_dedup_clusters_lsh", cc2DedupClustersLsh, Some(cc2Oracle)))
}
