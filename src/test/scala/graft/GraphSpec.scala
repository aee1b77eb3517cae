package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Graph}

/** Properties of the large-star/small-star connected-components core
  * that the DuckDB oracle can't see: worst-case (chain) convergence,
  * component separation, and consistency between cc1's cluster
  * assignment and the dd4 pair set it closes over. */
class GraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def reps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain of 64 nodes collapses to one component rooted at 0") {
    // a path graph is the adversarial case for label propagation
    // (diameter = n); star-contraction must still converge (O(log^2 n)
    // rounds) and the 25-round guard must not trip
    val m = reps((0L until 63L).map(i => (i, i + 1)))
    assert((1L to 63L).forall(m.get(_).contains(0L)), m)
    assert(!m.contains(0L), "roots are absent from the mapping")
  }

  test("disjoint components keep distinct minima") {
    val m = reps(Seq((10L, 11L), (11L, 12L), (12L, 10L), // triangle
      (20L, 21L), // pair
      (7L, 5L))) // reversed orientation on input
    assert(m == Map(11L -> 10L, 12L -> 10L, 21L -> 20L, 7L -> 5L), m)
  }

  test("empty and self-loop-only edge sets yield no mappings") {
    assert(reps(Seq.empty).isEmpty)
    assert(reps(Seq((4L, 4L))).isEmpty)
  }

  test("hub graph: neighborhood minima avoid per-node Windows (skew-splittable shape)") {
    // one viral near-dup hub — node 0 joined to 1..N — is the
    // degree-skew adversary: a Window.partitionBy(u) min would put the
    // hub's ENTIRE neighborhood in one task, and AQE skew-split does
    // not apply to Window. The groupBy+join form partial-aggregates the
    // min map-side and leaves only equi-joins, the operator class AQE
    // CAN split.
    val n = 100000L
    val hub = spark.range(1, n + 1).selectExpr("id AS u", "CAST(0 AS LONG) AS v")
    for (step <- Seq(Graph.largeStar _, Graph.smallStar _)) {
      val out = step(hub)
      out.collect() // finalize AQE so the executed plan is real
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), "per-node Window min survived:\n" + p)
      assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
        "neighborhood min must partial-aggregate before the shuffle:\n" + p)
    }
    // and the full closure still resolves the hub correctly
    val m = reps((1L to 1000L).map(i => (i, 0L)))
    assert((1L to 1000L).forall(m.get(_).contains(0L)))
  }

  test("cc2 (LSH pairs) assignment is a closure of the dd2 pair set") {
    val asg = Graph.cc2DedupClustersLsh(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup.dd2MinHashLsh(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(asg.size == Tables.documents(spark, sf).count())
    pairs.foreach { case (a, b) =>
      assert(asg(a)._1 == asg(b)._1, s"pair ($a,$b) split across clusters")
    }
    asg.foreach { case (doc, (rep, _)) =>
      assert(rep <= doc && asg(rep)._1 == rep)
    }
  }

  test("cc1 assignment is a closure of the dd4 pair set") {
    val asg = Graph.cc1DedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Dedup.dd4NgramJaccard(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(asg.size == nDocs, "every document gets an assignment")
    // both ends of every near-dup pair share a representative
    pairs.foreach { case (a, b) =>
      assert(asg(a)._1 == asg(b)._1, s"pair ($a,$b) split across clusters")
    }
    // representatives are component minima and represent themselves
    asg.foreach { case (doc, (rep, _)) =>
      assert(rep <= doc)
      assert(asg(rep)._1 == rep, s"rep $rep of $doc is not its own rep")
    }
    // cluster sizes partition the corpus
    assert(asg.collect { case (doc, (rep, n)) if doc == rep => n }.sum == nDocs)
  }
}
