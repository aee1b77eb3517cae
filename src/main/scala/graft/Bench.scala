package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
object Bench {

  /** Consume a query result in a way that forces EVERY output column to
    * be computed: hash the full row struct and sum the hashes. A bare
    * `count()` lets Catalyst prune unreferenced columns, so
    * projection-only queries (p1, f11, f12, ta3, …) would be timed with
    * the very expressions they exercise optimized away. bit_xor (not
    * sum) folds the hashes: ANSI mode makes a sum of 64-bit hashes
    * overflow. */
  private def consume(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(bit_xor(col("h"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // scan-partition sizing for THIS environment (the knob SCALE.md's
      // cluster template sets to 128-256m for TB inputs): the test SFs
      // are ~10 MB/table, so the defaults (128m + 4m open cost) pack
      // every file into 1-2 scan tasks and serialize the scan stage of
      // every query regardless of core count. Sized so a 32-file sf1
      // table fans out to ~one task per core. (Single-file driver SFs
      // are 1 row group and cannot fan out either way.)
      .config("spark.sql.files.maxPartitionBytes", "256k")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/parquet-footer caches so the first timed
    // query doesn't absorb session startup
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("p1_project").foreach(fn => consume(fn(spark, sfDir)))
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_SKIP=q1,q2 excludes queries from a run — used for
    // scale experiments where the declared-quadratic oracle queries
    // (dd4/dd5) would otherwise dominate wall time AND poison every
    // later query's timing through GC pressure (measured at sf1: p2 at
    // 212 s inside a run that dd4 had thrashed vs 7 s standalone).
    // Skipped names are reported in the output line; the driver's
    // default run skips nothing.
    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // SPARK_GRAFT_WARM=0 disables the warm pass (halves wall time);
    // default ON so every artifact carries a JIT-settled column — the
    // r3 "w3 3.2× regression" was pure cold-JIT suite-growth bleed and
    // a warm column in the artifact makes that class of phantom visible
    // without a separate Prof session. The warm pass runs as a SECOND
    // full sweep AFTER every cold measurement: interleaving (cold,
    // warm, cold, …) was measured to pollute the NEXT query's cold
    // time with the warm run's GC/code-cache churn (f-series queries
    // read 3-4× their true cold cost), and it would break
    // comparability with the cold-only r1-r3 artifacts.
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0"
    // The recorded warm number is the MEDIAN of SPARK_GRAFT_WARM_REPS
    // back-to-back runs (default 3): single-pass warm sweeps measured
    // ±80% total swing across fresh JVMs on this box (r7's final sf1
    // sweep read warm 434 s ABOVE cold 417 s; dd8/dd10 spiked 2-4×
    // purely by environment pricing) — an artifact that moves that much
    // cannot adjudicate a 2× bar. A median tosses the one GC/pricing
    // outlier while staying a real end-to-end measurement.
    val warmReps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_WARM_REPS", "3").toInt)
    var failed = List.empty[String]
    // The declared-quadratic oracle twins run LAST in each sweep: their
    // cold cost swings 2-3× between runs (sf1: cc1 43-124 s) and the
    // GC/code-cache churn they leave behind inflates whatever runs
    // next — at the end of the sweep there is no next. The artifact
    // tags them ("quadratic") so a machine reader can separate their
    // variance from real regressions in the scale-path queries.
    // rj1 is in the set by the same logic: its bucketed equi-join is
    // the right GENERAL interval join (output = the pair set, payload
    // columns from both sides), but the pair stream is quadratic in
    // time DENSITY (sf10: 54 s vs rj2's 6.5 s) — the routing rule is
    // pairs → rj1, pure aggregates → rj2 (the rank-lookup form,
    // linear at any density; plan shape pinned in PlanSpec).
    val quadratic = Set("cc1_dedup_clusters", "dd4_ngram_jaccard",
      "dd5_embedding_cosine", "rj1_range_join")
    // Alphabetical order also fixes WHERE model training lands: the
    // registries (TextOps BPE, Similarity IVF/PQ) train at the first
    // consumer of each model and serve everyone after, so in a sweep
    // dd7 pays the IVF Lloyd loop, ir3 the unit-grid PQ books, pq1 the
    // raw-grid books, tok3 the BPE merges — deterministically, so
    // cross-round comparisons of any single query compare like with
    // like. Warm reps reuse what the cold pass registered, which is
    // the serving path the registry exists to measure.
    val active = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (quadratic(name), name) }
      .filterNot { case (name, _) => skip(name) }
    def sweep(reps: Int)(record: (String, Boolean) => Unit): Seq[(String, Double, Seq[Double])] =
      active.map { case (name, fn) =>
        // settle between queries (NOT counted in the query's time): a
        // large join's garbage + deoptimization churn otherwise bleeds
        // into the NEXT query's measurement — at sf1 a post-dd3
        // p2_filter_nonzero measured 280 s cold vs 6 s after a
        // GC+settle, a 40x phantom. Standard harness hygiene (JMH does
        // the same between iterations).
        System.gc()
        Thread.sleep(200)
        // reps run back-to-back with no settle between them: the first
        // already runs settled, and the median discards a rep that a
        // GC cycle or pricing transient hit
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { consume(fn(spark, sfDir)); true }
            catch {
              case e: Throwable =>
                // record the failure loudly — a swallowed exception would
                // read as a near-zero (improved) time in the bench line
                System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
                false
            }
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }
        // any failed rep fails the query: a partial median would hide
        // a flaky operator behind its surviving runs
        val ok = times.size == reps
        val dt = if (ok) times.sorted.apply(reps / 2) else -1.0
        // drop model tables the broadcast guard cached for this query
        // (outside the timed window, like the gc settle above)
        graft.ops.Model.release()
        record(name, ok)
        // failed queries report -1 and are excluded from the total, so
        // the aggregate never mixes real runtimes with time-to-failure.
        // The raw rep times ride along: every round spends judge time
        // re-adjudicating in-sweep movers against the box's burst
        // pricing by hand — the individual reps make band-vs-regression
        // readable off the artifact itself (advice r12 #6).
        (name, dt, times)
      }
    // cold stays single-shot by definition (a second run isn't cold) and
    // for comparability with the r1-r7 artifacts
    val results = sweep(1)((name, ok) => if (!ok) failed ::= name)
    // warm failures get their own artifact field: a query that passes
    // cold but fails warm (state left behind by the first run) would
    // otherwise only show as a -1 in the warm column, invisible to a
    // machine reader scanning `errors`
    var warmFailed = List.empty[String]
    val warmResults =
      if (warm) {
        // INTER-SWEEP settle: the cold sweep ends on the quadratic trio
        // (run last by design), whose GC/deoptimization churn otherwise
        // bleeds into the first warm measurements — the r5 artifact's
        // warm>cold inversions (a1 1.2→4.3, dd8 1.5→4.3, w3 3.4→4.4 s)
        // cluster at exactly that boundary. The per-query 200 ms settle
        // is not enough after a 27 s self-join; give the JVM a few full
        // GC cycles and let the JIT re-stabilize before timing again.
        for (_ <- 1 to 3) { System.gc(); Thread.sleep(1000) }
        sweep(warmReps)((name, ok) => if (!ok) warmFailed ::= name)
      } else active.map { case (n, _) => (n, -1.0, Seq.empty[Double]) }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val warms = warmResults.map { case (k, w, _) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val warmDetail = warmResults.map { case (k, _, reps) =>
      s"\"" + k + "\":" + reps.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val warmTotal = warmResults.filter(_._2 >= 0).map(_._2).sum
    val errs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmErrs = warmFailed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skipped = skip.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val quads = quadratic.toSeq.sorted.filterNot(skip)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warm":$warms,"warm_reps_detail":$warmDetail,"warm_total":$warmTotal,"warm_reps":${if (warm) warmReps else 0},"errors":$errs,"warm_errors":$warmErrs,"skipped":$skipped,"quadratic":$quads,"sf":"$sfDir"}"""
    // The full per-query line is ~7 KB; the driver's stdout capture keeps
    // only the LAST ~2 KB, so printing it would leave a head-truncated,
    // unparseable fragment in BENCH_r{N}.json (r6's "parsed": null). Two
    // channels instead:
    //  - stdout: a COMPACT totals line (~300 chars — always inside the
    //    capture window, so the driver artifact parses) pointing at the
    //    detail file for per-query numbers;
    //  - SPARK_GRAFT_BENCH_OUT (default BENCH_LAST.json, committed each
    //    round): the full line, machine-readable end to end.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out: ${e.getMessage}") }
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"warm_total":$warmTotal,"warm_reps":${if (warm) warmReps else 0},"errors":$errs,"warm_errors":$warmErrs,"skipped":$skipped,"quadratic":$quads,"sf":"$sfDir","detail":"$out"}"""
    println(compact)
    spark.stop()
  }
}
