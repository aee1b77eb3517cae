package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MaAggregator, MaBuf, MaIn}

/** Property tests for the partial→final merge protocol
  * (`ma_agg.py:284-300`): associativity + commutativity of merge, zero
  * as identity, and reduce-then-merge ≡ merge-then-reduce — the laws
  * Spark's partial aggregation relies on. */
class MaAggregatorSpec extends AnyFunSuite {
  private val agg = new MaAggregator

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genIn: Gen[MaIn] = for {
    v <- Gen.chooseNum(-1000.0, 1000.0)
    s <- Gen.oneOf(0L, 1L, 2L, 100L)
    f <- Gen.oneOf("real", "filled", "other")
  } yield MaIn(v, s, f)

  private val genBuf: Gen[MaBuf] = for {
    xs <- Gen.listOf(genIn)
  } yield xs.foldLeft(agg.zero)(agg.reduce)

  private def eq(a: MaBuf, b: MaBuf): Boolean =
    math.abs(a.sum_of_value - b.sum_of_value) < 1e-9 &&
      a.count_of_value == b.count_of_value && a.real_count == b.real_count &&
      a.filled_count == b.filled_count && a.n == b.n

  test("merge is associative") {
    check(Prop.forAll(genBuf, genBuf, genBuf) { (a, b, c) =>
      eq(agg.merge(agg.merge(a, b), c), agg.merge(a, agg.merge(b, c)))
    })
  }

  test("merge is commutative") {
    check(Prop.forAll(genBuf, genBuf) { (a, b) => eq(agg.merge(a, b), agg.merge(b, a)) })
  }

  test("zero is the merge identity") {
    check(Prop.forAll(genBuf) { a => eq(agg.merge(a, agg.zero), a) })
  }

  test("reduce distributes over merge (partial-aggregation law)") {
    check(Prop.forAll(Gen.listOf(genIn), Gen.listOf(genIn)) { (xs, ys) =>
      val direct = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
      eq(direct, merged)
    })
  }

  test("finish: safe division yields 0.0 on empty, never NaN/NULL (ma_agg.py:70)") {
    val out = agg.finish(agg.zero)
    assert(out.sma_value == 0.0 && out.sum_of_value == 0.0 && out.count_of_value == 0L)
    // all-zero-volume inputs keep count 0 but tally n/real/filled
    val b = Seq(MaIn(5.0, 0L, "real"), MaIn(7.0, 0L, "filled")).foldLeft(agg.zero)(agg.reduce)
    val o = agg.finish(b)
    assert(o.sma_value == 0.0 && o.n == 2L && o.real_count == 1L && o.filled_count == 1L)
  }
}
