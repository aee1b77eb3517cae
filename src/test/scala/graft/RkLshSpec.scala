package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RkLsh

/** Property checks for the engine-neutral hashing layer's stated
  * invariants — the overflow audits in RkLsh's scaladoc, promoted from
  * comments to executed properties (BigInt replay proves the Long
  * arithmetic never wrapped). Every oracle in the repo depends on
  * these: a single silent Long wrap on either engine breaks the
  * cross-engine hash compare for dd2/dd3/cc2/dc2/apx/sim and the
  * streaming dedup index.
  */
class RkLshSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  private val in40 = Gen.oneOf(
    Gen.chooseNum(0L, RkLsh.M40 - 1),
    Gen.oneOf(0L, 1L, RkLsh.M40 - 1)) // always mix in the edges

  test("affine constants stay in their declared ranges") {
    assert(RkLsh.A.length == RkLsh.NUM && RkLsh.B.length == RkLsh.NUM)
    RkLsh.A.foreach(a => assert(a >= 1 && a < (1L << 22) && a % 2 == 1, s"a=$a"))
    RkLsh.B.foreach(b => assert(b >= 0 && b < RkLsh.M40, s"b=$b"))
  }

  test("perm: no Long overflow on the 2^40 domain, output in [0, P)") {
    check(Prop.forAll(in40, Gen.chooseNum(0, RkLsh.NUM - 1)) { (x: Long, j: Int) =>
      val expected = ((BigInt(RkLsh.A(j)) * x + RkLsh.B(j)) mod BigInt(RkLsh.P)).toLong
      val got = RkLsh.perm(j, x)
      got == expected && got >= 0 && got < RkLsh.P
    })
  }

  test("mix2: no overflow through both rounds, even at domain edges") {
    val chains = Seq((32, 34), (33, 35), (RkLsh.HLL_A, RkLsh.HLL_B),
      (RkLsh.RADE_A, RkLsh.RADE_B))
    for ((ia, ib) <- chains) {
      check(Prop.forAll(in40) { (x: Long) =>
        val got = RkLsh.mix2(ia, ib, x)
        val s1 = (BigInt(RkLsh.A(ia)) * (x & (RkLsh.M40 - 1)) + RkLsh.B(ia)) mod BigInt(RkLsh.P)
        val s1x = s1.toLong ^ (s1.toLong >> 20)
        val s2 = (BigInt(RkLsh.A(ib)) * s1x + RkLsh.B(ib)) mod BigInt(RkLsh.P)
        val expected = s2.toLong ^ (s2.toLong >> 20)
        s1x >= 0 && got == expected && got >= 0
      })
    }
  }

  test("band-key fold never wraps, even on an all-maximal signature slice") {
    val worst = Array.fill(4)(RkLsh.P - 1)
    var acc = 0L
    var big = BigInt(0)
    worst.foreach { x =>
      acc = (acc * RkLsh.MUL + x) % RkLsh.M40
      big = (big * RkLsh.MUL + x) mod BigInt(RkLsh.M40)
    }
    assert(acc == big.toLong)
  }
}
