package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Schemas, StockData}

/** Property test (SURVEY §5.2): `from_json ∘ to_json = id` over
  * generated StockData — the wire contract of topics S1/S3. */
class SerdeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val genStock: Gen[StockData] = for {
    sym <- Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)
    typ <- Gen.oneOf("stock", "index", "etf")
    flag <- Gen.oneOf("real", "filled")
    rc <- Gen.chooseNum(0L, 100L)
    fc <- Gen.chooseNum(0L, 100L)
    vwap <- Gen.chooseNum(-1e6, 1e6)
    size <- Gen.chooseNum(0L, 100000L)
    vol <- Gen.chooseNum(0.0, 1e9)
    yp <- Gen.chooseNum(0.0, 1e4)
    pct <- Gen.chooseNum(-100.0, 100.0)
  } yield StockData(sym, typ, "2024-01-01T00:00:00+00:00", "2024-01-01T00:00:01+00:00",
    "2024-01-01T00:00:00.500000+00:00", "2024-01-01T00:00:00.400000+00:00",
    rc, fc, flag, vwap, size, vol, yp, pct)

  test("to_json then from_json reproduces every field exactly") {
    val prop = Prop.forAll(Gen.listOfN(20, genStock)) { xs =>
      xs.isEmpty || {
        val df = xs.toDF()
        val json = Schemas.toWireJson(df)
        val back = json.select(Schemas.parseStockJson(col("value")).as("v")).select("v.*")
          .as[StockData].collect().toList
        back.toSet == xs.toSet
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
