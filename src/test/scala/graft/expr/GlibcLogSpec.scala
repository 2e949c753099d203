package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Pins GlibcLog to glibc's exact `log` bit patterns — including the
  * inputs where glibc MISROUNDS and every JVM log disagrees with it.
  * The hex expectations were captured from DuckDB `ln` (= this
  * container's libm) and cross-checked against 16M inputs at build
  * time; if this suite ever fails, oracle hash parity for every
  * ln-using query (q61, q79, q80, q88) is broken too.
  */
class GlibcLogSpec extends AnyFunSuite {

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("matches glibc where glibc misrounds and Math.log is correctly rounded") {
    // ln(1 + (500-398+0.5)/(398+0.5)) — the BM25 idf input that first
    // exposed the divergence: glibc gives ...276c, Math.log ...276d
    val x1 = 1.0 + (500L - 398L + 0.5) / (398L + 0.5)
    assert(bits(GlibcLog.log(x1)) === bits(java.lang.Double.parseDouble("0x1.d4c8ca6ae276cp-3")))
    assert(bits(Math.log(x1)) !== bits(GlibcLog.log(x1)), "divergent fixture input lost")
    // half-integer family members where glibc is 1 ulp off correct
    val x2 = 38437.5
    assert(bits(GlibcLog.log(x2)) === bits(java.lang.Double.parseDouble("0x1.51d136cc06e70p+3")))
    val x3 = 54731.5
    assert(bits(GlibcLog.log(x3)) === bits(java.lang.Double.parseDouble("0x1.5d20509ddf8bbp+3")))
  }

  test("matches Math.log (both correctly rounded) on plain inputs across the range") {
    // agreement cases: table path, near-1 path, large/small magnitudes
    for (x <- Seq(2.0, Math.E, 10.0, 0.5, 1.0000001, 0.96, 1.05, 1e-300, 1e300, 27939.0 / 500.0))
      assert(bits(GlibcLog.log(x)) === bits(Math.log(x)), s"x=$x")
  }

  test("special cases follow glibc: 0, negatives, infinities, NaN, subnormals, exact 1") {
    assert(GlibcLog.log(1.0) === 0.0 && bits(GlibcLog.log(1.0)) === 0L)
    assert(GlibcLog.log(0.0).isNegInfinity)
    assert(GlibcLog.log(-0.0).isNegInfinity)
    assert(GlibcLog.log(-1.0).isNaN)
    assert(GlibcLog.log(Double.NaN).isNaN)
    assert(GlibcLog.log(Double.PositiveInfinity).isPosInfinity)
    val sub = java.lang.Double.longBitsToDouble(0x0000000000000001L) // min subnormal
    assert(bits(GlibcLog.log(sub)) === bits(Math.log(sub)))
    val sub2 = java.lang.Double.longBitsToDouble(0x000fffffffffffffL) // max subnormal
    assert(bits(GlibcLog.log(sub2)) === bits(Math.log(sub2)))
  }

  test("2212 golden vectors captured from DuckDB ln match bit-for-bit") {
    // src/test/resources/glibc_ln_pins.txt: every integer/half-integer
    // input <= 2e6 where glibc diverges from HotSpot Math.log (the
    // cases a Math.log-based regression would silently break), the
    // q88 idf divergence, and spread/near-1/subnormal samples — all
    // with DuckDB's exact output bits. This makes the external 16M
    // validation regression-testable inside sbt.
    val in = getClass.getResourceAsStream("/glibc_ln_pins.txt")
    assert(in != null, "golden vector resource missing")
    val lines = scala.io.Source.fromInputStream(in).getLines()
      .filterNot(_.startsWith("#")).toSeq
    assert(lines.size >= 2000)
    var checked = 0
    for (line <- lines) {
      val Array(xb, vb) = line.trim.split("\\s+")
      val x = java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(xb, 16))
      val v = java.lang.Long.parseUnsignedLong(vb, 16)
      assert(bits(GlibcLog.log(x)) === v,
        s"x=${java.lang.Double.toHexString(x)}: got ${java.lang.Double.toHexString(GlibcLog.log(x))}")
      checked += 1
    }
    assert(checked === lines.size)
  }

  test("random sweep: never more than 1 ulp from the correctly rounded Math.log") {
    val rnd = new scala.util.Random(7)
    var diverged = 0
    for (_ <- 1 to 200000) {
      val x = java.lang.Math.pow(10.0, rnd.nextDouble() * 40.0 - 20.0)
      val g = GlibcLog.log(x)
      val m = Math.log(x)
      val ulps = Math.abs(bits(g) - bits(m))
      assert(ulps <= 1, s"x=$x glibc=$g math=$m")
      if (ulps == 1) diverged += 1
    }
    // divergence is rare (~3e-5): a sweep this size sees at most a handful
    assert(diverged < 50, s"implausibly many divergences: $diverged")
  }
}
