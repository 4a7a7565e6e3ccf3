package graft

import graft.expressions.Kernels
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the kernels (SURVEY.md §5: property tests
  * alongside the ported golden suite).
  */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under the default 100-case regime. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  private val asciiStr = for {
    n <- Gen.chooseNum(0, 30)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  /** Reference LCS via exhaustive DP (independent implementation). */
  private def lcsNaive(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  test("lcsLen matches an independent DP implementation") {
    check(Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      Kernels.lcsLen(a, b) == lcsNaive(a, b)
    })
  }

  test("lcsLen multi-word path (strings > 64 chars, small alphabet)") {
    // small alphabet maximizes matches → exercises carry/borrow chains
    val longStr = for {
      n <- Gen.chooseNum(0, 300)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    check(Prop.forAll(longStr, longStr) { (a, b) =>
      Kernels.lcsLen(a, b) == lcsNaive(a, b)
    })
  }

  test("indel distance is a metric: identity, symmetry, triangle inequality") {
    check(Prop.forAll(asciiStr, asciiStr, asciiStr) { (a, b, c) =>
      val dab = Kernels.indelDistance(a, b)
      val dba = Kernels.indelDistance(b, a)
      val dac = Kernels.indelDistance(a, c)
      val dcb = Kernels.indelDistance(c, b)
      Kernels.indelDistance(a, a) == 0 && dab == dba && dab <= dac + dcb &&
        dab >= 0 && dab <= a.length + b.length
    })
  }

  test("indel similarity bounded in [0, 100]; 100 iff equal strings") {
    check(Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      val s = Kernels.indelSimilarity(a, b)
      s >= 0.0 && s <= 100.0 && ((s == 100.0) == (a == b || (a + b).isEmpty))
    })
  }

  test("fnv/fingerprint hashes are deterministic and input-sensitive") {
    check(Prop.forAll(asciiStr, asciiStr) { (a, b) =>
      (Kernels.fingerprint64(a) == Kernels.fingerprint64(a)) &&
        (a == b || Kernels.fnv1a64(a + "x") != Kernels.fnv1a64(a))
    })
  }

  test("minhash signature equality rate approximates Jaccard (statistical)") {
    // fixed vocab, deterministic: identical sets -> identical signatures;
    // disjoint sets -> (almost surely) different signatures
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: Seq[String]) = new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    val s1 = Kernels.minHashSignature(arr(Seq("a", "b", "c")), 32)
    val s2 = Kernels.minHashSignature(arr(Seq("c", "b", "a", "a")), 32) // same set
    val s3 = Kernels.minHashSignature(arr(Seq("x", "y", "z")), 32)
    assert(s1.toSeq == s2.toSeq)
    assert(s1.toSeq != s3.toSeq)
    // ~50% overlap sets agree on roughly half the components
    val h1 = Kernels.minHashSignature(arr(Seq("a", "b", "c", "d")), 64)
    val h2 = Kernels.minHashSignature(arr(Seq("c", "d", "e", "f")), 64)
    val agree = h1.zip(h2).count { case (x, y) => x == y }
    assert(agree > 5 && agree < 40, s"agreement $agree implausible for J=1/3")
  }

  test("sampling thresholdHex: bounds, monotone, proportional") {
    import graft.operators.Sampling.thresholdHex
    assert(thresholdHex(0.0) == "0" * 32)
    assert(thresholdHex(1.0) == "f" * 32)
    assert(thresholdHex(0.5) == "8" + "0" * 31)
    check(Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (f1, f2) =>
      val (t1, t2) = (thresholdHex(f1), thresholdHex(f2))
      t1.length == 32 && t1.forall(c => c.isDigit || ('a' to 'f').contains(c)) &&
        ((f1 <= f2) == (t1 <= t2) || f1 == f2 || t1 == t2) // string order = numeric order
    })
  }

  test("float32 L2 kernel: zero iff identical; symmetric; scales correctly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Seq[Float]) = new GenericArrayData(xs.toArray)
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10f, 10f))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val d1 = Kernels.l2(arr(a), arr(b))
      val d2 = Kernels.l2(arr(b), arr(a))
      d1 == d2 && d1 >= 0f && Kernels.l2(arr(a), arr(a)) == 0f &&
        math.abs(Kernels.l2Sq(arr(a), arr(b)) - d1 * d1) <= 1e-2f * (1f + d1 * d1)
    })
  }
  /** Reference model of [[graft.functions.hround]]'s arithmetic. */
  private def hroundRef(x: Double, d: Int): Double = {
    val p = math.pow(10, d)
    val lim = 8.0e17 / p
    if (x.isNaN || math.abs(x) >= lim) x
    else math.floor(x * p + 0.5) / p
  }

  test("hround model: approximation bound, idempotence, guard passthrough") {
    // |x|·10^d stays far below 2^53, so ulp(x·10^d) < 1 and the
    // decimal step dominates every representation effect; magnitudes
    // where ulp(x) exceeds the step (|x|·10^d ≳ 2^53) are the guard
    // region, asserted explicitly below — a property bound of one
    // step is simply FALSE there (doubles are spaced wider than the
    // step), not a bug
    val vals = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6),
      Gen.chooseNum(-1.0, 1.0),
      Gen.chooseNum(-1e4, 1e4))
    val digits = Gen.chooseNum(0, 8)
    check(Prop.forAll(vals, digits) { (x, d) =>
      val r = hroundRef(x, d)
      val step = math.pow(10, -d)
      // never further than one decimal step from the input...
      val close = math.abs(r - x) <= step
      // ...idempotent (re-rounding is a no-op)...
      val idem = hroundRef(r, d) == r ||
        (hroundRef(r, d).isNaN && r.isNaN)
      // ...and within one step of BigDecimal HALF_UP (they may pick
      // different sides only at binary-representation boundaries)
      val bd = BigDecimal(x)
        .setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
      val nearBd = math.abs(r - bd) <= step
      close && idem && nearBd
    })
    // large-magnitude region: the result stays within one ulp-or-step
    // of the input (representation spacing dominates the decimal step)
    for (x <- Seq(-2.9345167489153564e12, 9.87654321e12, 1.234e13);
         d <- Seq(4, 6, 8)) {
      val r = hroundRef(x, d)
      val bound = math.max(math.pow(10, -d), 2 * math.ulp(x))
      assert(math.abs(r - x) <= bound, s"hround($x, $d) = $r drifted")
    }
    // guards: NaN and infinities pass through untouched, huge values
    // skip the scaled path entirely
    assert(hroundRef(Double.NaN, 4).isNaN)
    assert(hroundRef(Double.PositiveInfinity, 4).isPosInfinity)
    assert(hroundRef(Double.NegativeInfinity, 4).isNegInfinity)
    assert(hroundRef(1e15, 6) == 1e15)
  }
}
