package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.Bloom64

/** P4 bloom soundness: NO false negatives ever; FPP in the right ballpark. */
class Bloom64Spec extends AnyFunSuite with SeededProps {

  test("no false negatives (P4)") {
    forAll(Gen.listOfN(500, Gen.long), n = 20) { keys =>
      val bf = Bloom64.empty(1000, 1e-3)
      keys.foreach(Bloom64.put(bf, _))
      keys.foreach(k => assert(Bloom64.mightContain(bf, k), s"false negative for $k"))
    }
  }

  test("false positive rate near target") {
    val n = 10000
    val bf = Bloom64.empty(n, 1e-3)
    (0 until n).foreach(i => Bloom64.put(bf, Bloom64.mix(i.toLong)))
    val probes = 100000
    var fp = 0
    (0 until probes).foreach { i =>
      if (Bloom64.mightContain(bf, Bloom64.mix(1000000L + i))) fp += 1
    }
    assert(fp.toDouble / probes < 1e-2, s"fpp too high: $fp/$probes")
  }

  test("merge is union") {
    val a = Bloom64.empty(100, 1e-3); val b = Bloom64.empty(100, 1e-3)
    Bloom64.put(a, 1L); Bloom64.put(b, 2L)
    val m = Bloom64.merge(a.clone().asInstanceOf[Array[Long]], b)
    assert(Bloom64.mightContain(m, 1L) && Bloom64.mightContain(m, 2L))
  }

  test("merge rejects shape mismatch") {
    intercept[IllegalArgumentException] {
      Bloom64.merge(Bloom64.empty(100, 1e-3), Bloom64.empty(100000, 1e-3))
    }
  }

  test("saturation grows with inserts") {
    val bf = Bloom64.empty(100, 0.01)
    val s0 = Bloom64.saturation(bf)
    (0 until 200).foreach(i => Bloom64.put(bf, i.toLong * 7919))
    assert(s0 == 0.0 && Bloom64.saturation(bf) > 0.3)
  }
}
