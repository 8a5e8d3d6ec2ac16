package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic property-check driver (the scalatest↔scalacheck bridge
  * artifact is not in the offline cache, so Gens are sampled directly with a
  * fixed seed — same coverage, reproducible failures).
  */
trait SeededProps {
  def forAll[A](gen: Gen[A], n: Int = 200, seed: Long = 42L)(f: A => Unit): Unit = {
    var s = Seed(seed)
    var i = 0
    var produced = 0
    while (produced < n && i < n * 20) {
      gen.apply(Gen.Parameters.default, s) match {
        case Some(a) => f(a); produced += 1
        case None => ()
      }
      s = s.next
      i += 1
    }
    assert(produced >= n / 2, s"generator too sparse: $produced/$n")
  }
}
