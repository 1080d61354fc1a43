package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-test harness (the scalatest/scalacheck
  * bridge artifact isn't in the offline cache, so we drive Gen directly).
  */
trait PropHelper {
  def forAllN[A](gen: Gen[A], n: Int = 200, seed: Long = 42L)(f: A => Unit): Unit = {
    var s = Seed(seed)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, s).foreach(f)
      s = s.next
      i += 1
    }
  }
}
