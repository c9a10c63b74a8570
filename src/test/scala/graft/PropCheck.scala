package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal ScalaCheck runner for FunSuite tests (the scalatestplus bridge
  * is not in the offline dependency cache). Deterministic seed.
  */
object PropCheck {
  def check(prop: Prop, minSuccessful: Int = 100): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    if (!res.passed) throw new AssertionError(s"property failed: ${res.status}")
  }
}
