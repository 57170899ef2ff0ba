package graft

import org.scalatest.funsuite.AnyFunSuite

/** The canary contract, machine-checked (the r6 verdict's "sabotage vs
  * slowed host" separation, without an 8-minute bench run per case): the
  * regression gate must FLAG a uniform config/code regression (queries
  * slow, canary flat) and must NOT flag a uniformly slow host (queries
  * slow, canary slow alongside). Pure math over [[BenchGate]] — the same
  * functions Bench.main calls.
  */
class BenchGateSpec extends AnyFunSuite {

  private val baseline: Map[String, Double] =
    (1 to 20).map(i => s"q$i" -> (0.2 + 0.1 * i)).toMap
  private val canaryBase = 0.5

  test("uniform 2x sabotage with a flat canary is flagged as regressions") {
    val sabotaged = baseline.view.mapValues(_ * 2.0).toMap
    val hf = BenchGate.hostFactor(canaryBase, Some(canaryBase),
      BenchGate.ratioMedian(sabotaged, baseline))
    assert(hf === 1.0) // canary flat → the host is NOT slow
    val regs = BenchGate.regressions(sabotaged, baseline, hf)
    // 2x > 1.5x and every query is >0.3s over its scaled baseline except
    // the smallest ones below the absolute floor
    assert(regs.nonEmpty)
    assert(regs.map(_._1).contains("q20"))
    // the pre-canary gate (median ratio as host factor) would have hidden
    // exactly this: median of a uniform 2x is 2x → zero regressions
    val medianOnly = BenchGate.ratioMedian(sabotaged, baseline)
    assert(BenchGate.regressions(sabotaged, baseline, medianOnly).isEmpty,
      "documents the blind spot the canary closes")
  }

  test("uniformly slow host (canary slowed alongside) is not flagged") {
    val slowHost = baseline.view.mapValues(_ * 2.0).toMap
    val hf = BenchGate.hostFactor(canaryBase * 2.0, Some(canaryBase),
      BenchGate.ratioMedian(slowHost, baseline))
    assert(hf === 2.0)
    assert(BenchGate.regressions(slowHost, baseline, hf).isEmpty)
  }

  test("a single real regression is flagged even on a slow host") {
    val run = baseline.view.mapValues(_ * 1.4).toMap + ("q10" -> 10.0)
    val hf = BenchGate.hostFactor(canaryBase * 1.4, Some(canaryBase),
      BenchGate.ratioMedian(run, baseline))
    val regs = BenchGate.regressions(run, baseline, hf)
    assert(regs.map(_._1) === Seq("q10"))
  }

  test("fast host clamps to 1 and never shrinks thresholds") {
    assert(BenchGate.hostFactor(canaryBase / 2, Some(canaryBase), 3.0) === 1.0)
    // at hostFactor 1, a 1.4x run stays under the 1.5x gate
    val run = baseline.view.mapValues(_ * 1.4).toMap
    assert(BenchGate.regressions(run, baseline, 1.0).isEmpty)
  }

  test("no canary baseline falls back to the median ratio") {
    val run = baseline.view.mapValues(_ * 1.7).toMap
    val med = BenchGate.ratioMedian(run, baseline)
    assert(math.abs(med - 1.7) < 1e-9)
    assert(BenchGate.hostFactor(0.5, None, med) === med)
  }

  test("failure sentinels are excluded from ratios and regressions") {
    val run = baseline + ("q5" -> 9999.0)
    assert(BenchGate.ratioMedian(run, baseline) === 1.0)
    assert(BenchGate.regressions(run, baseline, 1.0).isEmpty)
  }
}
