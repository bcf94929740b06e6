package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** SCALE-coverage close gate, asserted in-suite (r12 ADVICE: the
  * standalone `scripts/scale_gate.py` was not invoked by any test, so
  * the ">= 1 s battery query needs a SCALE.md slope row" rule was
  * still remembered, not asserted — this spec makes `sbt test` block
  * a close whose committed bench map has uncovered queries).
  *
  * Mirrors the script exactly: a "row" is a line that LEADS with the
  * backticked `q_name` — a table row or a disposition bullet — so a
  * query merely mentioned in another row's prose does not satisfy the
  * gate (the second r12 ADVICE item). Runs against the COMMITTED
  * repo-root `bench_out.json` (the map of record at close); skipped
  * when no map is committed. Explicit UTF-8 reads (the round-10
  * PlanDump ASCII-default-charset trap).
  */
class ScaleGateSpec extends AnyFunSuite {

  private val Row = """^\s*(?:\||-)\s*`(q_\w+)`""".r
  private val QSec = """"(q_\w+)"\s*:\s*([0-9.eE+-]+)""".r

  test("every committed-bench >=1s battery query has a row-shaped SCALE.md entry") {
    val bench = Paths.get("bench_out.json")
    val scale = Paths.get("SCALE.md")
    assume(Files.exists(bench) && Files.exists(scale),
      "no committed bench map / SCALE.md at repo root")
    val benchTxt =
      new String(Files.readAllBytes(bench), StandardCharsets.UTF_8)
    val slow = QSec.findAllMatchIn(benchTxt)
      .collect { case m if m.group(2).toDouble >= 1.0 => m.group(1) }
      .toSet
    val scaleTxt =
      new String(Files.readAllBytes(scale), StandardCharsets.UTF_8)
    val rows = scaleTxt.linesIterator
      .flatMap(l => Row.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    val missing = (slow -- rows).toSeq.sorted
    assert(missing.isEmpty,
      s"battery queries >= 1 s without a row-shaped SCALE.md row " +
        s"(add a slope row or disposition): ${missing.mkString(", ")}")
  }
}
