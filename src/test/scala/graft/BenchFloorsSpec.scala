package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's floor parse — the silent failure that disabled the
  * entire rescue machinery for rounds r18-r19: BASELINE.md's multibyte
  * prose + a LANG=C JVM default charset made Source.fromFile throw,
  * the broad catch returned an empty map, and both rescue gates ran
  * disabled with no visible error. sbt tests fork with the same empty
  * locale as the bench run, so a charset regression here reproduces
  * the production failure exactly. */
class BenchFloorsSpec extends AnyFunSuite {

  test("BASELINE.md floor table parses non-empty under the forked JVM's locale") {
    val floors = Bench.parseFloors("BASELINE.md")
    assert(floors.size > 100,
      s"parsed only ${floors.size} floors — rescue gates would run disabled " +
        "(charset regression or a gutted BASELINE table)")
    // the floors are wall seconds: all positive, none absurd
    assert(floors.values.forall(v => v > 0 && v < 600))
    // a known always-present line resolves
    assert(floors.contains("q1_agg"))
  }

  test("parseFloors on a missing file degrades to empty, not a throw") {
    assert(Bench.parseFloors("/nonexistent/BASELINE.md").isEmpty)
  }
}
