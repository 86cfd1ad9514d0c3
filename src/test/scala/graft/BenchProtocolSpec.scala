package graft

import org.scalatest.funsuite.AnyFunSuite

/** The parent↔child bench protocol: both sides live in Bench.scala, so a
  * drifting line format silently drops child results (the parent then
  * records "no result line from grouped child"). These tests pin the
  * grammar, including the round-12 budget-skip report and the per-name
  * repeat/warmup tiers the children resolve themselves. No SparkSession. */
class BenchProtocolSpec extends AnyFunSuite {

  test("parses a normal child report with runs vector") {
    val Some((name, r)) = Bench2Protocol.parse(
      "SCENARIO_RESULT parity_pack_large 1.196928179 2048 0.41 23.8,8.7,1.2")
    assert(name == "parity_pack_large")
    assert(r.sec == 1.196928179 && r.rssMb == 2048L && r.floor == 0.41)
    assert(r.runs == Seq(23.8, 8.7, 1.2) && r.err.isEmpty)
  }

  test("parses an error report (message preserved, runs kept)") {
    val Some((name, r)) = Bench2Protocol.parse(
      "SCENARIO_RESULT scale_kmeans -1.0 -1 -1.0 2.1 ERR IllegalStateException: boom")
    assert(name == "scale_kmeans")
    assert(r.sec == -1.0 && r.runs == Seq(2.1))
    assert(r.err.contains("IllegalStateException: boom"))
  }

  test("parses a budget-skip report (round 12: '-' runs placeholder)") {
    val Some((name, r)) = Bench2Protocol.parse(
      "SCENARIO_RESULT parity_pack_very_large -1.0 -1 -1.0 - ERR budget-skipped (need ~29 s, 4 s left)")
    assert(name == "parity_pack_very_large")
    assert(r.sec == -1.0 && r.runs.isEmpty)
    assert(r.err.exists(_.startsWith("budget-skipped")))
  }

  test("rejects malformed lines instead of mis-parsing") {
    assert(Bench2Protocol.parse("SCENARIO_RESULT onlyname 1.0").isEmpty)
    assert(Bench2Protocol.parse("LOG something else entirely").isEmpty)
    assert(Bench2Protocol.parse("SCENARIO_RESULT n notanumber x y z").isEmpty)
  }

  test("repeat tiers: giants best-of-3, GC-band best-of-2, default base") {
    assert(Bench.repeatFor("parity_pack_parent_dominant_2k", 1) == 3)
    assert(Bench.repeatFor("parity_pack_streaming_32", 1) == 2)
    assert(Bench.repeatFor("q_drop_repeated_spans", 1) == 3)
    assert(Bench.repeatFor("q_pivot", 1) == 1)
    // the full profile's base 3 is never reduced by a tier
    assert(Bench.repeatFor("parity_pack_streaming_32", 3) == 3)
  }

  test("parity carve-out: valid names, one per dataset family, no giants") {
    val byName = Bench.parityScenarios.map(s => s._1 -> s._2).toMap
    // every carve-out name must be a real parity scenario — a renamed
    // preset must fail here, not silently record 'no result line'
    Bench.parityCarveOutList.foreach(n =>
      assert(byName.contains(n), s"carve-out name '$n' is not a parity scenario"))
    // the slice spans the gate datasets (streaming_32 deliberately
    // shares the "large" build with pack_large — one build, two shapes)
    val ds = Bench.parityCarveOutList.map(byName).toSet
    assert(ds == Set("large", "parent_dom", "skewed", "very_large"),
      s"unexpected dataset coverage: $ds")
    // ...and the gate shapes are present
    assert(Bench.parityCarveOutList.contains("parity_pack_large"))
    assert(Bench.parityCarveOutList.contains("parity_pack_very_large"))
    // the _2k giants' warmup+best-of-3 protocol can't fit a slice that
    // must always complete
    assert(!Bench.parityCarveOutList.exists(_.contains("_2k")))
  }

  test("parity rotation (round 14): real non-carved presets, no giants, " +
    "dataset-contiguous carve order with gates first") {
    val byName = Bench.parityScenarios.map(s => s._1 -> s._2).toMap
    // rotation names must be real parity scenarios that are NOT already
    // carved (rotating a carved name would measure nothing new)
    Bench.parityRotationDefault.foreach { n =>
      assert(byName.contains(n), s"rotation name '$n' is not a parity scenario")
      assert(!Bench.parityCarveOutList.contains(n),
        s"rotation name '$n' is already in the carve-out")
      assert(!n.contains("_2k"), s"giant '$n' must not rotate into the slice")
    }
    val ordered = Bench.orderCarveOut(
      (Bench.parityCarveOutList ++ Bench.parityRotationDefault).distinct)
    // dataset-contiguous: each dataset key appears as ONE run of
    // consecutive entries (the child pays one build per dataset)
    val keys = ordered.map(byName)
    val runs = keys.foldLeft(List.empty[String]) {
      (acc, k) => if (acc.headOption.contains(k)) acc else k :: acc
    }.reverse
    assert(runs == runs.distinct, s"dataset keys interleave: $keys")
    // the 2x-gate preset leads; the no-published-reference preset is the
    // one a hot-box budget-skip should land on
    assert(ordered.head == "parity_pack_large")
    assert(ordered.last == "parity_pack_very_large")
  }

  test("warmup tiers: JIT q_ entries get two, giants keep base (round 12: " +
    "dropping their warmup measured JVM ramp, 135 s for a 10 s preset)") {
    assert(Bench.warmupsFor("q_drop_repeated_spans", 1) == 2)
    assert(Bench.warmupsFor("parity_pack_parent_dominant_2k", 1) == 1)
    assert(Bench.warmupsFor("parity_pack_large", 1) == 1)
    assert(Bench.warmupsFor("parity_pack_parent_dominant_2k", 2) == 2)
  }
}

/** Alias kept tiny so the spec reads clean. */
private object Bench2Protocol {
  def parse(line: String): Option[(String, BenchScenario.ForkResult)] =
    BenchScenario.parseScenarioLine(line)
}
