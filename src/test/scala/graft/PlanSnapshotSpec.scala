package graft

import graft.tools.PlanFingerprint

/** The plan-fingerprint regression gate (VERDICT r8 next-round #2): every
  * bench headline query's physical-plan SHAPE is pinned in a committed
  * golden file. A bench-time delta on an unchanged fingerprint is host
  * variance by construction; a fingerprint regression (new exchange/sort,
  * lost broadcast or pushdown, any cartesian) fails here in seconds —
  * BEFORE it costs a bench round to notice.
  *
  * On a non-regressive drift (an improvement, or a deliberate reshape)
  * the spec fails with a regenerate prompt rather than silently accepting
  * a new shape: the golden diff is reviewed like code.
  */
class PlanSnapshotSpec extends SparkSpec {

  test("every headline query has a committed golden plan fingerprint") {
    val golden = PlanFingerprint.readGolden()
    val missing = Bench.headline.diff(golden.keySet)
    assert(missing.isEmpty,
      s"no golden fingerprint for: $missing — run " +
        "sbt \"runMain graft.tools.PlanSnapshot\" and commit the diff")
  }

  test("headline physical plans match their golden fingerprints " +
    "(no new exchange/sort, no lost broadcast/pushdown, no cartesian)") {
    val golden = PlanFingerprint.readGolden()
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val problems = Bench.headline.toSeq.sorted.flatMap { name =>
      golden.get(name).toSeq.flatMap { want =>
        val got = PlanFingerprint.fingerprint(byName(name).build(spark, sf))
        val regs = PlanFingerprint.regressions(want, got)
        if (regs.nonEmpty)
          Seq(s"$name REGRESSED: ${regs.mkString("; ")} " +
            s"(golden ${PlanFingerprint.render(want)} vs now ${PlanFingerprint.render(got)})")
        else if (got != want)
          Seq(s"$name drifted (non-regressive): golden " +
            s"${PlanFingerprint.render(want)} vs now ${PlanFingerprint.render(got)} " +
            "— if deliberate, regenerate via sbt \"runMain graft.tools.PlanSnapshot\"")
        else Nil
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
