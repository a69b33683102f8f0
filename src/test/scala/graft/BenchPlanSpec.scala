package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench measurement-plan drift guards (no SparkSession needed).
  *
  * The solo set is a list of NAMES maintained by hand across rounds;
  * `familyPlan` partitions the registry against it. Two silent drift
  * modes motivated pinning this: a renamed (or deleted) query leaves
  * a stale solo name that matches nothing — the entry quietly falls
  * back into its prefix family and loses the attribution the set
  * exists for; and a plan bug could measure an entry twice or not at
  * all and the one-line JSON would not say so. */
class BenchPlanSpec extends AnyFunSuite {

  test("every solo name is a registered query (no stale attribution entries)") {
    val stale = Bench.solo -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"solo names not in the registry: $stale")
  }

  test("familyPlan covers every registered query exactly once") {
    val planned = Bench.familyPlan().flatMap(_._2)
    assert(planned.size == planned.distinct.size,
      s"duplicated: ${planned.diff(planned.distinct)}")
    assert(planned.toSet == SparkEntry.queries.keySet,
      s"missing: ${SparkEntry.queries.keySet -- planned.toSet}; " +
        s"phantom: ${planned.toSet -- SparkEntry.queries.keySet}")
  }

  test("solo groups carry mid sentinels, prefix families do not") {
    Bench.familyPlan().foreach { case (name, members, mid) =>
      if (name.startsWith("solo_")) {
        assert(mid, s"$name lost its mid sentinels")
        assert(members.forall(Bench.solo), s"$name holds a non-solo entry")
      } else
        assert(members.forall(m => !Bench.solo(m)),
          s"$name holds solo entries: ${members.filter(Bench.solo)}")
    }
  }
}
