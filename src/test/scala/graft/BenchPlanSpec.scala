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

  test("artifact-writer class: registered, solo, and matching the BuildCache call sites") {
    // every artifact writer is a registered query AND attribution-class
    val stale = Bench.artifactWriters -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"artifact writers not in the registry: $stale")
    val unattributed = Bench.artifactWriters -- Bench.solo
    assert(unattributed.isEmpty,
      s"artifact writers outside the solo set: $unattributed")
    // the class is exactly the set of entries whose bodies route
    // construction through BuildCache.build — pinned against the
    // SOURCE so a new wrapped entry cannot be silently unreported
    // (key prefixes in the call sites are the entry-key q/a/s stems)
    val stems = Seq(
      "src/main/scala/graft/operators/Relational.scala",
      "src/main/scala/graft/sources/Export.scala",
      "src/main/scala/graft/ann/Ann.scala",
      "src/main/scala/graft/streaming/Streaming.scala").flatMap { f =>
      val text = scala.io.Source.fromFile(f, "UTF-8").mkString
      """BuildCache\.build\(s?"([a-z0-9_]+)[:$]""".r
        .findAllMatchIn(text).map(_.group(1)).toSeq
    }.toSet
    val classStems = Bench.artifactWriters.map { n =>
      // entry key → call-site stem: q31_export_roundtrip wraps per
      // format (s"q31_$format:..."), so its literal prefix is
      // "q31_"; every other site uses the bare stem
      val stem = n.split("_").head
      if (stem == "q31") "q31_" else stem
    }
    assert(stems == classStems,
      s"BuildCache call sites ${stems.toSeq.sorted} != declared class " +
        s"stems ${classStems.toSeq.sorted}")
  }

  /** The law that makes the split SEMANTICS-PRESERVING: with
    * memoization on, a second invocation (probe-only) returns the
    * same rows the full lifecycle returned, and runs no build. One
    * representative per family shape keeps the spec fast; the
    * per-entry determinism of every build is what the oracle gate
    * already checks round-over-round. */
  test("memoized probe == full lifecycle (q92 chain-writer, s79 stream fold)") {
    // uses the SHARED test session (stopping a private getOrCreate
    // session here would kill Spark for every later suite — the
    // r15 274-failure lesson) and restores the disabled default
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    try {
      BuildCache.reset()
      BuildCache.enable()
      Seq("q92_checkpointed_travel", "s79_stream_pseudonymize").foreach { q =>
        val keys0 = BuildCache.builtKeys
        val full = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
        assert((BuildCache.builtKeys -- keys0).nonEmpty,
          s"$q: first pass registered no build")
        val t0 = BuildCache.totalBuildSec
        val probe = SparkEntry.queries(q)(spark, sfDir).collect().toSeq
        assert(BuildCache.totalBuildSec == t0,
          s"$q: second pass re-ran construction")
        assert(probe == full, s"$q: memoized probe rows != lifecycle rows")
      }
    } finally BuildCache.reset()
  }
}
