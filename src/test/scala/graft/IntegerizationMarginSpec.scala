package graft

import org.apache.spark.sql.functions._

/** The r12-advice boundary-margin audit for the two ln-based
  * integerizations that gate byte-exactly cross-engine.
  *
  * The hazard: JVM Math.log is only guaranteed within 1 ulp of the
  * true result and is platform/intrinsic dependent, so
  * floor(x·10ᵏ + 0.5) can flip at a rounding boundary if a value
  * sits closer to an integer than the propagated ln wobble. q49's
  * 256 possible ln inputs were exhaustively checked in r11; t59/t60
  * draw ln inputs from the corpus, so the margins must be MEASURED
  * on the gate corpora (sf0.01 — the driver's oracle gate — and
  * sf0.1 — the exact audit).
  *
  * Findings (pinned below): t59's e4 path clears its wobble bound by
  * ≥ 10⁴× on every contribution — asserted. t60's e15 path CANNOT be
  * asserted: at y ≈ 10¹³ the double grid (ulp ≈ 2·10⁻³) is coarser
  * than any meaningful margin and some clocks land exactly ON an
  * integer — that is the documented single-platform gate assumption
  * next to [[graft.text.TextOps.t60ClockE15]], and this spec proves
  * the assertion is impossible (≥ 1 on-boundary row exists) while
  * pinning what IS robust: the sample-membership boundary (gap
  * between the kth and (k+1)th clock) is ≫ 1 e15 unit. */
class IntegerizationMarginSpec extends SparkSpec {

  private val gates = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("t59 e4 contributions sit >= 1e4 x the ln-wobble bound from every floor boundary on both gate corpora") {
    for (dir <- gates) {
      val rows = graft.text.TextOps.t59Joined(spark, dir)
        .select("tf", "df", "dl", "n", "sumdl").collect()
      assert(rows.length > 1000, s"$dir: expected a real contribution set, got ${rows.length}")
      var minRatio = Double.MaxValue
      rows.foreach { r =>
        val tf = r.getLong(0).toDouble; val df = r.getLong(1).toDouble
        val dl = r.getLong(2).toDouble; val n = r.getLong(3).toDouble
        val sumdl = r.getLong(4).toDouble
        // JVM mirror of t59ContribPre in its exact evaluation order
        val lnv = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        val sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl * n / sumdl)))
        val y = lnv * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl * n / sumdl))) * 10000.0 + 0.5
        val dist = math.min(y - math.floor(y), math.floor(y) + 1.0 - y)
        // 1 ulp on the ln result propagated through the saturation and
        // the e4 scale, plus a few ulps for the downstream * and /.
        val wobble = math.ulp(math.abs(lnv)) * sat * 10000.0 + 4.0 * math.ulp(y)
        minRatio = math.min(minRatio, dist / wobble)
      }
      // measured: 1.8e8 (sf0.01), 5.6e7 (sf0.1) — assert a 10^4 floor
      assert(minRatio > 1e4, s"$dir: min margin/wobble ratio $minRatio")
    }
  }

  test("t60 e15 clocks land ON floor boundaries (the documented assumption) but the sample boundary is wide") {
    for (dir <- gates) {
      val docs = Tables.documents(spark, dir)
        .filter(col("n_chars") > 0).select("doc_id", "n_chars").collect()
      val md = java.security.MessageDigest.getInstance("MD5")
      var onBoundary = 0
      docs.foreach { r =>
        val id = r.getLong(0); val w = r.getLong(1).toDouble
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val draw = java.lang.Long.parseLong(hex.substring(0, 15), 16).toDouble
        val y = -math.log((draw + 1.0) / 1152921504606846976.0) / w * 1.0e15
        if (y == math.floor(y)) onBoundary += 1
      }
      // This is WHY t60 documents a single-platform assumption instead
      // of asserting a margin: exact-integer clocks exist in the corpus.
      assert(onBoundary >= 1, s"$dir: expected on-boundary clocks, found none")

      // What IS robust: sample membership. The gap between the kth and
      // (k+1)th clock is huge in e15 units, so a +-1-unit floor flip
      // can never change WHICH docs are in the sample.
      val k = graft.text.TextOps.t60K
      val clocks = graft.text.TextOps
        .t60Clocked(Tables.documents(spark, dir))
        .orderBy(col("clock_e15")).limit(k + 1)
        .select("clock_e15").collect().map(_.getLong(0))
      assert(clocks.length == k + 1)
      val gap = clocks(k) - clocks(k - 1)
      assert(gap > 1000L, s"$dir: boundary gap $gap e15 units")
    }
  }
}
