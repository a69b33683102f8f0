package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash

/** Pins the Rabin–Karp rolling-hash fingerprint: reference
  * equivalence, the O(1) roll identity, and sensitivity to structure
  * that the md5 set-style fingerprint lacks. */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1000003L

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * B + (b & 0xff))

  private def hashOf(strs: String*): Seq[Long] =
    strs.toDF("t").select(RollingHash.rollingHash64(col("t")))
      .as[Long].collect().toSeq

  test("matches the byte-fold reference on assorted strings") {
    val cases = Seq("", "a", "hello world", "héllo 🚀", "x" * 1000)
    assert(hashOf(cases: _*) == cases.map(reference))
  }

  test("roll identity: h(s[1:] + c) == (h(s) - s[0]*B^(n-1)) * B + c") {
    val s = "abcdefgh"
    val rolled = s.substring(1) + "z"
    val n = s.length
    var pow = 1L
    (1 until n).foreach(_ => pow *= B)
    val Seq(h0, h1) = hashOf(s, rolled)
    assert(h1 == (h0 - (s.charAt(0).toLong * pow)) * B + 'z'.toLong,
      "the O(1) rolling update must reproduce the full recompute")
  }

  test("order-sensitive where the token-set fingerprint is not") {
    // same bytes, different order → different rolling hash
    val Seq(a, b) = hashOf("alpha beta", "beta alpha")
    assert(a != b)
    // deterministic across evaluations
    assert(hashOf("alpha beta").head == a)
  }
}
