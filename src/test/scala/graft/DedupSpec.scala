package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Specs for the non-oracle dedup ops (d23 MinHash+LSH, d24 SimHash)
  * plus behavioral checks on handcrafted near-duplicates, which the
  * synthetic corpus can't provide in controlled form. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    tmp = dir
  }
  private var tmp: String = _

  test("d23 minhash-lsh finds exact and near duplicates, skips distinct docs") {
    docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa", // exact dup of 1
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda", // 9/11 overlap
      4L -> "one two three four five six seven eight nine ten") // unrelated
    val pairs = Dedup.d23DedupMinhash(spark, tmp)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup must be found")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "0.82-jaccard near-dups must be found")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("d23 verified jaccard is exact on the candidate pairs") {
    docsOf(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i k")
    val row = Dedup.d23DedupMinhash(spark, tmp)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .select("jaccard").as[Double].collect()
    // |∩|=9, |∪|=11 → 0.8182
    assert(row.length == 1 && math.abs(row(0) - 0.8182) < 1e-9)
  }

  test("d24 simhash: set semantics — identical/reordered/repeated token sets collide") {
    docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      // same distinct-token SET: reordered with repeats → same signature
      3L -> "kappa iota theta eta zeta epsilon delta gamma beta alpha alpha kappa",
      4L -> "one two three four five six seven eight nine ten")
    val out = Dedup.d24DedupSimhash(spark, tmp)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m.get((1L, 2L)).contains(0), "identical docs → hamming 0")
    assert(m.get((1L, 3L)).contains(0), "same token set → hamming 0")
    assert(!m.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not appear within hamming 7")
  }

  test("d24 simhash signature is stable across runs (deterministic)") {
    docsOf(1L -> "alpha beta gamma", 2L -> "alpha beta gamma")
    val a = Dedup.d24DedupSimhash(spark, tmp).collect().toSeq
    val b = Dedup.d24DedupSimhash(spark, tmp).collect().toSeq
    assert(a == b)
  }

  test("attach strategy: d23 output identical under Auto, Broadcast, and Shuffle attach") {
    // the size-adaptive verify/attach must be a pure physical choice:
    // the oracle-pinned row set may not depend on which join strategy
    // attaches the shingle/size tables to the pair stream
    val dir = sfDir
    def rows(a: Dedup.Attach): Set[Seq[Any]] =
      Dedup.d23DedupMinhashAttach(spark, dir, a).collect().map(_.toSeq).toSet
    val auto = rows(Dedup.Attach.Auto)
    assert(auto.nonEmpty, "corpus must contain near-dups")
    assert(rows(Dedup.Attach.Broadcast) == auto, "Broadcast attach diverged")
    assert(rows(Dedup.Attach.Shuffle) == auto, "Shuffle attach diverged")
  }

  test("attach strategy: d28 output identical under Auto, Broadcast, and Shuffle attach") {
    def rows(a: Dedup.Attach): Set[Seq[Any]] =
      Dedup.d28EmbedNeardupLshAttach(spark, sfDir, a).collect().map(_.toSeq).toSet
    val auto = rows(Dedup.Attach.Auto)
    assert(auto.nonEmpty)
    assert(rows(Dedup.Attach.Broadcast) == auto)
    assert(rows(Dedup.Attach.Shuffle) == auto)
  }

  test("connected components: reliable checkpoint dir produces the same labels") {
    val ckpt = java.nio.file.Files.createTempDirectory("graftccckpt").toString
    try {
      val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
      val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
      val comp = Dedup.connectedComponents(verts, edges, Some(ckpt))
        .as[(Long, Long)].collect().toMap
      assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(ckpt))
    }
  }

  test("connected components: chains merge, isolated vertices stand alone") {
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // chain 1-2-3, pair 5-6, isolated 4
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val comp = Dedup.connectedComponents(verts, edges)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: 10k-vertex path graph converges (logarithmic contraction)") {
    // a single path 1-2-3-…-10000: diameter-round propagation would
    // exhaust any sane round budget; large-star/small-star must
    // contract it in O(log n) rounds
    val n = 10000L
    val verts = spark.range(1, n + 1).toDF("id")
    val edges = spark.range(1, n).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val comp = Dedup.connectedComponents(verts, edges)
      .as[(Long, Long)].collect()
    assert(comp.length == n)
    assert(comp.forall(_._2 == 1L), "all vertices label to the path minimum")
  }

  test("d27 clusters near-dups and keeps exactly one doc per component") {
    docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      3L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      4L -> "one two three four five six seven eight nine ten")
    val out = Dedup.d27DedupComponents(spark, tmp)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(1L, 4L),
      "keep = min doc per component")
  }

  test("d25b band-blocked ngram jaccard: superset of lang-blocked pairs at >= 0.7, identical scores") {
    val langBlocked = Dedup.d25NgramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.7)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val banded = Dedup.d25NgramJaccardBanded(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(langBlocked.nonEmpty, "corpus must contain >=0.7 bigram near-dups")
    // band blocking sees ALL near-dup pairs the lang block sees (and
    // also cross-lang ones the lang block is blind to, if any)
    val missed = langBlocked.keySet -- banded.keySet
    assert(missed.isEmpty, s"band blocking missed near-dup pairs: $missed")
    banded.foreach { case (p, j) =>
      langBlocked.get(p).foreach(lj =>
        assert(math.abs(lj - j) < 1e-9, s"jaccard differs for $p"))
    }
  }

  test("d25c md5-band ngram jaccard: superset of lang-blocked >= 0.7 pairs, scores agree with d25b on shared pairs") {
    // d25c is d25b with the candidate stage swapped to the
    // oracle-replayable md5-affine bands; both verify with the SAME
    // exact bigram Jaccard, so (1) like d25b it must see every
    // lang-blocked near-dup pair, and (2) any pair both find must
    // score identically (shared bigramVerify — this pins that the
    // two candidate streams feed one verify code path)
    val langBlocked = Dedup.d25NgramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.7)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val md5Banded = Dedup.d25cNgramBandedOracle(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(langBlocked.nonEmpty, "corpus must contain >=0.7 bigram near-dups")
    val missed = langBlocked.keySet -- md5Banded.keySet
    assert(missed.isEmpty, s"md5 band blocking missed near-dup pairs: $missed")
    val xxBanded = Dedup.d25NgramJaccardBanded(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val shared = md5Banded.keySet intersect xxBanded.keySet
    assert(shared.nonEmpty, "the two band streams must overlap on near-dups")
    shared.foreach(p =>
      assert(math.abs(md5Banded(p) - xxBanded(p)) < 1e-9, s"jaccard differs for $p"))
  }

  test("d28 bucketed embed near-dup: subset of d26's exact pairs, identical cosines, full recall on identical vectors") {
    val exact = Dedup.d26EmbedNeardup(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Dedup.d28EmbedNeardupLsh(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "bucketed path must find pairs on the corpus")
    lsh.foreach { case (a, b, c) =>
      assert(exact.contains((a, b)), s"($a,$b) not in exact pair set")
      assert(math.abs(exact((a, b)) - c) < 1e-9, s"cosine differs for ($a,$b)")
    }
    // BIT-identical vectors agree on every plane → land in every
    // band bucket together → can never be split: recall 1.0. (Keyed
    // on the raw float arrays, not rounded cosine == 1.0 — a
    // cosine-0.99996 pair rounds to 1.0 yet may legitimately be
    // split by a hyperplane.)
    val byVec = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .filter(_._2.exists(_ != 0f)) // zero-norm vectors are excluded by withNorm
      .groupBy(_._2.toSeq).values.filter(_.length > 1)
    val perfect = byVec.flatMap { grp =>
      val ids = grp.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.toSet
    val got = lsh.map(r => (r._1, r._2)).toSet
    assert(perfect.subsetOf(got),
      s"bit-identical duplicate pairs missed: ${perfect -- got}")
  }

  test("d22 exact dedup groups whitespace/case variants at sf0.001") {
    // engine-level check on real data: group count == distinct fingerprint count
    val out = Dedup.d22DedupExact(spark, sfDir)
    val n = out.count()
    val distinctFp = out.select("fingerprint").distinct().count()
    assert(n == distinctFp)
    assert(out.filter(col("dup_count") < 1).isEmpty)
  }

  test("d29 decontamination: shared 8-grams counted exactly, clean docs absent, eval docs never flagged") {
    // doc 0 and 53 are the eval slice (doc_id % 53 == 0)
    docsOf(
      0L  -> "a b c d e f g h i j",            // eval: 3 8-grams
      53L -> "p q r s t u v w x y",            // eval
      1L  -> "z a b c d e f g h y",            // shares exactly [a..h] with doc 0
      2L  -> "k l m n o kk ll mm nn oo",       // disjoint: must not appear
      3L  -> "a b c d e f g h i j",            // exact copy of eval doc 0: all 3 grams
      4L  -> "p q r s t u v w x yy")           // shares [p..w], [q..x] with doc 53
    val out = Dedup.d29DecontaminateN(spark, tmp, 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 3L -> 3L, 4L -> 2L),
      s"got $out")
  }

  test("d29 adversarial skew: a gram shared by EVERY doc flags all train docs exactly once") {
    // worst-case hot key: one 8-gram (a common boilerplate prefix)
    // appears in every document, eval and train alike. The broadcast
    // semi-join shape means the hot gram never shuffles the corpus —
    // correctness must hold: every train doc shares exactly that one
    // gram (suffixes are unique), eval docs never appear.
    val prefix = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = (0L until 64L).map(id => id -> s"$prefix u${id}a u${id}b")
    docsOf(docs: _*)
    val out = Dedup.d29DecontaminateN(spark, tmp, 8)
      .as[(Long, Long)].collect().toMap
    val train = docs.map(_._1).filter(_ % 53 != 0).toSet
    assert(out.keySet == train, "every train doc flagged, no eval doc present")
    assert(out.values.forall(_ == 1L),
      s"each train doc shares exactly the boilerplate gram, got ${out.filter(_._2 != 1L)}")
  }

  test("d30 repeated-passage stats: cross-doc grams counted, intra-doc repeats and short docs excluded") {
    docsOf(
      1L -> "a b c d e f g h",  // 5 4-grams; shares [a b c d] with doc 2
      2L -> "x a b c d y z w",  // 5 grams; [a b c d] is its 2nd
      3L -> "p q r s t u v ww", // 5 unique grams
      4L -> "one two three",    // < 4 tokens → no grams → absent
      5L -> "m m m m m m m m")  // one gram 5×, but only in THIS doc → not repeated
    val out = Dedup.d30RepeatedNgrams(spark, tmp)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((5L, 1L, 2000)),
      2L -> ((5L, 1L, 2000)),
      3L -> ((5L, 0L, 0)),
      5L -> ((5L, 0L, 0))),
      s"got $out")
  }

  test("d31 passage scrub: covered windows union across partners, full-scrub empties, short/intra-doc docs untouched") {
    docsOf(
      1L -> "a b c d e f g h",   // [a b c d] shared with 2 covers 1-4; [e f g h] shared with 6 covers 5-8 → fully scrubbed by TWO partners
      2L -> "x a b c d y z w",   // [a b c d] at pos 2 covers 2-5
      3L -> "p q r s t u v ww",  // unique grams → untouched
      4L -> "one two three",     // < 4 tokens → no grams → untouched
      5L -> "m m m m m m m m",   // repeats only within itself → untouched
      6L -> "e f g h q1 q2 q3 q4") // [e f g h] at pos 1 covers 1-4
    val out = Dedup.d31PassageScrub(spark, tmp)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((8L, 8L, "")),
      2L -> ((8L, 4L, "x y z w")),
      3L -> ((8L, 0L, "p q r s t u v ww")),
      4L -> ((3L, 0L, "one two three")),
      5L -> ((8L, 0L, "m m m m m m m m")),
      6L -> ((8L, 4L, "q1 q2 q3 q4"))),
      s"got $out")
  }

  test("d31 agrees with d30: a doc is scrubbed iff d30 reports repeated grams, and untouched docs keep their text verbatim") {
    // cross-operator invariant on the REAL corpus: d30's rep_grams>0
    // is exactly d31's removed_toks>0 (both sides define "repeated"
    // by the same min≠max gram rollup), and a doc d31 leaves alone
    // must round-trip its original text through split/concat_ws.
    val scrub = Dedup.d31PassageScrub(spark, sfDir)
      .select("doc_id", "removed_toks", "scrubbed_text")
    val stats = Dedup.d30RepeatedNgrams(spark, sfDir)
      .select("doc_id", "rep_grams")
    val joined = scrub.join(stats, Seq("doc_id"), "left")
    assert(joined.filter(
      (coalesce(col("rep_grams"), lit(0L)) > 0) =!=
        (col("removed_toks") > 0)).isEmpty,
      "d30 repeated-gram docs and d31 scrubbed docs must coincide")
    val untouched = scrub.filter(col("removed_toks") === 0)
      .join(graft.Tables.documents(spark, sfDir), Seq("doc_id"))
    assert(untouched.filter(col("scrubbed_text") =!= col("text")).isEmpty,
      "untouched docs must keep their exact text")
  }

  test("d29 gate is non-vacuous: the default gram size finds contamination on the test corpus") {
    // ADVICE r4: at n=8 the synthetic corpus shares ZERO grams across
    // the eval split at every SF, so the DuckDB comparison passed as
    // 0 == 0 and never exercised the gram-key expression on real
    // output. The default (n=4) must keep the gate non-vacuous — if
    // corpus regeneration ever breaks this, the oracle is vacuous
    // again and this test fails loudly instead.
    assert(Dedup.d29Decontaminate(spark, sfDir).count() > 0,
      "d29 output is empty at the test SF — the cross-engine gate is vacuous")
  }

  test("d33 bloom never misses: flags a superset of d29's docs, hit counts dominate") {
    import spark.implicits._
    // No false negatives is the Bloom guarantee: every gram d29's
    // exact semi-join matches has all 3 of its positions set by
    // construction, so every d29 doc appears in d33 with
    // bloom_hits ≥ shared_grams (false-positive grams can only ADD).
    val exact = Dedup.d29Decontaminate(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.d33BloomDecontaminate(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "empty d29 baseline — superset check is vacuous")
    exact.foreach { case (doc, shared) =>
      assert(bloom.contains(doc), s"doc $doc flagged by exact d29 but missed by the bloom")
      assert(bloom(doc) >= shared,
        s"doc $doc: bloom_hits ${bloom(doc)} < exact shared_grams $shared")
    }
  }

  test("d33 handcrafted corpus: bloom output equals exact d29 (no FPs at toy scale)") {
    import spark.implicits._
    // At toy scale the bitmap holds ≤ a few dozen of 2^20 bits, so
    // fpp ≈ (set/m)^3 < 1e-12 — the bloom must reproduce the exact
    // scrub bit-for-bit, pinning probe/build agreement end-to-end.
    docsOf(
      0L  -> "a b c d e f g h i j",
      53L -> "p q r s t u v w x y",
      1L  -> "z a b c d e f g h y",
      2L  -> "k l m n o kk ll mm nn oo",
      3L  -> "a b c d e f g h i j",
      4L  -> "p q r s t u v w x yy")
    val exact = Dedup.d29DecontaminateN(spark, tmp, 8).as[(Long, Long)].collect().toMap
    val bloom = Dedup.d33BloomDecontaminateN(spark, tmp, 8).as[(Long, Long)].collect().toMap
    assert(bloom == exact, s"bloom $bloom != exact $exact")
  }

  test("d33 bitmap build: set bits are exactly the 3 prime-modulus positions per eval gram") {
    import spark.implicits._
    val grams = Seq(7L, 1048574L, (1L << 59) + 12345L) // incl. > every prime
    val bits = Dedup.bloomBitmap(grams.toDF("gram"))
    val expected = grams.flatMap(g =>
      Seq(1048573L, 1048571L, 1048559L).map(p => g % p)).toSet
    val set = (0 until Dedup.bloomBits).filter(i =>
      (bits(i >> 6) >> (i & 63) & 1L) == 1L).map(_.toLong).toSet
    assert(set == expected, s"bitmap bits $set != expected positions $expected")
  }

  test("d32: d28 pairs share a component, keep-count = component count, gate non-vacuous") {
    import spark.implicits._
    val labels = Dedup.d32EmbedDedup(spark, sfDir)
      .select("vec_id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    val comp = labels.map(r => r._1 -> r._2).toMap
    val pairs = Dedup.d28EmbedNeardupLsh(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "no d28 pairs at the test SF — gate is vacuous")
    pairs.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    }
    labels.foreach { case (id, c, keep) =>
      assert(keep == (id == c), s"keep flag wrong for $id")
      assert(c <= id, s"component label must be the min member: $id -> $c")
    }
    assert(labels.count(_._3) == labels.map(_._2).distinct.length)
    // merges actually happen: fewer components than vectors
    assert(labels.map(_._2).distinct.length < labels.length)
  }

  test("d34 line dedup: shared segment dropped EVERYWHERE, unique segments kept in order, counts exact") {
    // segment length is 8: each text below is exactly 16 tokens =
    // 2 segments. Docs 1 and 2 share their FIRST segment verbatim
    // (planted boilerplate); every other segment is unique.
    val boiler = "the quick brown fox jumps over lazy dogs"
      .split(" ").take(8).mkString(" ")
    assert(boiler.split(" ").length == 8)
    docsOf(
      1L -> (boiler + " u1a u1b u1c u1d u1e u1f u1g u1h"),
      2L -> (boiler + " u2a u2b u2c u2d u2e u2f u2g u2h"),
      3L -> "v3a v3b v3c v3d v3e v3f v3g v3h v3i v3j v3k v3l v3m v3n v3o v3p",
      4L -> "w4a w4b w4c w4d w4e") // 5 tokens -> one short segment
    val res = Dedup.d34LineDedup(spark, tmp)
      .select("doc_id", "n_segments", "dropped_segments", "kept_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // boilerplate dropped from BOTH carriers (no keep-first), their
    // unique second segments survive verbatim
    assert(res(1L) == ((1L, 2L, 1L, "u1a u1b u1c u1d u1e u1f u1g u1h")))
    assert(res(2L) == ((2L, 2L, 1L, "u2a u2b u2c u2d u2e u2f u2g u2h")))
    // untouched doc reconstructs exactly, partial tail segment counts
    assert(res(3L)._2 == 2L && res(3L)._3 == 0L &&
      res(3L)._4 == "v3a v3b v3c v3d v3e v3f v3g v3h v3i v3j v3k v3l v3m v3n v3o v3p")
    assert(res(4L) == ((4L, 1L, 0L, "w4a w4b w4c w4d w4e")))
  }

  test("d34 full-drop doc empties; within-doc repeat alone is NOT dropped (cross-doc rule)") {
    val seg = "s1 s2 s3 s4 s5 s6 s7 s8"
    docsOf(
      1L -> seg,                 // doc 1 IS the shared segment
      2L -> seg,                 // doc 2 too -> both empty out
      3L -> (("r1 r2 r3 r4 r5 r6 r7 r8 " * 2).trim)) // same segment twice WITHIN one doc
    val res = Dedup.d34LineDedup(spark, tmp)
      .select("doc_id", "n_segments", "dropped_segments", "kept_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(res(1L) == ((1L, 1L, 1L, "")), "fully-duplicated doc must empty")
    assert(res(2L) == ((2L, 1L, 1L, "")))
    // min(doc)==max(doc) for the intra-doc repeat: kept both times —
    // intra-doc repetition is t35's business, not d34's
    assert(res(3L)._3 == 0L && res(3L)._4 ==
      "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8")
  }

  test("d35 incremental dedup equals the full recompute and classifies every planted shape") {
    val out = SparkEntry.queries("d35_incremental_dedup")(spark, sfDir)
      .as[(Long, String, String)].collect()
    assert(out.nonEmpty)
    val byStatus = out.groupBy(_._3).view.mapValues(_.toSeq).toMap
    // all three planted outcome classes occur, or the gate is vacuous
    Seq("accepted", "dup_in_batch", "dup_of_index").foreach(s =>
      assert(byStatus.contains(s), s"status $s never produced"))
    // the planted structure is exact: id≡4 (mod 12) pairs with its
    // batch twin id−4 (one accepted, one dup_in_batch); id≡8's twin
    // is historical, so every id≡8 batch doc is an index hit
    out.foreach { case (id, _, st) =>
      (id % 12) match {
        case 0L => assert(st == "accepted", s"doc $id (batch-min of its pair)")
        case 4L => assert(st == "dup_in_batch", s"doc $id (its twin $id-4 wins)")
        case 8L => assert(st == "dup_of_index", s"doc $id (historical twin)")
        case r  => fail(s"doc $id with residue $r should not be in the batch")
      }
    }
    // THE incremental==recompute property (the s42 stance for dedup):
    // index fingerprints ∪ accepted fingerprints == the full-corpus
    // distinct key set of the planted corpus, and the two are disjoint
    val docs = Tables.documents(spark, sfDir)
    val planted = docs.select(col("doc_id"), expr(
      """CASE WHEN doc_id % 12 = 4 THEN doc_id - 4
        |     WHEN doc_id % 12 = 8 THEN doc_id - 5
        |     ELSE doc_id END""".stripMargin).as("cid"))
      .join(docs.select(col("doc_id").as("cid"), col("text").as("ctext")), "cid")
      .select(col("doc_id"),
        graft.text.TextOps.fingerprint(col("ctext")).as("fp"))
    val all = planted.select("fp").as[String].collect().toSet
    val index = planted.filter(col("doc_id") % 4 =!= 0)
      .select("fp").as[String].collect().toSet
    val accepted = byStatus("accepted").map(_._2).toSet
    assert((index ++ accepted) == all,
      "index + accepted must cover every distinct fingerprint")
    assert((index & accepted).isEmpty,
      "accepted keys must be NEW to the index")
  }

  test("d36 cluster sample: quota per cell exactly, balanced despite skew, replayable draws") {
    val out = SparkEntry.queries("d36_cluster_sample")(spark, sfDir)
      .as[(Long, Int, Long, Int, Boolean)].collect()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(out.length == total, "one row per vector, corpus-sized output")
    val byCell = out.groupBy(_._2)
    byCell.foreach { case (cell, rows) =>
      val kept = rows.count(_._5)
      assert(kept == math.min(8, rows.length),
        s"cell $cell must keep min(quota, size)")
      // keep == the q lowest (draw, vec_id) — selection is uniform
      // in the deterministic draw, not correlated with vec_id order
      val sorted = rows.sortBy(r => (r._3, r._1)).map(_._1).take(kept).toSet
      assert(rows.filter(_._5).map(_._1).toSet == sorted,
        s"cell $cell keeps exactly the lowest draws")
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq,
        s"cell $cell ranks are a permutation")
    }
    // the balancing property is non-vacuous on this corpus: cell
    // sizes are SKEWED (max > 2x min over populated cells) yet every
    // cell large enough contributes the identical quota
    val sizes = byCell.values.map(_.length).toSeq
    assert(sizes.max > 2 * sizes.min || sizes.size == 1,
      s"expected a skewed routing distribution, got $sizes")
    val fullCells = byCell.values.filter(_.length >= 8)
    assert(fullCells.nonEmpty &&
      fullCells.forall(_.count(_._5) == 8),
      "every full cell contributes exactly the quota - the head topic is capped")
    // draw replays: md5-based, independent recompute
    out.take(20).foreach { case (id, _, draw, _, _) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7)
      assert(draw == java.lang.Long.parseLong(hex, 16), s"draw of $id")
    }
  }

  test("d37 incremental near-dup equals the full recompute restricted to batch-touching pairs") {
    val inc = SparkEntry.queries("d37_incremental_neardup")(spark, sfDir)
      .as[(Long, Long, Double, String)].collect().toSet
    assert(inc.nonEmpty)
    assert(inc.exists(_._4 == "vs_index") && inc.exists(_._4 == "in_batch"),
      "both candidate sources must occur or the gate is vacuous")
    // d23b is the full-corpus recompute on the same md5-affine bands;
    // restricting its pairs to those touching the batch and
    // reorienting (vs_index pairs put the HISTORICAL doc first, the
    // index side) must reproduce d37 exactly — the daily incremental
    // run finds precisely what a from-scratch rerun would
    val full = Dedup.d23bMinhashOracle(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val expected = full.flatMap { case (a, b, j) =>
      (a % 4 == 0, b % 4 == 0) match {
        case (true, true)  => Some((a, b, j, "in_batch"))
        case (true, false) => Some((b, a, j, "vs_index"))
        case (false, true) => Some((a, b, j, "vs_index"))
        case _             => None
      }
    }.toSet
    assert(inc == expected,
      s"incremental != restricted recompute: missing=${(expected -- inc).take(3)} " +
        s"extra=${(inc -- expected).take(3)}")
  }

  test("d41 fuzzy decontamination equals the full recompute restricted to cross-split pairs") {
    val d41 = SparkEntry.queries("d41_fuzzy_decontaminate")(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(d41.nonEmpty, "no contaminated train doc found — gate is vacuous")
    assert(d41.forall(_._1 % 53 != 0), "an eval doc leaked into the train-side rollup")
    // d23b is the full-corpus recompute on the same md5-affine bands;
    // restricting its pairs to those crossing the eval boundary,
    // orienting train-first, and rolling up per train doc must
    // reproduce d41 exactly — the benchmark scrub finds precisely the
    // cross-split subset of what a full near-dup pass would
    val full = Dedup.d23bMinhashOracle(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val expected = full.flatMap { case (a, b, j) =>
      (a % 53 == 0, b % 53 == 0) match {
        case (true, false) => Some((b, a, j))
        case (false, true) => Some((a, b, j))
        case _             => None
      }
    }.groupBy(_._1).map { case (t, ms) =>
      (t, ms.length.toLong, ms.map(_._3).max, ms.map(_._2).min)
    }.toSet
    assert(d41 == expected,
      s"fuzzy decon != restricted recompute: missing=${(expected -- d41).take(3)} " +
        s"extra=${(d41 -- expected).take(3)}")
  }

  test("d42 keeps the per-component quality argmax and genuinely diverges from keep-min") {
    val d42 = SparkEntry.queries("d42_quality_keep")(spark, sfDir)
      .as[(Long, Long, Int, Boolean)].collect()
    val d32 = SparkEntry.queries("d32_embed_dedup")(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
    // identical component partition — only the keep rule changes
    assert(d42.map(r => (r._1, r._2)).sorted.toSeq ==
      d32.map(r => (r._1, r._2)).sorted.toSeq)
    // keep == independent per-component argmax (score desc, id asc)
    d42.groupBy(_._2).foreach { case (comp, members) =>
      val keeper = members.minBy(m => (-m._3, m._1))._1
      members.foreach { m =>
        assert(m._4 == (m._1 == keeper),
          s"component $comp: wrong keep flag on ${m._1}")
      }
    }
    // non-vacuous: some multi-member component's best copy is NOT
    // its min-id member, so the rule actually changes the shipped set
    val minKeep = d32.filter(_._3).map(_._1).toSet
    val qKeep = d42.filter(_._4).map(_._1).toSet
    assert(qKeep != minKeep,
      "quality argmax never diverged from keep-min — corpus makes the rule vacuous")
  }

  test("d38 incremental embed near-dup equals the full d28 recompute restricted to batch-touching pairs") {
    val inc = SparkEntry.queries("d38_incremental_embed_neardup")(spark, sfDir)
      .as[(Long, Long, Double, String)].collect().toSet
    assert(inc.nonEmpty)
    assert(inc.exists(_._4 == "vs_index") && inc.exists(_._4 == "in_batch"),
      "both candidate sources must occur or the gate is vacuous")
    // d28 is the full-corpus recompute on the same literal hyperplane
    // bands; restricting its pairs to those touching the batch and
    // reorienting (vs_index pairs put the HISTORICAL vector first)
    // must reproduce d38 exactly — the d37 property, for embeddings
    val full = Dedup.d28EmbedNeardupLsh(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val expected = full.flatMap { case (a, b, c) =>
      (a % 4 == 0, b % 4 == 0) match {
        case (true, true)  => Some((a, b, c, "in_batch"))
        case (true, false) => Some((b, a, c, "vs_index"))
        case (false, true) => Some((a, b, c, "vs_index"))
        case _             => None
      }
    }.toSet
    assert(inc == expected,
      s"incremental != restricted recompute: missing=${(expected -- inc).take(3)} " +
        s"extra=${(inc -- expected).take(3)}")
  }

  test("d39 incremental label maintenance equals d32's full re-clustering exactly") {
    val inc = SparkEntry.queries("d39_incremental_components")(spark, sfDir)
      .as[(Long, Long, Boolean)].collect().toSet
    val full = SparkEntry.queries("d32_embed_dedup")(spark, sfDir)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(inc.nonEmpty && inc == full,
      s"incremental != recompute: missing=${(full -- inc).take(3)} extra=${(inc -- full).take(3)}")
    // non-vacuous: at least one component spans history AND batch —
    // the star-edges-plus-new-pairs union genuinely merged state, it
    // didn't just relabel two disjoint halves
    val byComp = inc.groupBy(_._2)
    assert(byComp.exists { case (_, g) =>
      g.exists(_._1 % 4 == 0) && g.exists(_._1 % 4 != 0) && g.size > 1
    }, "no component spans the batch split — the merge path never ran")
  }

  test("d40 daily admission equals the composition of its three stage operators, each biting") {
    val d40 = SparkEntry.queries("d40_daily_admit")(spark, sfDir)
      .as[(Long, String, Int)].collect()
    assert(d40.nonEmpty)
    // stages 1+2 are exactly d35's 'accepted' class
    val d35 = SparkEntry.queries("d35_incremental_dedup")(spark, sfDir)
      .as[(Long, String, String)].collect()
    val accepted = d35.filter(_._3 == "accepted").map(_._1).toSet
    assert(d40.map(_._1).toSet.subsetOf(accepted),
      "an admitted doc was not d35-accepted — a dedup stage leaked")
    // stage 3 bites and is the exact boundary: admitted == accepted
    // minus the below-threshold docs (scores from the shared scorer,
    // whose formula is independently pinned by t30's oracle + spec)
    val (_, batchDocs) = Dedup.d35IndexAndBatch(spark, sfDir)
    val scores = batchDocs
      .withColumn("q", graft.text.TextOps.qualityScoreBp(split(col("text"), " ")))
      .select("doc_id", "q").as[(Long, Int)].collect().toMap
    val minBp = graft.text.TextOps.t40QualityMinBp
    val expected = accepted.filter(id => scores(id) >= minBp)
    assert(d40.map(_._1).toSet == expected,
      "admitted set != accepted ∩ quality-passing")
    assert(expected.size < accepted.size,
      "quality gate never bit — stage 3 is vacuous on this corpus")
    d40.foreach { case (id, _, q) => assert(q == scores(id) && q >= minBp) }
  }

  test("d43 audit partitions the batch and its admitted rows ARE d40's output") {
    val audit = SparkEntry.queries("d43_admission_audit")(spark, sfDir)
      .as[(Long, String, Int, String)].collect()
    // exactly one verdict per batch doc — a drop ledger must cover
    // the batch, not sample it
    val (_, batchDocs) = Dedup.d35IndexAndBatch(spark, sfDir)
    val batchIds = batchDocs.select("doc_id").as[Long].collect().toSet
    assert(audit.map(_._1).toSet == batchIds && audit.length == batchIds.size,
      "audit must cover every batch doc exactly once")
    // dedup verdicts agree with d35's registered classification
    val d35 = SparkEntry.queries("d35_incremental_dedup")(spark, sfDir)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    audit.foreach { case (id, _, _, v) =>
      if (v == "dup_of_index" || v == "dup_in_batch")
        assert(v == d35(id), s"doc $id: audit $v != d35 ${d35(id)}")
      else assert(d35(id) == "accepted", s"doc $id: $v but d35 says ${d35(id)}")
    }
    // the composition law: admitted rows == d40's registered output,
    // ids AND carried columns
    val admitted = audit.filter(_._4 == "admitted")
      .map(r => (r._1, r._2, r._3)).sortBy(_._1).toSeq
    val d40 = SparkEntry.queries("d40_daily_admit")(spark, sfDir)
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(admitted == d40, "audit's admitted rows != d40's admission")
    // every verdict class populated — an audit with dead classes
    // proves nothing
    val classes = audit.map(_._4).toSet
    assert(classes == Set("admitted", "dup_of_index", "dup_in_batch", "low_quality"),
      s"verdict classes: $classes")
  }

  // ---- d44 cross-document exact-substring dedup ----

  test("d44 finds a planted 15-token passage at the guarantee threshold, not 14") {
    val run15 = (1 to 15).map(i => s"s$i").mkString(" ")
    val run14 = (1 to 14).map(i => s"s$i").mkString(" ")
    docsOf(
      1L -> s"f1 f2 f3 f4 f5 $run15 g1 g2 g3 g4 g5",
      2L -> s"h1 h2 h3 h4 h5 h6 h7 $run15 i1 i2 i3",
      3L -> s"j1 j2 j3 j4 j5 $run14 k1 k2 k3 k4 k5 k6",
      4L -> s"l1 l2 l3 l4 l5 $run14 n1 n2 n3 n4 n5 n6")
    val out = Dedup.d44Core(spark.read.parquet(s"$tmp/documents.parquet"))
      .as[(Long, Long, Long, Long, Long)].collect()
    // the ≥ w+k−1 run is guaranteed found, with exact positions
    assert(out.toSet == Set((1L, 2L, 6L, 8L, 15L)),
      s"expected exactly the planted 15-run, got ${out.toSet}")
  }

  test("d44 reported span is maximal and token-exact; longest diagonal wins") {
    // docs share TWO passages on different diagonals: a 15-run and a
    // 20-run — the witness must be the 20-run, maximally extended
    val a = (1 to 15).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    docsOf(
      1L -> s"x1 x2 $a x3 x4 $b x5 x6",
      2L -> s"y1 $b y2 y3 y4 $a y5")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val out = Dedup.d44Core(docs).as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (_, _, sa, sb, len) = out.head
    assert(len == 20L, s"longest shared run must win, got $len")
    val ta = docs.filter(col("doc_id") === 1).select("text").as[String].head.split(" ")
    val tb = docs.filter(col("doc_id") === 2).select("text").as[String].head.split(" ")
    // token-exact across the span
    (0 until len.toInt).foreach(o =>
      assert(ta(sa.toInt - 1 + o) == tb(sb.toInt - 1 + o)))
    // maximal: mismatch (or boundary) on both sides
    assert(sa == 1 || sb == 1 || ta(sa.toInt - 2) != tb(sb.toInt - 2))
    assert(sa - 1 + len == ta.length || sb - 1 + len == tb.length ||
      ta((sa + len).toInt - 1) != tb((sb + len).toInt - 1))
  }

  test("d44 winnowing selection matches an independent mirror and keeps the guarantee") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val got = Dedup.d44Fingerprints(docs)
      .select("doc_id", "pos").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def gram(toks: Array[String], i: Int): Long = { // 1-based, k tokens
      val h = md.digest(toks.slice(i - 1, i - 1 + Dedup.d44K).mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16)
    }
    var nSel = 0L; var nGram = 0L
    texts.foreach { case (id, text) =>
      val toks = text.split(" ")
      val m = toks.length - (Dedup.d44K - 1)
      val g = if (m < 1) Array.empty[Long] else (1 to m).map(gram(toks, _)).toArray
      val sel = (1 to math.max(m, 0)).filter { i =>
        val lo = math.max(1, i - (Dedup.d44W - 1))
        val hi = math.min(i, m - (Dedup.d44W - 1))
        (lo to hi).exists(j => g(i - 1) == g.slice(j - 1, j - 1 + Dedup.d44W).min)
      }
      assert(got.getOrElse(id, Seq.empty) == sel,
        s"doc $id: winnowing selection differs from mirror")
      nSel += sel.size; nGram += math.max(m, 0)
      // guarantee: every full window of w grams contains a selected pos
      if (m >= Dedup.d44W) (1 to m - Dedup.d44W + 1).foreach { j =>
        assert(sel.exists(p => p >= j && p < j + Dedup.d44W),
          s"doc $id: window at $j has no selected fingerprint")
      }
    }
    // density sanity: ~2/(w+1) expected; assert well under indexing-everything
    assert(nSel.toDouble / nGram < 0.5,
      s"winnowing density ${nSel.toDouble / nGram} suspiciously high")
  }

  // ---- d45 exact-substring scrub ----

  test("d45 keep-first span-union scrub: doc hit by two overlapping partners") {
    // doc 3 shares x1..x15 with doc 1 and x6..x20 with doc 2; docs 1
    // and 2 overlap each other by only 10 tokens (< minRun 15) so
    // neither is the other's partner. Keep-first: 1 and 2 (the lower
    // ids in their runs) keep their copies and do NOT appear in the
    // output; doc 3 removes the UNION x1..x20 — the x6..x15 overlap
    // of the two spans is counted exactly once.
    val x = (1 to 20).map(i => s"x$i")
    docsOf(
      1L -> s"p1 p2 p3 ${x.take(15).mkString(" ")} q1 q2",
      2L -> s"r1 r2 ${x.drop(5).mkString(" ")} s1 s2 s3",
      3L -> s"t1 ${x.mkString(" ")} u1 u2")
    val rows = Dedup.d45Core(spark.read.parquet(s"$tmp/documents.parquet"))
      .as[(Long, Long, Long, String)].collect()
    assert(rows.map(_._1).toSeq == Seq(3L),
      s"only the higher-id doc is scrubbed, got ${rows.map(_._1).toSeq}")
    val (_, removed, kept, keptText) = rows.head
    assert(removed == 20L, s"span union is 20 tokens, got $removed")
    assert(kept == 3L && keptText == "t1 u1 u2",
      s"kept must be the uncovered positions in order, got '$keptText'")
  }

  test("d45 output equals an independent in-memory scrub of d44's runs") {
    // the composition law: d45 is EXACTLY span-union coverage over
    // d44Runs' >= minRun rows, recomputed here from d44's own output
    // with a plain Scala mirror on the real corpus
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val spans = Dedup.d44Runs(docs)
      .filter(col("run_len") >= Dedup.d44MinRun)
      .select("doc_b", "start_b", "run_len").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._2 + r._3 - 1)).toSeq).toMap
    assert(spans.nonEmpty, "corpus must exercise the scrub (vacuity guard)")
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    val expected = spans.map { case (id, sps) =>
      val toks = texts(id).split(" ")
      val keptPos = (1 to toks.length)
        .filterNot(p => sps.exists(sp => p >= sp._1 && p <= sp._2))
      (id, (toks.length - keptPos.size).toLong, keptPos.size.toLong,
        keptPos.map(p => toks(p - 1)).mkString(" "))
    }.toSet
    val got = SparkEntry.queries("d45_substring_scrub")(spark, sfDir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected, "d45 != independent scrub of d44Runs")
  }

  // ---- d47 index forget ----

  test("d47 mask==rebuild law; the flip set is exact and nothing else moves") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d47_index_forget")(spark, sfDir)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    // rebuild side of the law, computed independently in-Spark: index
    // from scratch on surviving history through the shared classify
    val planted = Dedup.d35Planted(spark, sfDir)
    val rebuilt = planted
      .filter(col("doc_id") % 4 =!= 0 && !expr(Dedup.d47ForgetPred))
      .select(col("doc_id"),
        graft.text.TextOps.fingerprint(col("text")).as("fingerprint"))
      .groupBy("fingerprint").agg(min("doc_id").as("index_doc_id"))
    val expected = Dedup.d35Classify(
        planted.filter(col("doc_id") % 4 === 0), rebuilt)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(got == expected, "mask-then-compact != rebuild-without-forgotten")
    // vs d35: exactly the ≡8 (mod 24) batch docs flip
    // dup_of_index → accepted; every other verdict is untouched
    val before = SparkEntry.queries("d35_incremental_dedup")(spark, sfDir)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    val flips = before.keySet.filter(id => before(id) != got(id))
    assert(flips.nonEmpty, "forget had no visible effect (vacuous)")
    flips.foreach { id =>
      assert(id % 24 == 8, s"unexpected flip at doc $id")
      assert(before(id) == "dup_of_index" && got(id) == "accepted",
        s"doc $id flipped ${before(id)} → ${got(id)}")
    }
    assert(before.keySet.filter(_ % 24 == 8).subsetOf(flips),
      "every ≡8 (mod 24) batch doc must flip")
    // the still-indexed twins must keep their verdict
    before.keySet.filter(_ % 24 == 20).foreach { id =>
      assert(got(id) == "dup_of_index", s"doc $id lost its index hit") }
  }

  // ---- d46 semantic dedup (SemDeDup) ----

  test("d46 equals an in-memory mirror of the cell-restricted drop rule; capture floor holds") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d46_semantic_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sortBy(_._1)
    // mirror: a42's own top-2 assignment + d26's rounded-cosine rule
    val cells = graft.ann.Ann.a42AssignTop(spark, sfDir, 2)
      .as[(Long, Seq[Int])].collect().toMap
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .filter(e => math.sqrt(e._2.map(x => x.toDouble * x).sum) > 0)
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    val expected = emb.map { case (v, ev) =>
      val dupOf = emb.filter { case (u, eu) =>
        u < v && cells(u).intersect(cells(v)).nonEmpty && cos(eu, ev) >= 0.4
      }.map(_._1).sorted.headOption
      (v, dupOf.isEmpty, dupOf)
    }.toSeq
    assert(got == expected, "d46 != mirror of the cell-restricted keep-min rule")
    // non-vacuous both ways
    val nDrop = got.count(!_._2)
    assert(nDrop > 0 && nDrop < got.size, s"degenerate output: $nDrop drops")
    // capture floor vs d26's registered global pairs: the top-2
    // cell restriction must keep the majority of true near-dup pairs
    // candidate-visible (measured 42/66 here, 40/59 at sf0.01)
    val d26 = SparkEntry.queries("d26_embed_neardup")(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val captured = d26.count { case (a, b) =>
      cells(a).intersect(cells(b)).nonEmpty }
    assert(captured.toDouble / d26.length >= 0.55,
      s"cell capture $captured/${d26.length} below the SemDeDup floor")
    info(f"d46 drops=$nDrop/${got.size} capture=${captured.toDouble / d26.length}%.2f")
  }

  // ---- d48 containment dedup (asymmetric overlap) ----

  test("d48 flags the short-doc-pasted-into-long case that Jaccard misses") {
    // doc 2 (20 tokens) is pasted verbatim into doc 1 (100 tokens):
    // containment(2 ⊆ 1) = 1.0, but gram-Jaccard = 13/93 ≈ 0.14 —
    // far below any d23/d25 threshold. doc 3 is unrelated.
    val run = (1 to 20).map(i => s"s$i").mkString(" ")
    docsOf(
      1L -> s"${(1 to 40).map(i => s"p$i").mkString(" ")} $run ${(1 to 40).map(i => s"q$i").mkString(" ")}",
      2L -> run,
      3L -> (1 to 30).map(i => s"u$i").mkString(" "))
    val out = Dedup.d48ContainmentDedup(spark, tmp)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)),
      s"expected exactly (container=1, contained=2, 1.0), got ${out.toSeq}")
    // witness the division of labor: the same pair's gram-Jaccard is
    // tiny, so the symmetric family is structurally blind to it
    val jac = 13.0 / 93.0
    assert(jac < Dedup.d48Threshold / 2,
      s"planted pair must be a Jaccard miss, jaccard=$jac")
  }

  test("d48 orientation: fewer-gram doc is contained; equal counts tie to ids") {
    // docs 5 and 6: 30 tokens each (23 grams each), sharing a
    // 20-token run → containment = 13/23 ≈ 0.5652 ≥ 0.5; the gram
    // counts TIE, so orientation falls to (least, greatest) = (5, 6).
    val run = (1 to 20).map(i => s"v$i").mkString(" ")
    docsOf(
      5L -> s"${(1 to 10).map(i => s"a$i").mkString(" ")} $run",
      6L -> s"$run ${(1 to 10).map(i => s"b$i").mkString(" ")}")
    val out = Dedup.d48ContainmentDedup(spark, tmp)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((5L, 6L, 0.5652)),
      s"tie must orient (least, greatest) with containment 13/23, got ${out.toSeq}")
  }

  test("d48 equals an independent in-memory mirror on the real corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = Dedup.d44Runs(docs)
      .filter(col("run_len") >= Dedup.d44MinRun)
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty, "corpus must exercise d48 (vacuity guard)")
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def gramSet(text: String): Set[Long] = {
      val toks = text.split(" ")
      (0 to toks.length - Dedup.d44K).map { i =>
        val h = md.digest(toks.slice(i, i + Dedup.d44K).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(h.take(15), 16)
      }.toSet
    }
    val expected = pairs.toSeq.flatMap { case (a, b) =>
      val (ga, gb) = (gramSet(texts(a)), gramSet(texts(b)))
      if (ga.isEmpty || gb.isEmpty) None
      else {
        val c = BigDecimal(ga.intersect(gb).size.toDouble / math.min(ga.size, gb.size))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (c < Dedup.d48Threshold) None
        else if (ga.size < gb.size) Some((b, a, c))
        else if (gb.size < ga.size) Some((a, b, c))
        else Some((math.min(a, b), math.max(a, b), c))
      }
    }.sorted
    val got = SparkEntry.queries("d48_containment_dedup")(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == expected, "d48 != independent containment mirror")
    assert(got.nonEmpty, "d48 must flag pairs on the real corpus")
  }

  // ---- d49 contamination report ----

  test("d49 ledger: planted fractions, clean rows, and sub-n-token docs all appear") {
    // eval docs are ids = 0 (mod 53). doc 53 shares 2 of its 4 grams
    // with train doc 1 (0.5); doc 106's single gram is fully in train
    // doc 2 (1.0); doc 159 is clean; doc 212 has 3 tokens < n=4 so
    // its ledger row is (0, 0, 0.0, clean) — present, not dropped.
    docsOf(
      1L -> "t1 t2 e1 e2 e3 e4 e5 t3",
      2L -> "f1 f2 f3 f4 u1 u2 u3",
      53L -> "e1 e2 e3 e4 e5 e6 e7",
      106L -> "f1 f2 f3 f4",
      159L -> "g1 g2 g3 g4 g5 g6",
      212L -> "h1 h2 h3")
    val got = Dedup.d49ContaminationReport(spark, tmp)
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    assert(got == Seq(
      (53L, 4L, 2L, 0.5, "dirty"),
      (106L, 1L, 1L, 1.0, "dirty"),
      (159L, 3L, 0L, 0.0, "clean"),
      (212L, 0L, 0L, 0.0, "clean")),
      s"planted ledger mismatch: $got")
  }

  test("d49 equals an independent gram-set mirror on the real corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = 4
    def gramSet(text: String): Set[Long] = {
      val toks = text.split(" ")
      (0 to toks.length - n).map { i =>
        val h = md.digest(toks.slice(i, i + n).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(h.take(15), 16)
      }.toSet
    }
    val trainGrams = texts.filter(_._1 % 53 != 0).map(t => gramSet(t._2))
      .foldLeft(Set.empty[Long])(_ ++ _)
    val expected = texts.filter(_._1 % 53 == 0).sortBy(_._1).map { case (id, text) =>
      val g = gramSet(text)
      val m = g.count(trainGrams)
      val frac = if (g.isEmpty) 0.0
        else BigDecimal(m.toDouble / g.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, g.size.toLong, m.toLong, frac, if (m > 0) "dirty" else "clean")
    }.toSeq
    val got = SparkEntry.queries("d49_contamination_report")(spark, sfDir)
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    assert(got == expected, "d49 != independent gram-set mirror")
    assert(got.exists(_._5 == "dirty"), "corpus must exercise the dirty class")
  }

  // ---- d50 URL canonicalization + dedup ----

  test("d50 canonicalizer: every rule pinned on handcrafted edges") {
    val cases = Seq(
      // case-fold + default port + fragment + trailing slash
      ("HTTPS://Shop.Example.COM:443/a/b/?id=3#frag",
        "https://shop.example.com/a/b?id=3"),
      // :80 is NOT https' default port — it survives
      ("https://h.example:80/p", "https://h.example:80/p"),
      // :80 IS http's default; :443 on http is not
      ("http://h.example:80/p", "http://h.example/p"),
      ("http://h.example:443/p", "http://h.example:443/p"),
      // tracking params die wherever they sit; survivors sort
      ("https://h/p?utm_source=a&z=2&fbclid=x&a=1&utm_campaign=b",
        "https://h/p?a=1&z=2"),
      // all params stripped → no bare '?'
      ("https://h/p?utm_source=a&gclid=b", "https://h/p"),
      // bare utm key without '=' also dies
      ("https://h/p?utm_x&a=1", "https://h/p?a=1"),
      // multiple trailing slashes collapse; root path becomes empty
      ("https://h/a///", "https://h/a"),
      ("https://h/?b=2&a=1", "https://h?a=1&b=2"))
    val got = cases.map(_._1).toDF("url")
      .select(Dedup.urlCanonical(col("url")).as("c")).as[String].collect().toSeq
    assert(got == cases.map(_._2),
      s"canonicalizer rules broken:\n${got.zip(cases).filter(p => p._1 != p._2._2)}")
  }

  test("d50 planted structure: 4 transport variants collapse, controls stay distinct") {
    val out = SparkEntry.queries("d50_url_dedup")(spark, sfDir)
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(out.size == 220 && out.map(_._2).distinct.size == 70,
      "expected 70 canonical groups over 220 urls")
    (0L until 50L).foreach { cid =>
      val grp = out.filter(r => r._1 % 50 == cid && r._1 < 200)
      assert(grp.map(_._2).distinct.size == 1,
        s"variants of page $cid must share one canonical")
      assert(grp.map(_._3).toSet == Set(None, Some(cid)),
        s"page $cid: keeper is min id, others point at it")
    }
    assert(out.filter(_._1 >= 200).forall(_._3.isEmpty),
      "control urls must not dedup")
  }

  // ---- d51 near-dup pipeline eval ----

  test("d51 metrics: captured == d23b's verified output, truth == brute mirror, arithmetic exact") {
    val sfDir = "/root/testdata/sf0.001"
    val (tp, cp, kp, rec, prec) = SparkEntry.queries("d51_neardup_eval")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().head
    // captured = candidates ∩ truth IS the verified d23b output — the
    // eval must measure the registered pipeline, not a twin
    val d23b = SparkEntry.queries("d23b_minhash_oracle")(spark, sfDir).count()
    assert(kp == d23b, s"captured $kp != d23b verified output $d23b")
    // truth leg == independent brute-force over collected shingle sets
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("sh"))
      .as[(Long, Seq[String])].collect().map { case (id, sh) => (id, sh.toSet) }
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs
      if a < b
      j = BigDecimal(sa.intersect(sb).size.toDouble / sa.union(sb).size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.7
    } yield ()).size
    assert(tp == brute, s"truth $tp != brute-force mirror $brute")
    // metric arithmetic and sanity: banding both misses truth (recall
    // < 1) and over-generates candidates (precision < 1) on this
    // corpus — the eval is non-vacuous in both directions
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rec == r4(kp.toDouble / tp) && prec == r4(kp.toDouble / cp))
    assert(kp <= tp && kp <= cp && rec < 1.0 && prec < 1.0 && rec > 0 && prec > 0,
      s"degenerate eval: truth=$tp cand=$cp captured=$kp")
  }

  test("d51 sampled truth is code: the doc-sampled eval agrees with the full eval") {
    val sfDir = "/root/testdata/sf0.001"
    import graft.dedup.Dedup.d51EvalWith
    val full = d51EvalWith(spark, sfDir, 1, 1)
      .as[(Long, Long, Long, Double, Double)].collect().head
    // mod = 1 IS the registered entry — the parameter cannot drift
    // the gate setting
    val reg = SparkEntry.queries("d51_neardup_eval")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(full == reg, "full-truth parameterization != registered d51")
    // the at-scale form: keep 1 of 2 docs — the truth enumeration is
    // ~1/4 the pairs, and the estimate must still see the same
    // pipeline health (a uniform pair subsample is unbiased; the
    // tolerance is the sampling noise at this corpus size)
    val half = d51EvalWith(spark, sfDir, 1, 2)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(half._1 > 0 && half._1 < full._1,
      s"sampled truth universe must be non-empty and smaller: ${half._1} vs ${full._1}")
    assert(half._2 < full._2, "sampled candidate universe must shrink")
    assert(math.abs(half._4 - full._4) <= 0.2,
      s"sampled recall ${half._4} drifted from full ${full._4}")
    assert(math.abs(half._5 - full._5) <= 0.2,
      s"sampled precision ${half._5} drifted from full ${full._5}")
  }

  test("d53 banding curve: 4x4 point IS d51, nested-candidate monotonicity, real tradeoff") {
    val sfDir = "/root/testdata/sf0.001"
    val curve = SparkEntry.queries("d53_banding_curve")(spark, sfDir)
      .as[(Int, Int, Long, Long, Long, Double, Double)].collect().toSeq
    assert(curve.map(_._1) == Seq(1, 2, 4, 8), s"one row per swept config: $curve")
    // the production point IS d51: same truth, same candidate join,
    // same arithmetic — the curve measures the shipped pipeline
    val d51 = SparkEntry.queries("d51_neardup_eval")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().head
    val p44 = curve.find(_._1 == 4).get
    assert((p44._3, p44._4, p44._5, p44._6, p44._7) == d51,
      s"4x4 row $p44 != d51 $d51")
    // candidate sets are NESTED along the sweep (a pair agreeing on a
    // band agrees on both its half-bands): candidates and captured
    // monotone, truth constant
    curve.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(lo._4 <= hi._4 && lo._5 <= hi._5, s"nesting violated: $lo -> $hi")
      case _ => ()
    }
    assert(curve.map(_._3).distinct.size == 1, "truth must not vary with banding")
    // the tradeoff is real on this corpus: sweeping 1->8 bands grows
    // the candidate stream strictly and collapses precision
    assert(curve.last._4 > curve.head._4, "candidate stream must grow with bands")
    assert(curve.last._7 < curve.head._7,
      s"precision must fall across the sweep: ${curve.map(_._7)}")
    assert(curve.last._6 >= curve.head._6, "recall cannot fall with more bands")
    // the at-scale parameterization (d51's (keep, mod) sample) drives
    // the same machinery: smaller truth universe, full sweep intact
    val half = graft.dedup.Dedup.d53CurveWith(spark, sfDir, 1, 2)
      .as[(Int, Int, Long, Long, Long, Double, Double)].collect().toSeq
    assert(half.map(_._1) == Seq(1, 2, 4, 8))
    assert(half.head._3 < curve.head._3, "sampled truth universe must shrink")
  }

  test("d54 overlap matrix: every cell mirrors an in-memory recompute; error in band") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("d54_overlap_matrix")(spark, sfDir)
      .as[(Int, Int, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      (for { i <- 0 until 4; j <- i + 1 until 4 } yield (i, j)),
      "one row per unordered pair, ordered")
    // exact legs mirror the in-memory gram sets, cell for cell
    val grams = graft.dedup.Dedup.d52Grams(spark, sfDir)
      .as[(Long, Long)].collect()
    val sets = (0 until 4).map(c => grams.filter(_._1 % 4 == c).map(_._2).toSet)
    got.foreach { r =>
      val (a, b) = (sets(r._1), sets(r._2))
      assert(r._3 == a.size && r._4 == b.size, s"set sizes off in $r")
      assert(r._5 == (a & b).size && r._6 == (a | b).size, s"overlap off in $r")
      assert(r._7 == r._5 * 10000 / r._6 && r._8 == r._5 * 10000 / r._4,
        s"integer metrics off in $r")
      // KMV mirror: bottom-k of each set, exact set algebra
      val (ka, kb) = (a.toSeq.sorted.take(512).toSet, b.toSeq.sorted.take(512).toSet)
      val ku = (ka ++ kb).toSeq.sorted.take(512).toSet
      val m = ku.count(g => ka(g) && kb(g))
      assert(r._9 == m && r._10 == ku.size, s"KMV legs off in $r")
      // honest error: the estimate sits within the d52 band
      assert(r._12 <= 300, s"err_bp ${r._12} out of band in $r")
    }
    // the matrix answers the merge-planning question: overlap varies
    // across pairs (a constant matrix would be vacuous)
    assert(got.map(_._7).distinct.size > 1, "jaccard constant across pairs")
  }

  test("d52 corpus overlap: metrics mirror, KMV estimator law, honest error band") {
    val sfDir = "/root/testdata/sf0.001"
    val row = SparkEntry.queries("d52_corpus_overlap")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    val (na, nb, inter, uni, jbp, cbp, km, kk, kjbp, ebp) = row
    // exact legs mirror an in-memory gram-set computation
    val grams = graft.dedup.Dedup.d52Grams(spark, sfDir)
      .as[(Long, Long)].collect()
    val aSet = grams.filter(_._1 % 2 == 0).map(_._2).toSet
    val bSet = grams.filter(_._1 % 2 != 0).map(_._2).toSet
    assert(na == aSet.size && nb == bSet.size)
    assert(inter == (aSet & bSet).size && uni == (aSet | bSet).size)
    assert(jbp == inter * 10000 / uni && cbp == inter * 10000 / nb)
    // the KMV estimator mirrors Broder's MinK construction exactly:
    // union sketch from the two sketches == from the full union (the
    // q68 bottom-k merge law), matches counted against both sketches
    val k = graft.dedup.Dedup.d52K
    val sa = aSet.toSeq.sorted.take(k).toSet
    val sb = bSet.toSeq.sorted.take(k).toSet
    val su = (sa | sb).toSeq.sorted.take(k)
    val suFull = (aSet | bSet).toSeq.sorted.take(k)
    assert(su == suFull, "bottom-k merge law broken on gram sets")
    assert(km == su.count(g => sa(g) && sb(g)) && kk == su.size)
    assert(kjbp == km * 10000 / kk && ebp == math.abs(kjbp - jbp))
    // the estimate is alive and inside its statistical band on the
    // gate corpus (measured err 47 bp at sf0.001, 22 bp at sf0.1
    // against J ≈ 300/993 bp)
    assert(km > 0, "degenerate sketch: no shared grams sampled")
    assert(ebp <= 300, s"KMV error $ebp bp outside the contract band")
  }

  test("d55 canonical dedup: in-memory mirror; t30's score would keep the damaged copy (the pinned finding)") {
    import org.apache.spark.sql.functions._
    val D = graft.dedup.Dedup
    val got = SparkEntry.queries("d55_canonical_dedup")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // full in-memory mirror: plant, normalize-fingerprint, argmin
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect()
    val all = docs ++ docs
      .filter(d => d._1 % D.d55RecrawlMod == 0 && d._2.contains(" "))
      .map { case (id, t) => (-(id + 1), t.replace(" ", "  ")) }
    def fp(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val mirror = all.groupBy { case (_, t) => fp(t) }.toSeq.map {
      case (f, members) =>
        val (kid, klen) = members
          .map { case (id, t) => (id, t.length.toLong) }
          .minBy { case (id, l) => (l, id) }
        (f, kid, members.map(_._1).min, members.size.toLong, klen)
    }.sortBy(_._1)
    assert(got == mirror, "d55 != in-memory mirror")
    // the honest finding that justifies byte-minimality over a
    // quality argmax: t30's composite score PREFERS the
    // token-inflated mangled copy on most planted clusters (its
    // length-cap term rewards padding) — measured, not assumed
    val T = graft.text.TextOps
    val qbp = D.d55Corpus(spark, sfDir)
      .select(col("doc_id"), T.fingerprint(col("text")).as("f"),
        T.qualityScoreBp(split(col("text"), " ")).as("q"))
      .as[(Long, String, Int)].collect()
      .groupBy(_._2).values.filter(_.length > 1)
    val mangledWins = qbp.count(c => c.maxBy(m => (m._3, m._1))._1 < 0)
    assert(mangledWins > 0,
      "expected t30's score to prefer the damaged copy somewhere — " +
        "if this now fails, the keep-best-by-quality variant became viable")
  }
}
