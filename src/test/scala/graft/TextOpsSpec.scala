package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Behavioral specs for the text-analysis ops on handcrafted docs
  * (the oracle gate covers the sf0.01 corpus; these pin semantics). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("xx"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t29 langid picks the language with most stopword hits, und on none") {
    val dir = docsOf(
      1L -> "the cat and the dog is a pet",
      2L -> "el perro de la casa que ladra",
      3L -> "der hund und die katze das haus",
      4L -> "zzz qqq www")
    val out = TextOps.t29LangId(spark, dir)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
    assert(out(4L) == "und")
  }

  test("t30 quality: ratios computed over whitespace tokens") {
    val dir = docsOf(1L -> "the the the the") // 4 tokens, 1 distinct, all stopwords
    val r = TextOps.t30Quality(spark, dir).collect()(0)
    assert(r.getAs[Int]("n_words") == 4)
    assert(math.abs(r.getAs[Double]("distinct_ratio") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("stop_ratio") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_word_len") - 3.0) < 1e-9)
  }

  test("t31 tokens: ws vs regex vs subword estimate") {
    val dir = docsOf(1L -> "abc de12 :: 9") // ws=4; [a-z0-9]+ → abc, de12, 9 → wait: de, 12 split? no: [a-z0-9]+ matches 'de12' as one
    val r = TextOps.t31Tokens(spark, dir).collect()(0)
    assert(r.getAs[Int]("ws_tokens") == 4)
    assert(r.getAs[Int]("regex_tokens") == 3) // "abc", "de12", "9"
    assert(r.getAs[Long]("est_subwords") == math.ceil(13 / 4.0).toLong)
  }

  test("t32 fingerprint is invariant to case and extra whitespace") {
    val dir = docsOf(1L -> "Hello   World", 2L -> "hello world")
    val fps = TextOps.t32Fingerprint(spark, dir)
      .select("fingerprint").as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("t35 repetition: degenerate, healthy, and bigram-loop docs get the right stats and verdict") {
    val dir = docsOf(
      1L -> "a a a a a a a a a a",              // one token repeated 10×
      2L -> "q w e r t y u i o p",              // 10 distinct tokens, unique bigrams
      3L -> "x y x y x y x y x y x y")          // 2-token loop: top bigram dominates
    val out = TextOps.t35Repetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val d1 = out(1L) // n=10, max_tok=10, bigrams: "a a"×9 → all dup
    assert(d1.getAs[Int]("n_tokens") == 10)
    assert(d1.getAs[Int]("top_token_bp") == 10000)
    assert(d1.getAs[Int]("top_bigram_bp") == 10000)
    assert(d1.getAs[Int]("dup_bigram_bp") == 10000)
    assert(d1.getAs[Boolean]("repetitive"))

    val d2 = out(2L) // max_tok=1 → 1000bp; 9 unique bigrams → 1/9 = 1111bp
    assert(d2.getAs[Int]("top_token_bp") == 1000)
    assert(d2.getAs[Int]("top_bigram_bp") == 1111)
    assert(d2.getAs[Int]("dup_bigram_bp") == 0)
    // the short-doc artifact must NOT trip the gate: all-unique
    // bigrams in a 10-token doc sit just under the 1200bp threshold
    assert(!d2.getAs[Boolean]("repetitive"))

    val d3 = out(3L) // 12 tokens; bigrams: "x y"×6, "y x"×5 → all dup
    assert(d3.getAs[Int]("n_tokens") == 12)
    assert(d3.getAs[Int]("top_token_bp") == 5000)          // 6/12
    assert(d3.getAs[Int]("top_bigram_bp") == 5455)         // 6/11
    assert(d3.getAs[Int]("dup_bigram_bp") == 10000)        // 11/11
    assert(d3.getAs[Boolean]("repetitive"))
  }

  /** The 28-bit uniform draw t36 derives in-engine, recomputed
    * independently on the JVM so the spec would catch a dialect slip
    * in EITHER the Spark conv() path or the DuckDB hex-cast path. */
  private def md5Draw(id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(7), 16)

  test("t36 sampling: the hash draw matches an independent md5, rates select exactly the expected docs") {
    val langs = Seq("en", "es", "de", "ja")
    val dir = java.nio.file.Files.createTempDirectory("graftdocs").toString
    (1L to 400L).map(i => (i, s"doc body $i", langs((i % 4).toInt)))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def threshold(lang: String): Long = lang match {
      case "en"        => 1L << 27 // 1/2
      case "es" | "fr" => 1L << 26 // 1/4
      case "de"        => 1L << 25 // 1/8
      case _           => 1L << 24 // 1/16
    }
    val expected = (1L to 400L)
      .filter(i => md5Draw(i) < threshold(langs((i % 4).toInt)))
      .map(i => i -> md5Draw(i)).toMap

    val out = TextOps.t36Sample(spark, dir)
      .select("doc_id", "sample_key").as[(Long, Long)].collect().toMap
    assert(out == expected,
      s"survivor set mismatch: got ${out.keySet}, want ${expected.keySet}")
  }

  test("t36 sampling is deterministic and stable under repartitioning") {
    val a = TextOps.t36Sample(spark, sfDir).select("doc_id").as[Long].collect().sorted
    val b = TextOps.t36Sample(spark, sfDir).repartition(7)
      .select("doc_id").as[Long].collect().sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("t37 two-phase bucketed cumsum selects exactly the naive single-window prefix") {
    // the naive formulation: ONE window per language — correct but a
    // single sorted task per language at corpus scale. t37's bucketed
    // decomposition must be row-identical to it.
    val naive = {
      val base = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        md5(col("doc_id").cast("string").cast("binary")).as("priority"))
      val w = Window.partitionBy("lang").orderBy("priority", "doc_id")
      base.withColumn("cum_tokens", sum("ws_tokens").over(w))
        .filter(col("cum_tokens") <= TextOps.tokenBudget)
        .select("lang", "doc_id", "ws_tokens", "cum_tokens")
        .as[(String, Long, Long, Long)].collect().toSet
    }
    val out = TextOps.t37TokenBudget(spark, sfDir)
      .select("lang", "doc_id", "ws_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == naive)
  }

  test("t37 selection is partial for every language (the budget actually binds)") {
    val selected = TextOps.t37TokenBudget(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = Tables.documents(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(selected.nonEmpty)
    selected.foreach { case (lang, n) =>
      assert(n < totals(lang),
        s"budget must exclude some $lang docs, kept $n of ${totals(lang)}")
      assert(n > 0)
    }
    // every language present in the corpus gets a non-empty slice
    assert(selected.keySet == totals.keySet)
  }

  test("t38 keyphrase: hand-computed tf-idf scores, ranks, and tie-break") {
    val dir = docsOf(
      1L -> "a b a b c", // bigrams: "a b"×2, "b a", "b c"; n_grams 4
      2L -> "x y x")     // bigrams: "x y", "y x"; n_grams 2
    // N=2; every bigram has df=1
    val out = TextOps.t38Keyphrase(spark, dir)
      .select("doc_id", "rk", "keyphrase", "score_bp")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 1, "a b", 10000), // 2·10000·2/(4·1)
      (1L, 2, "b a", 5000),  // 1·10000·2/(4·1)
      (1L, 3, "b c", 5000),  // tie with "b a" → gram asc puts "b a" first
      (2L, 1, "x y", 10000), // 1·10000·2/(2·1); tie → gram asc
      (2L, 2, "y x", 10000))) // only 2 bigrams → no rk 3 row
  }

  test("t39 bigram LM: hand-computed smoothed transition ppm and per-doc rollup") {
    val dir = docsOf(
      1L -> "a b a b", // bigrams: "a b", "b a", "a b"
      2L -> "a b c",   // bigrams: "a b", "b c"
      3L -> "z")       // no bigrams: passes through unflagged
    // V = {a,b,c,z} = 4; c12: (a,"a b")=3, (b,"b a")=1, (b,"b c")=1
    // c1: a=3, b=2
    // ppm("a b") = 4e6/(3+4) = 571428.57 → 571428
    // ppm("b a") = 2e6/(2+4) = 333333.33 → 333333; ppm("b c") same
    val out = TextOps.t39BigramLm(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      // doc1: sum=571428+333333+571428=1476189, avg=floor(492063+0.5)
      (1L, 3L, Some(492063L), Some(333333L), false),
      // doc2: sum=571428+333333=904761, avg=floor(452380.5+0.5)
      (2L, 2L, Some(452381L), Some(333333L), false),
      (3L, 0L, None, None, false)))
  }

  test("t39 flags the unpredictable-transition tail and not the predictable mass") {
    // 50 boilerplate docs make context 'a' common; doc 51's sole
    // transition out of 'a' is unique → low smoothed probability
    val rows = (1L to 50L).map(i => i -> "a b a b a b") :+ (51L -> "a x")
    val dir = docsOf(rows: _*)
    // c12(a,"a x")=1, c1(a)=151, V={a,b,x}=3 → 2e6/154 = 12987.01
    val out = TextOps.t39BigramLm(spark, dir)
      .select("doc_id", "avg_ppm", "low_quality")
      .as[(Long, Option[Long], Boolean)].collect()
    val flagged = out.filter(_._3).map(_._1).toSet
    assert(flagged == Set(51L))
    assert(out.find(_._1 == 51L).get._2.contains(12987L))
  }

  test("t40 pipeline equals the composition of its component operators") {
    // independently run t30/t35/t34/t36 and replay the chain driver-
    // side; the fused single-plan pipeline must select the same docs
    val quality = TextOps.t30Quality(spark, sfDir)
      .select("doc_id", "quality_score_bp").as[(Long, Int)].collect().toMap
    val repetitive = TextOps.t35Repetition(spark, sfDir)
      .select("doc_id", "repetitive").as[(Long, Boolean)].collect().toMap
    val clean = TextOps.t34Scrub(spark, sfDir)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    val sampled = TextOps.t36Sample(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val gated = clean.keySet
      .filter(id => quality(id) >= TextOps.t40QualityMinBp && !repetitive(id))
    val kept = gated.groupBy(clean).values.map(_.min).toSet
    val expected = kept.filter(sampled)
    val out = TextOps.t40Pipeline(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(out == expected)
    assert(out.nonEmpty && out.size < clean.size,
      "every gate must bind: some docs dropped, some kept")
  }

  test("t40 pipeline: every stage bites on a corpus built to trigger each gate") {
    // The crafted victims sit at ids that PASS the 1/16 hash draw
    // (27, 59, 60, 63 — verified below), so each one's absence from
    // the output is attributable to exactly the stage under test,
    // not to sampling. Fillers are healthy: 13 distinct words,
    // unique last token, no digits so the scrub can't merge them.
    val draw = (1L << 24) // docsOf writes lang 'xx' → 1/16 rate
    val victims = Set(27L, 59L, 60L, 63L)
    victims.foreach(i => assert(md5Draw(i) < draw,
      s"victim id $i must pass the sample draw"))
    val filler = (1L to 200L).filterNot(victims).map(i =>
      i -> s"kilo lima mike november oscar papa quebec romeo sierra tango uniform victor ${"z" * i.toInt}")
    val fiftyTokens = (0 until 50)
      .map(k => s"${('a' + k / 26).toChar}${('a' + k % 26).toChar}").mkString(" ")
    val dupBase = "mono duo tri tetra penta hexa hepta octa nona deca ennea dodeca"
    val dir = docsOf(filler ++ Seq(
      // quality gate: 4 tokens, 1 distinct, all stopwords → 950 bp
      27L -> "the the the the",
      // repetition gate: healthy quality (8560 bp: 100 tokens, 52
      // distinct, no stopwords) but one bigram repeated 25× →
      // dup-bigram mass 4949 bp > 2500
      59L -> (fiftyTokens + " " + Seq.fill(25)("rr ss").mkString(" ")),
      // exact-dup pair modulo scrub: differ only in digits/punctuation;
      // keep-min keeps 60, dedup drops 63
      60L -> (dupBase + " 123"),
      63L -> (dupBase + " 456!")): _*)
    val out = TextOps.t40Pipeline(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val expected = (1L to 200L)
      .filter(i => !Set(27L, 59L, 63L)(i) && md5Draw(i) < draw).toSet
    assert(out == expected)
    assert(out.contains(60L), "the canonical twin must survive the whole chain")
    assert(!out.contains(27L), "quality gate must bite")
    assert(!out.contains(59L), "repetition gate must bite")
    assert(!out.contains(63L), "dedup must drop the non-canonical twin")
    // sampling bites too: healthy fillers that fail the draw
    assert((1L to 200L).exists(i => !victims(i) && md5Draw(i) >= draw))
  }

  test("t43 detects and redacts planted + in-text PII with pinned counts and order") {
    // doc 1: no planted PII (1 % 5/7/11 all nonzero) — only the
    // in-text occurrences count; doc 0: all three planted forms
    val dir = docsOf(
      0L -> "clean words only",
      1L -> "write bob@test.org or ping 1.2.3.4 soon",
      2L -> "a@1.2.3.4.com")
    val out = TextOps.t43Pii(spark, dir)
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted_text")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0 gets user0@example.com, 10.0.0.0, +15550000000 planted
    assert(out(0L)._2 == 1 && out(0L)._3 == 1 && out(0L)._4 == 1)
    assert(out(0L)._5 ==
      "clean words only contact <EMAIL> now from <IP> logged call <PHONE> soon")
    assert(out(1L)._2 == 1 && out(1L)._3 == 0 && out(1L)._4 == 1)
    assert(out(1L)._5 == "write <EMAIL> or ping <IP> soon")
    // redaction-order pin: a host that LOOKS like an IP inside an
    // email address is consumed by the email pass first — one
    // <EMAIL>, no partial <IP> splice; the count columns audit raw
    // pattern occurrences BEFORE redaction, so n_ips still sees it
    assert(out(2L)._5 == "<EMAIL>")
    assert(out(2L)._2 == 1 && out(2L)._4 == 1)
  }

  test("t41 chunks tile every document: full coverage, correct overlap, exact texts") {
    val out = TextOps.t41Chunk(spark, sfDir)
      .select("doc_id", "chunk_idx", "start_tok", "chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect()
      .groupBy(_._1)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet == docs.keySet, "one chunk set per document")
    out.foreach { case (id, chunks) =>
      val toks = docs(id).split(" ", -1)
      val sorted = chunks.sortBy(_._2)
      // starts advance by exactly the stride from zero
      assert(sorted.map(_._3).toSeq ==
        sorted.indices.map(_ * TextOps.chunkStride))
      // every chunk is the exact token slice it claims
      sorted.foreach { case (_, _, start, n, text) =>
        assert(n == math.min(TextOps.chunkSize, toks.length - start))
        assert(text == toks.slice(start, start + n).mkString(" "), s"doc $id @$start")
      }
      // coverage: the last chunk reaches the document's end
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN == toks.length)
      assert(lastStart < toks.length, "no empty trailing chunk")
    }
  }

  test("t42 two-phase packed layout equals the naive single-window cumsum exactly") {
    // same decomposition-vs-naive pin as t37, with the bucket a
    // prefix of the (lang, doc_id) order key
    val naive = {
      val base = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      base.withColumn("cum_before", coalesce(sum("ws_tokens").over(w), lit(0L)))
        .select("lang", "doc_id", "ws_tokens", "cum_before")
        .as[(String, Long, Long, Long)].collect().toSet
    }
    val out = TextOps.t42Pack(spark, sfDir)
      .select("lang", "doc_id", "ws_tokens", "cum_before")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == naive)
  }

  test("t42 window assignment is consistent: bins advance monotonically and split at the budget") {
    val rows = TextOps.t42Pack(spark, sfDir)
      .select("lang", "doc_id", "ws_tokens", "cum_before", "bin_id", "bin_offset")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    rows.foreach { case (lang, docs) =>
      val sorted = docs.sortBy(_._2)
      // the packed stream is gapless: each doc starts where the
      // previous one ended
      sorted.sliding(2).foreach {
        case Array((_, _, n0, c0, _, _), (_, _, _, c1, _, _)) =>
          assert(c1 == c0 + n0, s"$lang stream must be gapless")
        case _ =>
      }
      sorted.foreach { case (_, id, _, cum, bin, off) =>
        assert(bin == cum / TextOps.packBudget, s"doc $id bin")
        assert(off == cum % TextOps.packBudget, s"doc $id offset")
      }
      // the corpus actually spans multiple context windows
      assert(sorted.last._5 > 0, s"$lang must fill more than one window")
    }
  }

  test("t44 vocab: hand-computed frequencies, ranks, doc freq, and ppm coverage") {
    val dir = docsOf(
      1L -> "a a a b b c",   // a:3 b:2 c:1
      2L -> "a b d",         // a:1 b:1 d:1
      3L -> "a")             // a:1
    // totals: a=5(3 docs) b=3(2) c=1(1) d=1(1); 10 tokens overall
    val got = TextOps.t44Vocab(spark, dir)
      .as[(String, Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1, 5L, 3L, 500000L, 500000L),
      ("b", 2, 3L, 2L, 300000L, 800000L),
      ("c", 3, 1L, 1L, 100000L, 900000L),   // freq tie c<d broken by token
      ("d", 4, 1L, 1L, 100000L, 1000000L)), s"got $got")
  }

  test("t45 vocab-apply: hand-computed ids in position order, OOV past top-V, exact ppm") {
    // 121 distinct tokens: "common" (freq 3) ranks 1; t001..t120
    // (freq 1 each) tie-break by token asc, so t001..t099 take ranks
    // 2..100 and t100..t120 fall OUT of the top-100 vocab → id 0
    val longDoc = (1 to 120).map(i => f"t$i%03d").mkString(" ")
    val dir = docsOf(
      1L -> "common common common",
      2L -> longDoc)
    val gotById = TextOps.t45VocabApply(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(gotById(1L) == ((1L, 3L, 0L, 0L, "1,1,1")), s"got ${gotById(1L)}")
    val expIds = ((2 to 100).map(_.toString) ++ Seq.fill(21)("0")).mkString(",")
    assert(gotById(2L) == ((2L, 120L, 21L, 175000L, expIds)), s"got ${gotById(2L)}")
  }

  test("t44 vocab caps the report at top-V and keeps cumulative coverage monotone") {
    val vocab = TextOps.t44Vocab(spark, sfDir)
      .as[(String, Int, Long, Long, Long, Long)].collect().toSeq
    assert(vocab.nonEmpty && vocab.size <= TextOps.t44TopV)
    assert(vocab.map(_._2) == (1 to vocab.size), "ranks contiguous")
    assert(vocab.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "freq non-increasing in rank order")
    assert(vocab.map(_._6).sliding(2).forall(p => p.head <= p.last),
      "cumulative coverage monotone")
    assert(vocab.last._6 <= 1000000L, "coverage cannot exceed 100%")
  }

  test("t46 gopher rules: each rule rejects its designed offender and passes the healthy doc") {
    // one healthy doc and one offender per rule; filler keeps the
    // healthy/offender word counts inside [50, 100000] except for
    // the word-count offender itself
    val healthy = (Seq("the", "and", "of") ++
      (1 to 57).map(i => s"word$i")).mkString(" ") // 60 words, mwl ok
    val short = "the and tiny doc" // 4 words -> rule_wc fails
    val longWords = (Seq("the", "and") ++
      (1 to 58).map(i => "x" * 20 + i)).mkString(" ") // mwl > 10
    val numeric = (Seq("the", "and") ++
      (1 to 58).map(_.toString)).mkString(" ") // 2/60 alphabetic < 80%
    val noStops = (1 to 60).map(i => s"term$i").mkString(" ") // 0 required stopwords
    val dir = docsOf(1L -> healthy, 2L -> short, 3L -> longWords,
      4L -> numeric, 5L -> noStops)
    val res = graft.text.TextOps.t46GopherRules(spark, dir)
      .select("doc_id", "rule_wc", "rule_mwl", "rule_alpha", "rule_stop", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(res(1L) == ((1L, true, true, true, true, true)), "healthy doc keeps")
    assert(!res(2L)._2 && !res(2L)._6, "short doc fails word count")
    assert(res(3L)._2 && !res(3L)._3 && !res(3L)._6, "long words fail mean length only on that rule")
    assert(res(4L)._2 && !res(4L)._4 && !res(4L)._6, "numeric doc fails alpha ratio")
    assert(res(5L)._2 && res(5L)._3 && res(5L)._4 && !res(5L)._5 && !res(5L)._6,
      "stopword-free doc fails only the stopword rule")
  }

  test("t47 cdc chunks tile every document and chunk keys fingerprint content") {
    val chunks = graft.text.TextOps.t47CdcChunk(spark, sfDir)
      .select("doc_id", "chunk_i", "n_tokens", "chunk_key", "chunk_text")
      .as[(Long, Int, Int, String, String)].collect()
    assert(chunks.nonEmpty)
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to cs.length).toSeq, s"chunk ids for $id")
      assert(sorted.map(_._5).mkString(" ") == texts(id),
        s"chunks must tile doc $id exactly")
      assert(sorted.map(_._3).sum == texts(id).split(" ").length,
        s"token counts must sum to doc $id's length")
      sorted.foreach(c => assert(c._3 == c._5.split(" ").length))
    }
    assert(chunks.groupBy(_._1).values.exists(_.length >= 2),
      "content boundaries must actually fire at this SF")
    // identical content -> identical key, regardless of position
    chunks.groupBy(_._4).values.foreach { same =>
      assert(same.map(_._5).distinct.length == 1, "one key, one content")
    }
  }

  test("t47 cdc chunking is shift-resistant: chunks after the first survive a prepended token") {
    // pick a real multi-chunk doc, prepend one token, re-chunk: every
    // chunk after the original first must be byte-identical — the
    // property that makes CDC dedup-stable where fixed-stride
    // chunking (t41) shifts everything downstream
    val orig = graft.text.TextOps.t47CdcChunk(spark, sfDir)
      .select("doc_id", "chunk_i", "chunk_text")
      .as[(Long, Int, String)].collect()
    val multi = orig.groupBy(_._1).filter(_._2.length >= 2)
    assert(multi.nonEmpty, "need a multi-chunk doc at this SF")
    val (docId, cs) = multi.minBy(_._1)
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === docId).select("text").as[String].head()
    val dir = docsOf(1L -> ("prepended " + text))
    val mod = graft.text.TextOps.t47CdcChunk(spark, dir)
      .select("chunk_i", "chunk_text").as[(Int, String)].collect()
      .sortBy(_._1).map(_._2)
    val tail = cs.sortBy(_._2).map(_._3).drop(1)
    assert(mod.takeRight(tail.length).toSeq == tail.toSeq,
      "all chunks after the first must survive the shift byte-identically")
  }

  test("t48 mixture resample: thresholds and kept set match an exact in-memory recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val target = Map("en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
      "fr" -> 150000L, "zh" -> 150000L)
    val cnt = docs.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    val out = docs.length.toLong / 2
    def thr(l: String): Long = math.min(1L << 28,
      (268435456L * target.getOrElse(l, 0L) * out) / (1000000L * cnt(l)))
    def draw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString.take(7), 16)
    }
    val expected = docs.filter { case (id, l) => draw(id) < thr(l) }
      .map(_._1).toSet
    val got = graft.text.TextOps.t48MixtureResample(spark, sfDir)
      .select("doc_id", "lang", "keep_threshold")
      .as[(Long, String, Long)].collect()
    assert(got.map(_._1).toSet == expected, "kept set must match the exact recompute")
    got.foreach { case (_, l, t) => assert(t == thr(l), s"threshold for $l") }
    // the mixture moves TOWARD the target: overrepresented en keeps a
    // smaller fraction than underrepresented languages
    val keptByLang = got.groupBy(_._2).map { case (l, r) => l -> r.length.toDouble }
    val keepRate = keptByLang.map { case (l, k) => l -> k / cnt(l) }
    assert(keepRate("en") < keepRate("zh"),
      s"en (overrepresented) must be downsampled harder: $keepRate")
    assert(got.nonEmpty && got.length < docs.length, "a real subsample")
  }

  test("t46 gopher verdict is non-vacuous on the corpus and counts are integer-consistent") {
    val rows = graft.text.TextOps.t46GopherRules(spark, sfDir)
      .select("doc_id", "n_words", "word_chars", "alpha_words", "req_stops", "keep")
      .as[(Long, Int, Int, Int, Int, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_._6) && rows.exists(!_._6),
      "both keep outcomes must occur or the gate is vacuous")
    rows.foreach { case (id, n, wc, alpha, stops, _) =>
      assert(n >= 1 && wc >= n && alpha <= n, s"doc $id count sanity")
      assert(stops >= 0 && stops <= 6, s"doc $id required-stopword count bounded by list size")
    }
  }

  test("t49 classifier matches an independent JVM mirror of hash->bucket->fold on handcrafted docs") {
    // Independent implementation path: java MessageDigest for the
    // md5, the same %.17g-parsed weights, an explicit sequential
    // fold — none of Spark's md5/conv/aggregate machinery. If
    // tokenization, hex slicing, bucket arithmetic, pooling order,
    // or the decision threshold drift, this disagrees.
    val w = TextOps.t49WeightStrs.map(_.toDouble).toArray
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7)
      (java.lang.Long.parseLong(hex, 16) % w.length).toInt
    }
    def logitOf(text: String): Double = {
      val toks = text.split(" ", -1) // split(c," ") keeps empties
      val grams = toks.dropRight(1).zip(toks.drop(1)).map(p => s"${p._1} ${p._2}")
      val su = toks.foldLeft(0.0)((a, t) => a + w(bucket(t)))
      val sb = grams.foldLeft(0.0)((a, g) => a + w(bucket(g)))
      (su + sb) / (toks.length + grams.length)
    }
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a", // single token: zero bigrams, denominator stays 1
      3L -> "data data data data data", // repeated token, repeated bigram
      4L -> "exact arithmetic keeps engines honest across scales")
    val dir = docsOf(texts: _*)
    val out = SparkEntry.queries("t49_quality_classifier")(spark, dir)
      .select("doc_id", "n_feats", "logit", "keep")
      .as[(Long, Int, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    texts.foreach { case (id, text) =>
      val exp = logitOf(text)
      val nToks = text.split(" ", -1).length
      val (nf, lg, keep) = out(id)
      assert(nf == 2 * nToks - 1, s"doc $id n_feats = unigrams + bigrams")
      assert(math.abs(lg - math.rint(exp * 1e4) / 1e4) < 1e-12 ||
        math.abs(lg - exp) < 5e-5, s"doc $id logit $lg vs mirror $exp")
      assert(keep == (exp >= 0.0), s"doc $id keep decision")
    }
  }

  test("t51 bpe merges equal an independent in-memory greedy trainer") {
    val got = SparkEntry.queries("t51_bpe_merges")(spark, sfDir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got.length == TextOps.t51Rounds)
    // independent reference: plain-Scala greedy BPE over the
    // collected corpus — same split (limit -1 keeps trailing
    // empties, matching SQL split), same (count desc, lexicographic)
    // argmax, same greedy left fold
    var corpus = Tables.documents(spark, sfDir).select("text").as[String]
      .collect().toVector.map(_.split(" ", -1).toVector)
    val expected = (0 until TextOps.t51Rounds).map { round =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      corpus.foreach { t =>
        var i = 0
        while (i + 1 < t.length) {
          val k = (t(i), t(i + 1)); counts(k) = counts.getOrElse(k, 0L) + 1; i += 1
        }
      }
      val ((l, r), c) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      corpus = corpus.map(_.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (acc.last + " " + x)
        else acc :+ x
      })
      (round, l, r, c)
    }
    assert(got == expected,
      s"merge table diverged: got=$got expected=$expected")
    // the reference fold must itself exhibit the greedy self-pair
    // law the scaladoc claims (aaa -> [aa, a]) — guards the spec's
    // own oracle against a broken rewrite
    val self = Vector("a", "a", "a").foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == "a" && x == "a") acc.init :+ (acc.last + " " + x)
      else acc :+ x
    }
    assert(self == Vector("a a", "a"))
  }

  test("t57 batched merges equal t51's sequential table even when no pass can batch") {
    // sf0.001's pair distribution is flat with a head conflict
    // ((order,order) right-collides with (order,fast)), so EVERY
    // pass here degrades to the top-1 fallback — the boundary the
    // dominance rule must get right: identical table, zero drift.
    // (At sf0.01, the gate's SF, the same rule batches all 6 merges
    // into ONE pass and the t51Sql oracle pins byte-exactness; the
    // planted test below pins a mid-size batch with pass structure.)
    val batched = TextOps.t57TrainBatched(spark, sfDir)
    val got = batched.map { case (round, _, l, r, c) => (round, l, r, c) }
    val seq = SparkEntry.queries("t51_bpe_merges")(spark, sfDir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == seq, s"batched table diverged from sequential:\n$got\n$seq")
  }

  test("t57 dominance rule survives the case naive disjoint batching gets wrong") {
    // counts: (x,a)=5, (a,b)=5, (c,d)=3. Sequential: round0 (a,b)
    // (lex tiebreak), round1 the NEW pair (x,'a b')=5 — which beats
    // the token-disjoint (c,d)=3 a naive batcher would have taken
    // in pass 0 — round2 (c,d). The cStop guard forces pass 0 down
    // to top-1, then pass 1 batches rounds 1+2 soundly.
    val dir = docsOf((1L to 5L).map(i => i -> "x a b") ++
      Seq(6L -> "c d", 7L -> "c d", 8L -> "c d"): _*)
    val batched = TextOps.t57TrainBatched(spark, dir, totalMerges = 3)
    assert(batched == Seq(
      (0, 0, "a", "b", 5L),
      (1, 1, "x", "a b", 5L),
      (2, 1, "c", "d", 3L)), s"got $batched")
    // pin the exact sequential table too (guards the test's own
    // expectation): in-memory mirror, same argmax, same greedy fold
    var corpus = Vector.fill(5)(Vector("x", "a", "b")) ++
      Vector.fill(3)(Vector("c", "d"))
    val expected = (0 until 3).map { round =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      corpus.foreach { t =>
        t.sliding(2).filter(_.length == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + 1 }
      }
      val ((l, r), c) = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
      corpus = corpus.map(_.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (acc.last + " " + x)
        else acc :+ x
      })
      (round, l, r, c)
    }
    assert(batched.map(b => (b._1, b._3, b._4, b._5)) == expected,
      s"batched $batched vs sequential mirror $expected")
    // and the amortization shape: 2 passes for 3 merges
    assert(batched.map(_._2) == Seq(0, 1, 1), s"pass ids ${batched.map(_._2)}")
  }

  test("t57SelectBatch: conflict stop, strict-dominance truncation, top-1 fallback, cap") {
    def p(l: String, r: String, c: Long) = (l, r, c)
    // conflict ((e,a) right==a==first left) stops the scan; the
    // accepted (a,b),(c,d) survive only while count > cStop=4
    assert(TextOps.t57SelectBatch(
      Seq(p("a", "b", 9), p("c", "d", 5), p("e", "a", 4), p("f", "g", 3)),
      exhaustive = true, maxN = 8) == Seq(p("a", "b", 9), p("c", "d", 5)))
    // tie at the boundary: accepted count == cStop is NOT strictly
    // dominant → truncated; fallback ships top-1
    assert(TextOps.t57SelectBatch(
      Seq(p("a", "b", 5), p("e", "a", 5)),
      exhaustive = true, maxN = 8) == Seq(p("a", "b", 5)))
    // exhaustive conflict-free scan keeps equal-count prefixes whole
    assert(TextOps.t57SelectBatch(
      Seq(p("a", "b", 5), p("c", "d", 5), p("e", "f", 5)),
      exhaustive = true, maxN = 8).length == 3)
    // the same scan NON-exhaustive must assume a conflicting tail at
    // count 5 → nothing strictly dominates → top-1 fallback
    assert(TextOps.t57SelectBatch(
      Seq(p("a", "b", 5), p("c", "d", 5), p("e", "f", 5)),
      exhaustive = false, maxN = 8) == Seq(p("a", "b", 5)))
    // sharing a LEFT or RIGHT token is count-invariant and batches
    assert(TextOps.t57SelectBatch(
      Seq(p("a", "b", 9), p("a", "c", 5), p("d", "b", 4)),
      exhaustive = true, maxN = 8).length == 3)
    // maxN caps the batch
    assert(TextOps.t57SelectBatch(
      Seq(p("a", "b", 9), p("c", "d", 8), p("e", "f", 7)),
      exhaustive = true, maxN = 2) == Seq(p("a", "b", 9), p("c", "d", 8)))
  }

  test("t58 ccnet buckets: exact terciles per language, rank-monotone, t39-consistent") {
    val out = SparkEntry.queries("t58_ccnet_buckets")(spark, sfDir)
      .as[(Long, String, Long, Int, String)].collect()
    val t39 = SparkEntry.queries("t39_bigram_lm")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out.length == t39.size, "every doc bucketed exactly once")
    out.foreach { case (id, _, fl, _, _) =>
      assert(fl == t39(id), s"doc $id fluency $fl != t39 avg_ppm ${t39(id)}")
    }
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val n = rows.length
      // ranks are an exact 1..n permutation, fluency non-increasing
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to n), s"$lang rank permutation")
      byRank.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0)._3 >= w(1)._3, s"$lang fluency order")
      }
      // exact floor-division tercile quotas
      val sizes = rows.groupBy(_._5).view.mapValues(_.length).toMap
      assert(sizes.getOrElse("head", 0) == n / 3, s"$lang head quota")
      assert(sizes.getOrElse("middle", 0) == 2 * n / 3 - n / 3, s"$lang middle quota")
      assert(sizes.getOrElse("tail", 0) == n - 2 * n / 3, s"$lang tail quota")
      // bucket is a pure function of rank
      byRank.foreach { case (_, _, _, r, b) =>
        val want = if (r <= n / 3) "head" else if (r <= 2 * n / 3) "middle" else "tail"
        assert(b == want, s"$lang rank $r bucket $b != $want")
      }
    }
  }

  test("t52 bpe apply stats are consistent with the corpus and the learned merges") {
    val stats = SparkEntry.queries("t52_bpe_apply")(spark, sfDir)
      .as[(Long, Int, Int, Int, Long)].collect()
    val merges = SparkEntry.queries("t51_bpe_merges")(spark, sfDir)
      .as[(Int, String, String, Long)].collect()
    // n_tokens must reconstruct the ORIGINAL whitespace count: merge
    // cells are space-joined, so splitting them back is lossless
    val orig = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, tx) => id -> tx.split(" ", -1).length }.toMap
    assert(stats.length == orig.size)
    stats.foreach { case (id, n, b, m, ppm) =>
      assert(n == orig(id), s"doc $id: n_tokens $n != whitespace ${orig(id)}")
      assert(m == n - b && b >= 1 && b <= n, s"doc $id count laws")
      assert(ppm == b.toLong * 1000000L / math.max(n, 1).toLong, s"doc $id ppm")
    }
    // total absorbed merges: positive (training bit) and bounded by
    // the pair counts at selection time (greedy application merges
    // only non-overlapping occurrences, so per round actual ≤ counted)
    val totalMerged = stats.map(_._4.toLong).sum
    assert(totalMerged > 0 && totalMerged <= merges.map(_._4).sum,
      s"merged $totalMerged vs pair-count bound ${merges.map(_._4).sum}")
  }

  test("t53 stratified split: exact quotas per stratum, disjoint-exhaustive, rank permutation") {
    val out = SparkEntry.queries("t53_stratified_split")(spark, sfDir)
      .as[(Long, String, Int, String)].collect()
    val all = Tables.documents(spark, sfDir).select("doc_id").as[Long].collect()
    assert(out.length == all.length, "split must be exhaustive")
    assert(out.map(_._1).toSet == all.toSet, "every doc assigned exactly once")
    out.groupBy(_._2).foreach { case (src, rows) =>
      val n = rows.length
      // ranks are an exact 1..n permutation within the stratum
      assert(rows.map(_._3).sorted.toSeq == (1 to n), s"$src rank permutation")
      // quota law: floor(8n/10) train, floor(n/10) val, rest test
      val bySplit = rows.groupBy(_._4).view.mapValues(_.length).toMap
      assert(bySplit.getOrElse("train", 0) == n * 8 / 10, s"$src train quota")
      assert(bySplit.getOrElse("val", 0) == n / 10, s"$src val quota")
      assert(bySplit.getOrElse("test", 0) == n - n * 8 / 10 - n / 10, s"$src test quota")
      // membership is by draw-rank: the train set is exactly the
      // lowest-draw prefix (independent md5 recompute)
      val md = java.security.MessageDigest.getInstance("MD5")
      def draw(id: Long): Long = {
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(7)
        java.lang.Long.parseLong(hex, 16)
      }
      val ordered = rows.map(r => (draw(r._1), r._1)).sorted.map(_._2)
      val trainExpected = ordered.take(n * 8 / 10).toSet
      assert(rows.filter(_._4 == "train").map(_._1).toSet == trainExpected,
        s"$src train membership != lowest-draw prefix")
    }
  }

  test("t54 release manifest: train membership, contiguous offsets, window-span laws") {
    val out = SparkEntry.queries("t54_release_manifest")(spark, sfDir)
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // membership: exactly t53's train split
    val train = SparkEntry.queries("t53_stratified_split")(spark, sfDir)
      .as[(Long, String, Int, String)].collect()
      .filter(_._4 == "train").map(_._1).toSet
    assert(out.map(_._1).toSet == train, "manifest != train split membership")
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._3)
      // positions are 1..n and token offsets are CONTIGUOUS: each
      // doc starts exactly where its predecessor ended
      assert(ordered.map(_._3).toSeq == (1 to rows.length), s"shard $shard pos")
      ordered.foldLeft(0L) { case (expectedStart, (id, _, _, n, start, wf, wl)) =>
        assert(start == expectedStart, s"doc $id: start $start != $expectedStart")
        assert(wf == start / 2048 && wl == (start + n - 1) / 2048 && wl >= wf,
          s"doc $id window span")
        start + n
      }
    }
  }

  test("t50 epoch shuffle: per-shard positions are an exact permutation in (draw, doc_id) order; draw replays") {
    val out = SparkEntry.queries("t50_epoch_shuffle")(spark, sfDir)
      .as[(Long, Int, Long, Int)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (shard, g) =>
      // pos is exactly 1..n within the shard (no gaps, no ties lost
      // by the two-level rank)
      assert(g.map(_._4).sorted.toSeq == (1 to g.length),
        s"shard $shard positions are not a permutation")
      // and the order it induces is exactly (draw, doc_id)
      val byPos = g.sortBy(_._4).map(r => (r._3, r._1)).toSeq
      assert(byPos == byPos.sorted, s"shard $shard order violates (draw, doc_id)")
    }
    // routing replays from an independent MessageDigest md5 and is
    // draw-uniform: every shard populated, none degenerate
    out.take(20).foreach { case (id, shard, draw, _) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7)
      val d = java.lang.Long.parseLong(hex, 16)
      assert(draw == d && shard == (d % 8).toInt, s"doc $id routing")
    }
    val sizes = out.groupBy(_._2).values.map(_.length)
    assert(sizes.size == 8 && sizes.max <= 2 * sizes.min,
      s"shard sizes skewed: $sizes")
  }

  test("t55 curriculum: global permutation, contiguous quality-ordered phases, draw order within") {
    val out = SparkEntry.queries("t55_curriculum")(spark, sfDir)
      .as[(Long, Int, Int, Long)].collect()
    // global_seq is an exact permutation of 1..N
    assert(out.map(_._4).sorted.toSeq == (1L to out.length.toLong),
      "global_seq is not a permutation")
    // phases are CONTIGUOUS blocks in ascending phase order, and all
    // three are populated (the thresholds are non-vacuous)
    val byPhase = out.groupBy(_._2)
    assert(byPhase.keySet == Set(0, 1, 2), s"phases: ${byPhase.keySet}")
    val blocks = byPhase.toSeq.sortBy(_._1).map { case (p, g) =>
      (p, g.map(_._4).min, g.map(_._4).max, g.length)
    }
    blocks.foldLeft(0L) { case (prevEnd, (p, lo, hi, n)) =>
      assert(lo == prevEnd + 1 && hi == prevEnd + n,
        s"phase $p block [$lo,$hi] not contiguous after $prevEnd")
      hi
    }
    // phase assignment agrees with the registered quality operator —
    // the curriculum cannot disagree with t30
    val bp = SparkEntry.queries("t30_quality")(spark, sfDir)
      .select("doc_id", "quality_score_bp").as[(Long, Int)].collect().toMap
    out.foreach { case (id, p, _, _) =>
      val expected = if (bp(id) >= 6500) 0 else if (bp(id) >= 5500) 1 else 2
      assert(p == expected, s"doc $id: phase $p, bp ${bp(id)}")
    }
    // within a phase the order is exactly (draw, doc_id) — the shared
    // shuffle, replayed from an independent MessageDigest md5
    byPhase.values.foreach { g =>
      val byPos = g.sortBy(_._3).map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(r._1.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 7)
        (java.lang.Long.parseLong(hex, 16), r._1)
      }.toSeq
      assert(byPos == byPos.sorted, "in-phase order violates (draw, doc_id)")
      assert(g.map(_._3).sorted.toSeq == (1 to g.length), "seq_in_phase gaps")
    }
  }

  test("t56 dataset card cannot disagree with the operators it summarizes") {
    val out = SparkEntry.queries("t56_dataset_card")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(out.map(_._3).sum == total, "n_docs must cover the corpus")
    // token totals == t31's registered count, summed
    val t31Total = SparkEntry.queries("t31_tokens")(spark, sfDir)
      .agg(sum(col("ws_tokens"))).as[Long].head()
    assert(out.map(_._4).sum == t31Total, "n_tokens != t31 total")
    // global dup membership == d22's registered groups: every doc in
    // a dup_count ≥ 2 fingerprint group, counted once
    val d22Dups = SparkEntry.queries("d22_dedup_exact")(spark, sfDir)
      .filter(col("dup_count") >= 2)
      .agg(coalesce(sum(col("dup_count")), lit(0L))).as[Long].head()
    assert(out.map(_._7).sum == d22Dups,
      "dup_docs != d22 duplicate-group membership")
    // the sf0.001 corpus has no exact dups (the law above holds at
    // zero); pin the dup accounting non-vacuously on planted content:
    // 1 and 2 collide after normalization, 3 is unique
    val dupDir = docsOf(
      1L -> "the same   text here",
      2L -> "The Same Text Here",
      3L -> "completely different words")
    val card = TextOps.t56DatasetCard(spark, dupDir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(card.length == 1 && card.head._3 == 3 && card.head._6 == 2 &&
      card.head._7 == 2,
      s"planted card wrong: ${card.toSeq} (want 3 docs, 2 fps, 2 dup docs)")
    // per-stratum exact-integer mean against t30's registered scores
    val bp = SparkEntry.queries("t30_quality")(spark, sfDir)
      .select("doc_id", "quality_score_bp").as[(Long, Int)].collect().toMap
    val strata = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source").as[(Long, String, String)].collect()
      .groupBy(r => (r._2, r._3))
    out.foreach { case (lang, source, n, _, mean, nFp, _) =>
      val ids = strata((lang, source)).map(_._1)
      assert(n == ids.length)
      assert(mean == ids.map(id => bp(id).toLong).sum / ids.length,
        s"($lang,$source) mean_quality_bp")
      assert(nFp <= n, s"($lang,$source) fingerprints exceed docs")
    }
  }

  test("t59 BM25 equals a JVM in-memory mirror (third engine); ranking non-degenerate") {
    val got = SparkEntry.queries("t59_bm25")(spark, sfDir)
      .as[(Int, Int, Long, Long)].collect().toSeq
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.length.toLong
    val sumdl = toks.values.map(_.size.toLong).sum
    val queries = TextOps.t59Queries
    val qTerms = queries.map(_._2).toSet
    val tf = docs.flatMap { case (id, _) =>
      toks(id).filter(qTerms).groupBy(identity).map { case (t, xs) =>
        (t, id) -> xs.size.toLong }
    }.toMap
    val dfm = tf.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def contrib(t: String, id: Long): Long = {
      val (tfv, dfv, dl) = (tf((t, id)).toDouble, dfm(t).toDouble,
        toks(id).size.toDouble)
      // exact left-assoc op order of t59ContribE4: (idf * (tf*2.2))
      // / denom, then * 1e4 — a different association differs in ulps
      val idf = math.log((n - dfv + 0.5) / (dfv + 0.5) + 1.0)
      val raw = idf * (tfv * 2.2) /
        (tfv + 1.2 * (0.25 + 0.75 * (dl * n / sumdl)))
      math.floor(raw * 10000.0 + 0.5).toLong
    }
    val mirror = queries.groupBy(_._1).toSeq.flatMap { case (qid, qs) =>
      val scores = docs.map(_._1).flatMap { id =>
        val s = qs.map(_._2).filter(t => tf.contains((t, id))).map(contrib(_, id)).sum
        if (s > 0) Some(id -> s) else None
      }.sortBy { case (id, s) => (-s, id) }.take(10)
      scores.zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
    }.sortBy(x => (x._1, x._2))
    assert(got == mirror, "t59 != JVM BM25 mirror")
    // non-degenerate: every query returns a full page, scores vary,
    // and no two queries rank the same doc first for the same reason
    assert(got.groupBy(_._1).forall(_._2.size == 10))
    assert(got.map(_._4).distinct.size > 10, "scores suspiciously uniform")
  }

  test("t60 weighted sample: JVM clock mirror, Efraimidis–Spirakis equivalence, weighted skew") {
    val got = SparkEntry.queries("t60_weighted_sample")(spark, sfDir)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
      .filter(_._2 > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    // exact op order of t60ClockE15
    def clock(id: Long, w: Long): Long = math.floor(
      -math.log((draw(id) + 1.0) / 1.152921504606846976e18) / w * 1.0e15).toLong
    val mirror = docs.map { case (id, w) => (id, w, clock(id, w)) }
      .sortBy(x => (x._3, x._1)).take(64).zipWithIndex
      .map { case ((id, w, c), i) => (i + 1, id, w, c) }.toSeq
    assert(got == mirror, "t60 != JVM clock mirror")
    // Efraimidis–Spirakis equivalence: ranking by the exponential
    // clock −ln(u)/w ascending IS ranking by the ES key u^(1/w)
    // descending (monotone transform) — the same k docs win
    val es = docs.map { case (id, w) =>
      (id, math.pow((draw(id) + 1.0) / 1.152921504606846976e18, 1.0 / w))
    }.sortBy { case (id, k) => (-k, id) }.take(64).map(_._1).toSet
    assert(got.map(_._2).toSet == es, "clock sample != ES u^(1/w) sample")
    // weight-proportional skew: length-weighted sampling must pull
    // the sample's mean length above the corpus mean
    val sMean = got.map(_._3).sum.toDouble / got.size
    val cMean = docs.map(_._2).sum.toDouble / docs.size
    assert(sMean > cMean,
      f"sampled mean $sMean%.1f not above corpus mean $cMean%.1f — weighting is vacuous")
  }

  test("t61 co-occurrence equals an in-memory mirror; lift discriminates both directions") {
    val T = graft.text.TextOps
    val got = SparkEntry.queries("t61_cooccurrence")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    // mirror: doc term-sets -> df -> top-k vocab (df desc, term asc)
    // -> pair counts -> integer lift
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSet }
    val n = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(T.t61VocabK)
    val vset = vocab.map(_._1).toSet
    val mirror = (for {
      (ta, na) <- vocab; (tb, nb) <- vocab
      if ta < tb
      nab = docs.count(d => d._2(ta) && d._2(tb)).toLong
      if nab >= T.t61MinPairDocs
    } yield (ta, tb, na, nb, nab, n, nab * n * 10000L / (na * nb)))
      .sortBy(r => (r._1, r._2))
    assert(got == mirror, "t61 != in-memory mirror")
    assert(vset.size == T.t61VocabK)
    // non-vacuous analysis: lift discriminates (the synthetic
    // corpus's top terms are all WEAKLY positively associated —
    // measured 10138..10838 bp at sf0.001 — so the honest assertions
    // are variation plus the positive side)
    assert(got.map(_._7).distinct.size > 1, "lift constant across pairs")
    assert(got.exists(_._7 > 10000L), "no positively-associated pair")
  }

  test("t62 vocab growth equals an in-memory mirror; monotone; conserves corpus totals") {
    val got = SparkEntry.queries("t62_vocab_growth")(spark, sfDir)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (1 to 10), "one row per decile, in order")
    // in-memory mirror with the same integer boundary arithmetic
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect().map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val lo = docs.map(_._1).min
    val hi = docs.map(_._1).max
    val span = hi - lo + 1
    def bucket(id: Long): Int =
      (1 to 10).find(k => id <= lo - 1 + span * k / 10).get
    val firstDoc = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val mirror = (1 to 10).map { d =>
      val inD = docs.filter { case (id, _) => bucket(id) <= d }
      (d, inD.length.toLong, inD.map(_._2.length.toLong).sum,
        firstDoc.values.count(bucket(_) == d).toLong,
        firstDoc.values.count(bucket(_) <= d).toLong)
    }
    assert(got == mirror, "t62 != in-memory mirror")
    // monotone growth; final decile conserves the corpus totals
    assert(got.sliding(2).forall { case Seq(a, b) =>
      b._2 >= a._2 && b._3 >= a._3 && b._5 >= a._5 }, "curve must be monotone")
    assert(got.last._2 == docs.length.toLong, "docs_cum(10) != corpus size")
    assert(got.last._5 == firstDoc.size.toLong, "vocab_cum(10) != distinct terms")
  }

  test("t63 keyness equals a BigInt mirror; both directions live; skew outranks balance") {
    val T = graft.text.TextOps
    val got = SparkEntry.queries("t63_keyness")(spark, sfDir)
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(got.nonEmpty)
    // BigInt mirror of the whole table — vocabulary, chi2, direction
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => (id % 2 == 0) -> t.split(" ").toSet }
    val na = docs.count(_._1).toLong
    val nb = docs.size - na
    val df = docs.flatMap { case (inA, ts) => ts.map(_ -> inA) }
      .groupBy(_._1).view.mapValues { occ =>
        (occ.count(_._2).toLong, occ.count(!_._2).toLong)
      }.toMap
    val vocab = df.toSeq
      .sortBy { case (t, (a, b)) => (-(a + b), t) }.take(T.t63K)
    val mirror = vocab.collect { case (t, (a, b)) if a + b < na + nb =>
      val diff = BigInt(a * nb - b * na)
      val chi2 = (BigInt(na + nb) * diff * diff * 10000) /
        (BigInt(a + b) * BigInt((na - a) + (nb - b)) * BigInt(na) * BigInt(nb))
      (t, a, b, chi2.toLong, if (a * nb > b * na) "a" else "b")
    }.sortBy(_._1)
    assert(got == mirror, "t63 != BigInt mirror")
    // both enrichment directions live on the corpus
    assert(got.exists(_._5 == "a") && got.exists(_._5 == "b"),
      "keyness must discriminate in both directions")
    // sanity: the most balanced vocab term scores below the most
    // skewed one (chi-square grows with |a·nb − b·na|)
    def skew(r: (String, Long, Long, Long, String)): Long =
      math.abs(r._2 * nb - r._3 * na)
    assert(got.maxBy(skew)._4 >= got.minBy(skew)._4,
      "chi2 inverted against skew")
  }

  test("t64 drift gate equals an in-memory mirror; quarantine IS the planted cohort") {
    val T = graft.text.TextOps
    val got = SparkEntry.queries("t64_drift_gate")(spark, sfDir)
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSeq
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect()
    // reference support: bigrams of the UNMUTATED even half
    def grams(toks: Array[String]): Seq[String] =
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    val ref = docs.filter(_._1 % 2 == 0)
      .flatMap { case (_, t) => grams(t.split(" ")) }.toSet
    val mirror = docs.filter(_._1 % 2 == 1).sortBy(_._1).map { case (id, t) =>
      val mutated =
        if (id % 7 == 0) t.toUpperCase(java.util.Locale.ROOT) else t
      val gs = grams(mutated.split(" "))
      val unseen = gs.count(g => !ref.contains(g)).toLong
      val n = gs.size.toLong
      val bp = if (n == 0) None else Some(unseen * 10000 / n)
      (id, n, unseen, bp, bp.exists(_ > T.t64QuarantineBp))
    }.toSeq
    assert(got == mirror, "t64 != in-memory mirror")
    // the gate's detection is exact at this corpus: quarantine ==
    // the planted upper-cased cohort (both classes non-vacuous;
    // t64Mutate upper-cases — reversal was rejected in the operator
    // docstring because reversed unigrams can collide with real ones)
    val quarantined = got.filter(_._5).map(_._1).toSet
    val planted = got.map(_._1).filter(id => id % 7 == 0).toSet
    assert(planted.nonEmpty && quarantined == planted,
      s"quarantine $quarantined must equal the planted cohort $planted")
  }
}
