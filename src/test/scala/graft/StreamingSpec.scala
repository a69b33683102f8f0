package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Ev plus the props payload — s55's profile folds every events
  * column, so its driver rows must carry the full schema. */
case class EvP(event_id: Long, ts: Timestamp, user_id: Long,
               event_type: String, value: Double, props: String)

/** Order rows for s59's live-Benford drive (q63Digits reads only
  * o_totalprice; the key rides along for residue slicing). */
case class OrdB(o_orderkey: Long, o_totalprice: Double)

/** q52/s55 profile output row (Options for the per-type slots). */
case class ProfRow(col_name: String, cnt: Long, nulls: Long, ndv: Long,
                   min_num: Option[Double], max_num: Option[Double],
                   min_len: Option[Int], max_len: Option[Int])

case class Doc(doc_id: Long, text: String)
case class LangDoc(doc_id: Long, lang: String, text: String)
case class Vec(vec_id: Long, embedding: Seq[Float])

/** Drives the streaming transforms through MemoryStream → watermark
  * → memory sink, proving the same logic that passes the batch
  * oracle also runs incrementally with bounded state. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("s34 tumbling windowed agg emits finalized windows past the watermark") {
    val in = MemoryStream[Ev](spark)
    val q = Streaming.tumblingAggStreaming(in.toDF())
      .writeStream.format("memory").queryName("s34out")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts(0), 1, "click", 1.0),
        Ev(2, ts(5), 2, "click", 2.0),
        Ev(3, ts(16), 1, "view", 3.0))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 + 10:15 windows
      in.addData(Ev(4, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("s34out")
        .select("bucket_start", "event_type", "events_count", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L, 3.0)))
      assert(rows.contains((ts(15), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("s35 stream-stream interval join matches purchases to preceding clicks") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = Streaming.clickPurchaseJoinStreaming(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("s35out")
      .outputMode("append").start()
    try {
      clicks.addData(
        Ev(10, ts(0), 1, "click", 0.0),
        Ev(11, ts(10), 2, "click", 0.0))
      purchases.addData(
        Ev(20, ts(30), 1, "purchase", 99.5), // within 1h of click 10
        Ev(21, ts(5), 2, "purchase", 50.0))  // BEFORE click 11 → no match
      q.processAllAvailable()
      val rows = spark.table("s35out")
        .select("user_id", "click_id", "purchase_id", "purchase_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 10L, 20L, 99.5)))
    } finally q.stop()
  }

  test("s80 left-outer join NULL-completes unmatched clicks at watermark eviction, not before") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = Streaming.clickPurchaseLeftJoinStreaming(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("s80out")
      .outputMode("append").start()
    def emitted() = spark.table("s80out")
      .select("user_id", "click_id", "purchase_id", "purchase_value")
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    try {
      // click 10 gets a purchase inside its hour; click 11 never will
      clicks.addData(
        Ev(10, ts(0), 1, "click", 0.0),
        Ev(11, ts(10), 2, "click", 0.0))
      purchases.addData(Ev(20, ts(30), 1, "purchase", 99.5))
      q.processAllAvailable()
      // BEFORE eviction: only the matched row may be out — the state
      // store cannot yet prove click 11 is unmatched (a purchase at
      // 10:10..11:10 could still arrive inside the watermark delay),
      // so premature NULL-completion here would be a correctness bug
      assert(emitted() == Set((1L, 10L, Some(20L), Some(99.5))),
        s"unmatched click leaked before watermark eviction: ${emitted()}")
      // advance event time on BOTH inputs (the join watermark is the
      // min across inputs) far past click 11's match window + delays
      val far = Timestamp.valueOf("2024-01-02 10:00:00")
      clicks.addData(Ev(12, far, 3, "click", 0.0))
      purchases.addData(Ev(21, far, 4, "purchase", 1.0))
      q.processAllAvailable()
      // AT eviction: click 11 emerges exactly once, NULL-completed
      assert(emitted() == Set(
        (1L, 10L, Some(20L), Some(99.5)),
        (2L, 11L, None, None)),
        s"expected NULL-completed click 11 after eviction: ${emitted()}")
    } finally q.stop()
  }

  test("s80 batch form equals the streaming output on the same data, inner rows = s35") {
    val evs = Seq(
      Ev(10, ts(0), 1, "click", 0.0),
      Ev(11, ts(10), 2, "click", 0.0),
      Ev(20, ts(30), 1, "purchase", 99.5),
      Ev(21, ts(5), 2, "purchase", 50.0)) // BEFORE click 11 → no match
    val df = evs.toDF()
    val out = Streaming.clickPurchaseLeftJoin(
      df.filter($"event_type" === "click"),
      df.filter($"event_type" === "purchase"))
      .as[(Long, Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 10L, Some(20L), Some(99.5)),
      (2L, 11L, None, None)))
    // left-outer ⊇ inner: dropping the NULL-completed rows recovers s35
    val inner = Streaming.clickPurchaseJoin(
      df.filter($"event_type" === "click"),
      df.filter($"event_type" === "purchase"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out.collect { case (u, c, Some(p), Some(v)) => (u, c, p, v) } == inner)
  }

  test("s38 streaming dedup suppresses in-watermark duplicates; batch form keeps the earliest") {
    // same composite key in BOTH forms: (user_id, event_type) —
    // user 1 has a same-key duplicate (dropped) and a different-type
    // event (kept), so the composite key is actually observable
    val evs = Seq(
      Ev(1, ts(0), 1, "click", 1.0),
      Ev(2, ts(5), 1, "click", 2.0), // dup (1, click) → dropped
      Ev(3, ts(7), 1, "view", 4.0),  // different type → kept
      Ev(4, ts(10), 2, "click", 3.0))
    val in = MemoryStream[Ev](spark)
    val q = Streaming.dedupStream(in.toDF(), "user_id", "event_type")
      .writeStream.format("memory").queryName("s38out")
      .outputMode("append").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      val got = spark.table("s38out").select("event_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 4L), s"first arrival kept per key, got $got")
    } finally q.stop()
    // deterministic batch form: earliest (ts, event_id) per the SAME
    // key — equal output on the same (in-order) data
    val batch = Streaming.dedupBatch(scala.util.Random.shuffle(evs).toDF())
      .select("event_id").as[Long].collect().toSet
    assert(batch == Set(1L, 3L, 4L))
  }

  test("s39 streaming decontamination drops gram-overlap docs statelessly; batch form agrees") {
    // eval doc contributes the 4-gram "one two three four"; doc 11
    // contains it (dropped), doc 12 shares only shorter overlaps
    // (kept), doc 13 is disjoint (kept)
    val evalDocs = Seq(Doc(0L, "one two three four five")).toDF()
    val stream = Seq(
      Doc(11L, "zz one two three four yy"),  // shares a 4-gram → dropped
      Doc(12L, "one two three zz yy ww qq"), // only a 3-gram → kept
      Doc(13L, "aa bb cc dd ee ff"))         // disjoint → kept
    val evalRow = Streaming.evalGramRow(evalDocs, 4)
    val in = MemoryStream[Doc](spark)
    val q = Streaming.decontaminateStream(in.toDF(), evalRow, 4)
      .writeStream.format("memory").queryName("s39out")
      .outputMode("append").start()
    try {
      in.addData(stream: _*)
      q.processAllAvailable()
      val got = spark.table("s39out").select("doc_id").as[Long].collect().toSet
      assert(got == Set(12L, 13L), s"stateless doc-granularity scrub, got $got")
    } finally q.stop()
    // the same transform in batch mode returns the same survivors
    val batch = Streaming.decontaminateStream(stream.toDF(), evalRow, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(batch == Set(12L, 13L))
  }

  test("s39 batch entry agrees with d29: flagged docs are exactly the non-survivors") {
    // d29 flags contaminated train docs; s39 keeps the complement —
    // together they partition the train side of the corpus
    val flagged = graft.dedup.Dedup.d29Decontaminate(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val kept = Streaming.s39StreamDecontaminate(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val train = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 53 =!= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty && kept.nonEmpty)
    assert((flagged & kept).isEmpty)
    assert((flagged | kept) == train)
  }

  test("s40 streaming PII quarantine is stateless and equals the batch form exactly") {
    // ids chosen against the deterministic planting rules: 16 gets
    // no plants (its in-text email is the only PII), 22 gets only
    // the planted phone (22 % 11 == 0), 13 gets nothing at all
    val docs = Seq(
      LangDoc(16L, "en", "mail me at a@b.co today"), // in-text email only
      LangDoc(22L, "en", "plain words here"),        // 22%11=0 → planted phone
      LangDoc(13L, "en", "totally clean text"))      // no PII at all
    val in = MemoryStream[LangDoc](spark)
    val q = Streaming.piiQuarantineStream(in.toDF())
      .writeStream.format("memory").queryName("s40out")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("s40out")
        .select("doc_id", "n_emails", "n_phones", "redacted_text")
        .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
      assert(got.keySet == Set(16L, 22L), "only PII carriers reach quarantine")
      assert(got(16L)._2 == 1 && got(16L)._4 == "mail me at <EMAIL> today")
      assert(got(22L)._3 == 1 && got(22L)._4.endsWith("call <PHONE> soon"))
    } finally q.stop()
    // the same transform in batch mode emits the same quarantine rows
    val batch = Streaming.piiQuarantineStream(docs.toDF())
      .select("doc_id").as[Long].collect().toSet
    assert(batch == Set(16L, 22L))
  }

  test("s41 streaming quality gate is stateless, bites, and equals the batch form exactly") {
    // score = least(n/100,1)*0.5 + distinct_ratio*0.3 + (1-stop_ratio_en)*0.2
    val docs = Seq(
      Doc(1L, "the the the the"), // 950 bp: short, degenerate, all stopwords → rejected
      Doc(2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // 5500 bp → admitted
      Doc(3L, "a a a a a a a a a a a a"))                                  // low distinct → rejected
    val in = MemoryStream[Doc](spark)
    val q = Streaming.qualityGateStream(in.toDF())
      .writeStream.format("memory").queryName("s41out")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("s41out")
        .select("doc_id", "quality_score_bp")
        .as[(Long, Int)].collect().toMap
      assert(got.keySet == Set(2L), s"only the quality doc is admitted, got $got")
      assert(got(2L) == 5500, s"hand-computed score, got ${got(2L)}")
    } finally q.stop()
    val batch = Streaming.qualityGateStream(docs.toDF())
      .select("doc_id").as[Long].collect().toSet
    assert(batch == Set(2L), "batch form must equal the stream")
  }

  test("s34/s35 batch equivalents equal their streaming output on the same data") {
    val evs = Seq(
      Ev(1, ts(0), 1, "click", 1.0),
      Ev(2, ts(20), 1, "purchase", 10.0),
      Ev(3, ts(40), 2, "click", 2.0))
    val batch = Streaming.tumblingAgg(evs.toDF())
      .select("bucket_start", "event_type", "events_count", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(batch.contains((ts(0), "click", 1L, 1.0)))
    val joined = Streaming.clickPurchaseJoin(
      evs.toDF().filter(col("event_type") === "click"),
      evs.toDF().filter(col("event_type") === "purchase"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(joined == Set((1L, 1L, 2L, 10.0)))
  }

  test("s43 stream-static index anti-join drops history dups statelessly; equals d35 minus dup_of_index") {
    // real stream face: a MemoryStream of docs against a tiny static
    // fingerprint index — historical content is dropped at ingest,
    // fresh docs pass; stateless (no watermark, no state store)
    val index = Seq("dup text", "other old").toDF("text")
      .select(graft.text.TextOps.fingerprint(col("text")).as("fingerprint"))
    val in = MemoryStream[Doc](spark)
    val q = Streaming.indexDedupStream(in.toDF(), index)
      .writeStream.format("memory").queryName("s43out")
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, "dup text"), Doc(2L, "fresh text"),
        Doc(3L, "  DUP   text "))  // canonicalization catches re-whitespaced copies too
      q.processAllAvailable()
      val got = spark.table("s43out").select("doc_id").as[Long].collect().toSet
      assert(got == Set(2L), s"expected only the fresh doc, got $got")
    } finally q.stop()
    // the batch face over the REAL persisted index equals d35's
    // classification with the index leg removed: s43 drops exactly
    // dup_of_index (s38's watermark dedup owns dup_in_batch)
    val s43 = Streaming.s43StreamIndexDedup(spark, sfDir)
      .as[(Long, String)].collect().toSet
    val d35 = SparkEntry.queries("d35_incremental_dedup")(spark, sfDir)
      .select("doc_id", "fingerprint", "status")
      .as[(Long, String, String)].collect()
    val expected = d35.filter(_._3 != "dup_of_index")
      .map(r => (r._1, r._2)).toSet
    assert(s43 == expected,
      s"s43 != d35 minus index dups: missing=${(expected -- s43).take(3)} extra=${(s43 -- expected).take(3)}")
    // non-vacuous both ways: the index leg bites AND survivors remain
    assert(d35.exists(_._3 == "dup_of_index") && s43.nonEmpty)
  }

  test("s44 micro-batch near-dup admission over the persisted index equals the batch run") {
    // the fuzzy counterpart of the s43 property: drive the REAL
    // foreachBatch transform through micro-batches against the real
    // persisted d37 artifact; decisions are stateless vs the static
    // index, so the union across micro-batches must equal one batch
    // run — proven by executing, not assumed
    val index = graft.dedup.Dedup.d37BandIndex(spark, sfDir)
    val corpus = graft.dedup.Dedup.shingledDocs(spark, sfDir)
    val rows = Tables.documents(spark, sfDir).filter(col("doc_id") % 4 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, tx) => Doc(id, tx) }
    val (half1, half2) = rows.partition(_.doc_id % 8 == 0)
    assert(half1.nonEmpty && half2.nonEmpty)
    val admitted = scala.collection.mutable.Set[Long]()
    val in = MemoryStream[Doc](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        admitted ++= Streaming.neardupAdmitBatch(b.toDF(), index, corpus)
          .as[Long].collect()
        ()
      }.start()
    try {
      in.addData(half1: _*); q.processAllAvailable()
      in.addData(half2: _*); q.processAllAvailable()
    } finally q.stop()
    val batch = Streaming.s44StreamNeardupAdmit(spark, sfDir)
      .as[Long].collect().toSet
    assert(batch.nonEmpty && admitted.toSet == batch,
      s"stream union != batch: missing=${(batch -- admitted).take(3)} extra=${(admitted.toSet -- batch).take(3)}")
    // non-vacuous: the history probe must actually drop someone
    assert(batch.size < rows.length, "no batch doc was near-dup of history")
  }

  test("s48 micro-batch semantic admission over the persisted artifact equals the batch run") {
    // the embedding leg of the s43/s44 property: route each RAW
    // micro-batch through the persisted quantizer artifact (cells
    // index + centroid table + max-norm scalar), verify vs history,
    // anti-join — stateless vs the static artifact, so the union
    // across micro-batches must equal one batch run
    import graft.ann.Ann
    val hist = col("vec_id") % 4 =!= 0
    val (base, c1) = Ann.a42Refine(spark, sfDir, hist)
    val e = graft.functions.VectorExprs.withNorm(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))
    val index = Ann.a42AssignTopFrom(base.filter(hist), c1, 2)
      .select(col("vec_id"), explode(col("cells")).as("cell"))
      .join(e, Seq("vec_id"))
      .persist()
    val mnorm = e.filter(hist).agg(max(col("norm"))).collect()(0).getDouble(0)
    val rows = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, v) => Vec(id, v) }
    val (half1, half2) = rows.partition(_.vec_id % 8 == 0)
    assert(half1.nonEmpty && half2.nonEmpty)
    val admitted = scala.collection.mutable.Set[Long]()
    val in = MemoryStream[Vec](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        admitted ++= Streaming.semanticAdmitBatch(b.toDF(), mnorm, c1, index)
          .as[Long].collect()
        ()
      }.start()
    try {
      in.addData(half1: _*); q.processAllAvailable()
      in.addData(half2: _*); q.processAllAvailable()
    } finally q.stop()
    val batch = Streaming.s48StreamSemanticAdmit(spark, sfDir)
      .as[Long].collect().toSet
    assert(batch.nonEmpty && admitted.toSet == batch,
      s"stream union != batch: missing=${(batch -- admitted).take(3)} extra=${(admitted.toSet -- batch).take(3)}")
    // non-vacuous: the history probe must actually drop someone
    assert(batch.size < rows.length, "no batch vector was a semantic dup of history")
    index.unpersist()
  }

  test("s49 sketch generations fold to the batch sketch through real micro-batches") {
    // the mergeable-summaries property executed: drive event slices
    // through a REAL MemoryStream; each micro-batch folds its own
    // MG summary into the persisted counter state via the relational
    // merge; the final state must equal both the one-shot Aggregator
    // over all events AND q41's registered output (exact regime)
    val ev = Tables.events(spark, sfDir).select(col("ts"), col("user_id"))
    val gens = java.nio.file.Files.createTempDirectory("s49gen").toString
    val g0 = Streaming.mgSketchTables(spark,
      ev.filter(col("ts") < lit(Streaming.s49Cut1)).select("user_id"))
    g0._1.write.mode("overwrite").parquet(s"$gens/g0/counters")
    g0._2.write.mode("overwrite").parquet(s"$gens/g0/meta")
    val rows = ev.filter(col("ts") >= lit(Streaming.s49Cut1))
      .select("user_id").as[Long].collect()
    // an UNEVEN slicing, different from the entry's two time slices —
    // mergeability says the landing state must not care
    val parts = rows.grouped(math.max(rows.length / 3, 1)).toSeq
    assert(parts.length >= 3)
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Long](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val delta = Streaming.mgSketchTables(spark,
          b.toDF("user_id").select("user_id"))
        val g = gen.get()
        val state = (spark.read.parquet(s"$gens/g$g/counters"),
          spark.read.parquet(s"$gens/g$g/meta"))
        val next = Streaming.mgMergeTables(state, delta, Streaming.s49K)
        next._1.write.mode("overwrite").parquet(s"$gens/g${g + 1}/counters")
        next._2.write.mode("overwrite").parquet(s"$gens/g${g + 1}/meta")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      parts.foreach { p => in.addData(p.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    val finalState = spark.read.parquet(s"$gens/g${gen.get()}/counters")
      .as[(Long, Long)].collect().toMap
    // == the one-shot batch sketch (exact regime: identical counters)
    val oneShot = Streaming.mgSketchTables(spark, ev.select("user_id"))
    assert(oneShot._2.as[Long].head() == 0L, "exact-regime premise broken")
    assert(finalState == oneShot._1.as[(Long, Long)].collect().toMap,
      "folded state != one-shot sketch")
    // == q41's registered top-20
    val q41 = SparkEntry.queries("q41_heavy_hitters")(spark, sfDir)
      .as[(Int, Long, Long)].collect().toSeq
    val top = finalState.toSeq.sortBy { case (u, c) => (-c, u) }.take(20)
      .zipWithIndex.map { case ((u, c), i) => (i + 1, u, c) }
    assert(top == q41, "folded state's top-20 != q41")
  }

  test("s45 MV generations fold to the recompute through real micro-batches") {
    import graft.operators.Relational
    // gen-0 state: the pre-cutoff partials, persisted
    val gens = java.nio.file.Files.createTempDirectory("s45gen").toString
    val orders = Relational.q38Facts(spark, sfDir)
    Relational.q38Partials(orders.filter(col("od") < lit(Relational.q38Cutoff)))
      .write.mode("overwrite").parquet(s"$gens/g0")
    // the day's facts arrive as a REAL stream; each micro-batch
    // merges into a NEW state generation (the Delta-style refresh
    // loop — read current, merge, write next), so state carry is
    // through the ARTIFACT, not executor memory
    val rows = orders.filter(col("od") >= lit(Relational.q38Cutoff))
      .select(col("o_custkey"), col("od").cast("string"), col("p").cast("double"))
      .as[(Long, String, Double)].collect()
    val (b1, b2) = rows.partition(_._2 < Streaming.s45Mid)
    assert(b1.nonEmpty && b2.nonEmpty)
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[(Long, String, Double)](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val facts = b.toDF("k", "d", "v").select(
          col("k").as("o_custkey"), to_date(col("d")).as("od"),
          col("v").cast("decimal(18,2)").as("p"))
        val g = gen.get()
        Relational.q38Merge(spark.read.parquet(s"$gens/g$g"),
            Relational.q38Partials(facts))
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(gen.get() == 2, s"expected 2 refresh generations, got ${gen.get()}")
    val streamed = Relational.q38Present(spark.read.parquet(s"$gens/g2"))
      .as[(Long, Long, String, java.sql.Date)].collect().toSet
    val batch = SparkEntry.queries("q38_mv_maintenance")(spark, sfDir)
      .as[(Long, Long, String, java.sql.Date)].collect().toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"generation chain != recompute: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("s46 live-card generations fold to the batch card through real micro-batches") {
    import graft.text.TextOps
    val gens = java.nio.file.Files.createTempDirectory("s46gen").toString
    val docs = Tables.documents(spark, sfDir)
    // gen-0 state: the first residue slice's fingerprint partials
    TextOps.t56Partials(TextOps.t56Project(
        docs.filter(pmod(col("doc_id"), lit(3)) === 0)))
      .write.mode("overwrite").parquet(s"$gens/g0")
    // the rest of the corpus arrives as a REAL stream; each
    // micro-batch merges into a NEW card generation through the
    // artifact (the s45 refresh loop, for observability state)
    val rows = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect()
    val (b1, b2) = rows.partition(_._1 % 3 == 1)
    assert(b1.nonEmpty && b2.nonEmpty)
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[(Long, String, String, String)](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batch = b.toDF("doc_id", "text", "lang", "source")
        val g = gen.get()
        TextOps.t56MergeP(spark.read.parquet(s"$gens/g$g"),
            TextOps.t56Partials(TextOps.t56Project(batch)))
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(gen.get() == 2, s"expected 2 card generations, got ${gen.get()}")
    val streamed = TextOps.t56Present(spark.read.parquet(s"$gens/g2"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    val batchCard = SparkEntry.queries("t56_dataset_card")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batchCard,
      s"card chain != batch card: missing=${(batchCard -- streamed).take(3)} " +
        s"extra=${(streamed -- batchCard).take(3)}")
  }

  test("s50 live-funnel generations fold to the batch funnel through real micro-batches") {
    val gens = java.nio.file.Files.createTempDirectory("s50gen").toString
    val ev = Tables.events(spark, sfDir)
    // gen-0: empty witness state through the artifact
    ev.select(col("user_id"), col("ts").as("v_ts"), col("ts").as("c_ts"),
        col("ts").as("p_ts")).filter(lit(false))
      .write.mode("overwrite").parquet(s"$gens/g0")
    // the month's events arrive as a REAL stream in EVENT-TIME ORDER
    // (the fold's documented precondition): three contiguous slices
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val cut1 = Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = Timestamp.valueOf("2024-01-21 00:00:00")
    val batches = Seq(
      rows.filter(_.ts.before(cut1)),
      rows.filter(r => !r.ts.before(cut1) && r.ts.before(cut2)),
      rows.filter(r => !r.ts.before(cut2)))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.funnelFoldBatch(spark.read.parquet(s"$gens/g$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    // mid-chain sanity: after the first slice the funnel is partial —
    // some users have a view witness but no click witness yet
    val g1 = spark.read.parquet(s"$gens/g1")
    assert(g1.filter(col("v_ts").isNotNull && col("c_ts").isNull).count() > 0,
      "first generation must hold partially-converted users")
    val streamed = Streaming.funnelPresent(spark.read.parquet(s"$gens/g3"))
      .as[(Int, String, Long, Double)].collect().toSeq
    val batch = SparkEntry.queries("q44_funnel")(spark, sfDir)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(streamed == batch,
      s"funnel generation chain != batch funnel: $streamed vs $batch")
    val s50 = SparkEntry.queries("s50_stream_funnel")(spark, sfDir)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(s50 == batch, "s50's registered fold != batch funnel")
  }

  test("s56 live-attribution generations fold to the batch ledger through real micro-batches") {
    val gens = java.nio.file.Files.createTempDirectory("s56gen").toString
    val ev = Tables.events(spark, sfDir)
    val R = graft.operators.Relational
    // gen-0: empty ledger + empty touch buffer through the artifact
    R.attributionRollup(R.attributionCredits(
        R.q55Conversions(ev.filter(lit(false))),
        R.q55Touches(ev.filter(lit(false)))))
      .write.mode("overwrite").parquet(s"$gens/a0")
    R.q55Touches(ev.filter(lit(false)))
      .write.mode("overwrite").parquet(s"$gens/t0")
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val cut1 = Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = Timestamp.valueOf("2024-01-21 00:00:00")
    val batches = Seq(
      rows.filter(_.ts.before(cut1)),
      rows.filter(r => !r.ts.before(cut1) && r.ts.before(cut2)),
      rows.filter(r => !r.ts.before(cut2)))
    assert(batches.forall(_.nonEmpty))
    val retain = Streaming.s56RetainCuts
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        val (a, t) = Streaming.attributionFoldBatch(
          spark.read.parquet(s"$gens/a$g"), spark.read.parquet(s"$gens/t$g"),
          b.toDF(), retain(g))
        a.write.mode("overwrite").parquet(s"$gens/a${g + 1}")
        t.write.mode("overwrite").parquet(s"$gens/t${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    // the watermark law: every retained touch is inside the 7-day
    // lookback of the NEXT slice's earliest possible conversion —
    // the buffer is bounded by the window, never the history
    val t1 = spark.read.parquet(s"$gens/t1")
    assert(t1.filter(col("touch_ts") <=
      lit(Streaming.s50Cut1).cast("timestamp") - expr("INTERVAL 7 DAY"))
      .count() == 0, "gen-1 buffer holds touches older than the watermark")
    assert(t1.count() > 0, "gen-1 buffer must retain in-window touches")
    val streamed = spark.read.parquet(s"$gens/a3").orderBy("channel")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val batch = SparkEntry.queries("q55_attribution")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch,
      s"attribution generation chain != batch ledger: $streamed vs $batch")
    val s56 = SparkEntry.queries("s56_stream_attribution")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(s56 == batch, "s56's registered fold != batch attribution")
  }

  test("s57 live-anomaly ledger folds to the batch profile even under shuffled slicing") {
    val gens = java.nio.file.Files.createTempDirectory("s57gen").toString
    val ev = Tables.events(spark, sfDir)
    val R = graft.operators.Relational
    R.q57Daily(ev.filter(lit(false)))
      .write.mode("overwrite").parquet(s"$gens/g0")
    // sum-merge needs NO event-time order: drive the chain with
    // residue slices that interleave every day across all batches
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect()
    val batches = Seq(
      rows.filter(_.event_id % 3 == 0),
      rows.filter(_.event_id % 3 == 1),
      rows.filter(_.event_id % 3 == 2))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.anomalyFoldBatch(spark.read.parquet(s"$gens/g$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    // mid-chain: the partial ledger already covers (almost) every
    // day — residue slicing interleaves, unlike time slicing
    assert(spark.read.parquet(s"$gens/g1").count() >=
      spark.read.parquet(s"$gens/g3").count() - 2,
      "residue slices must interleave days")
    val streamed = R.q57Present(spark.read.parquet(s"$gens/g3"))
      .as[(java.sql.Date, Long, Double, Double, Double, Boolean)].collect().toSeq
    val batch = SparkEntry.queries("q57_anomaly")(spark, sfDir)
      .as[(java.sql.Date, Long, Double, Double, Double, Boolean)].collect().toSeq
    assert(streamed == batch,
      "anomaly ledger chain != batch profile under shuffled slicing")
    val s57 = SparkEntry.queries("s57_stream_anomaly")(spark, sfDir)
      .as[(java.sql.Date, Long, Double, Double, Double, Boolean)].collect().toSeq
    assert(s57 == batch, "s57's registered fold != batch profile")
  }

  test("s58 live-PSI ledger folds to the batch monitor even under shuffled slicing") {
    val gens = java.nio.file.Files.createTempDirectory("s58gen").toString
    val ev = Tables.events(spark, sfDir)
    val R = graft.operators.Relational
    val ref = ev.filter(col("event_type") === "purchase")
      .filter(col("ts") < lit(R.q59Cut)).select(col("ts"), col("value"))
    // the trained artifact persists once, before any batch arrives
    R.q59Edges(ref).write.mode("overwrite").parquet(s"$gens/edges")
    val edges = spark.read.parquet(s"$gens/edges")
    R.q59Bins(ref, edges).withColumnRenamed("n", "ref_n")
      .write.mode("overwrite").parquet(s"$gens/ref")
    R.q59Bins(ref.filter(lit(false)), edges)
      .write.mode("overwrite").parquet(s"$gens/g0")
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect()
    val batches = Seq(
      rows.filter(_.event_id % 3 == 0),
      rows.filter(_.event_id % 3 == 1),
      rows.filter(_.event_id % 3 == 2))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.psiFoldBatch(spark.read.parquet(s"$gens/g$g"), b.toDF(),
            spark.read.parquet(s"$gens/edges"))
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    // the ledger is BOUNDED at the bin count from the first batch on
    assert(spark.read.parquet(s"$gens/g1").count() <= 10 &&
      spark.read.parquet(s"$gens/g3").count() <= 10, "ledger outgrew bins")
    val streamed = R.q59Present(spark.read.parquet(s"$gens/ref"),
        spark.read.parquet(s"$gens/g3").withColumnRenamed("n", "cur_n"))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    val batch = SparkEntry.queries("q59_psi_drift")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(streamed == batch,
      "PSI ledger chain != batch monitor under shuffled slicing")
    val s58 = SparkEntry.queries("s58_stream_psi")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(s58 == batch, "s58's registered fold != batch monitor")
  }

  test("s59 live-Benford ledger folds to the batch audit even under shuffled slicing") {
    val gens = java.nio.file.Files.createTempDirectory("s59gen").toString
    val ord = Tables.orders(spark, sfDir)
    val R = graft.operators.Relational
    R.q63Digits(ord.filter(lit(false)))
      .write.mode("overwrite").parquet(s"$gens/g0")
    val rows = ord.select("o_orderkey", "o_totalprice").as[OrdB].collect()
    val batches = Seq(
      rows.filter(_.o_orderkey % 3 == 0),
      rows.filter(_.o_orderkey % 3 == 1),
      rows.filter(_.o_orderkey % 3 == 2))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[OrdB](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.benfordFoldBatch(spark.read.parquet(s"$gens/g$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    assert(spark.read.parquet(s"$gens/g3").count() <= 9, "ledger outgrew digits")
    val streamed = R.q63Present(spark.read.parquet(s"$gens/g3"))
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    val batch = SparkEntry.queries("q63_benford")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(streamed == batch,
      "Benford ledger chain != batch audit under shuffled slicing")
    val s59 = SparkEntry.queries("s59_stream_benford")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(s59 == batch, "s59's registered fold != batch audit")
  }

  test("s51 live-SCD2 generations fold to the batch dimension through real micro-batches") {
    val gens = java.nio.file.Files.createTempDirectory("s51gen").toString
    val ev = Tables.events(spark, sfDir)
    ev.select(col("user_id"), col("event_type").as("attr_value"),
        col("ts").as("valid_from"), col("ts").as("valid_to"),
        lit(1).as("version"), lit(true).as("is_current")).filter(lit(false))
      .write.mode("overwrite").parquet(s"$gens/g0")
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val cut1 = Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = Timestamp.valueOf("2024-01-21 00:00:00")
    val batches = Seq(
      rows.filter(_.ts.before(cut1)),
      rows.filter(r => !r.ts.before(cut1) && r.ts.before(cut2)),
      rows.filter(r => !r.ts.before(cut2)))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.scd2FoldBatch(spark.read.parquet(s"$gens/g$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 dimension generations, got ${gen.get()}")
    // mid-chain sanity: generation 1 must hold open rows that later
    // generations close (the dimension is genuinely incremental)
    val g1open = spark.read.parquet(s"$gens/g1")
      .filter(col("is_current")).select("user_id", "version")
      .as[(Long, Int)].collect().toSet
    val g3 = spark.read.parquet(s"$gens/g3")
    val g3closed = g3.filter(!col("is_current")).select("user_id", "version")
      .as[(Long, Int)].collect().toSet
    assert(g1open.intersect(g3closed).nonEmpty,
      "some generation-1 open row must be closed by later batches")
    val streamed = g3.orderBy("user_id", "version")
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)].collect().toSeq
    val batch = SparkEntry.queries("q32_scd2")(spark, sfDir)
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)].collect().toSeq
    assert(streamed == batch, "SCD2 generation chain != batch dimension")
    val s51 = SparkEntry.queries("s51_stream_scd2")(spark, sfDir)
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)].collect().toSeq
    assert(s51 == batch, "s51's registered fold != batch dimension")
  }

  test("s63 live sessions fold to q69's batch table through real micro-batches; boundary sessions extend") {
    val gens = java.nio.file.Files.createTempDirectory("s63gen").toString
    val ev = Tables.events(spark, sfDir)
    val empty = ev.select(col("user_id"), lit(0).cast("int").as("session_idx"),
        col("ts").as("session_start"), col("ts").as("session_end"),
        col("event_id").as("events"), col("event_id").as("purchases"))
      .filter(lit(false))
    empty.write.mode("overwrite").parquet(s"$gens/c0")
    empty.write.mode("overwrite").parquet(s"$gens/o0")
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val cut1 = Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = Timestamp.valueOf("2024-01-21 00:00:00")
    val batches = Seq(
      rows.filter(_.ts.before(cut1)),
      rows.filter(r => !r.ts.before(cut1) && r.ts.before(cut2)),
      rows.filter(r => !r.ts.before(cut2)))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        val (c, o) = Streaming.sessionsFoldBatch(
          spark.read.parquet(s"$gens/c$g"), spark.read.parquet(s"$gens/o$g"),
          b.toDF())
        c.write.mode("overwrite").parquet(s"$gens/c${g + 1}")
        o.write.mode("overwrite").parquet(s"$gens/o${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 session generations, got ${gen.get()}")
    // the open slice stays one row per active user — the bounded
    // state the fold's scale story claims
    val o3 = spark.read.parquet(s"$gens/o3")
    assert(o3.groupBy("user_id").count().agg(max("count")).head.getLong(0) == 1L,
      "open state must hold exactly one session per user")
    val streamed = Streaming.sessionsPresent(
        spark.read.parquet(s"$gens/c3"), o3)
      .as[(Long, Int, Timestamp, Timestamp, Long, Long, Long)].collect().toSeq
    val batch = SparkEntry.queries("q69_sessions")(spark, sfDir)
      .as[(Long, Int, Timestamp, Timestamp, Long, Long, Long)].collect().toSeq
    assert(streamed == batch, "session generation chain != q69 batch table")
    val s63 = SparkEntry.queries("s63_stream_sessions")(spark, sfDir)
      .as[(Long, Int, Timestamp, Timestamp, Long, Long, Long)].collect().toSeq
    assert(s63 == batch, "s63's registered fold != q69")
    // the boundary-EXTENSION path proven on a planted case (the
    // corpus's sessions happen not to straddle the month cuts): a
    // batch boundary lands INSIDE a session — the fold must extend
    // the open session, not split it — and a >30-min silence in the
    // same later batch must still open a new one
    def mk(id: Long, t: String, ty: String) =
      Ev(id, Timestamp.valueOf(t), 7L, ty, 1.0)
    val emptyS = spark.read.parquet(s"$gens/c0")
    val (c1, o1) = Streaming.sessionsFoldBatch(emptyS, emptyS, Seq(
      mk(1, "2024-01-05 10:00:00", "view"),
      mk(2, "2024-01-05 10:10:00", "purchase")).toDF())
    val (c2, o2) = Streaming.sessionsFoldBatch(c1, o1, Seq(
      mk(3, "2024-01-05 10:30:00", "view"),
      mk(4, "2024-01-05 12:00:00", "view")).toDF())
    val planted = Streaming.sessionsPresent(c2, o2)
      .as[(Long, Int, Timestamp, Timestamp, Long, Long, Long)].collect().toSeq
    assert(planted == Seq(
      (7L, 1, Timestamp.valueOf("2024-01-05 10:00:00"),
        Timestamp.valueOf("2024-01-05 10:30:00"), 3L, 1800L, 1L),
      (7L, 2, Timestamp.valueOf("2024-01-05 12:00:00"),
        Timestamp.valueOf("2024-01-05 12:00:00"), 1L, 0L, 0L)),
      s"planted boundary case wrong: $planted")
  }

  test("s52 live retention folds to the batch matrix even shuffled and redelivered") {
    val gens = java.nio.file.Files.createTempDirectory("s52gen").toString
    val ev = Tables.events(spark, sfDir)
    ev.select(col("user_id"), col("ts").cast("date").as("week"))
      .filter(lit(false)).write.mode("overwrite").parquet(s"$gens/g0")
    // the fold's claimed property is stronger than s50/s51's: NO
    // ordering precondition. Drive it adversarially — slices by
    // event_id residue (each spans the whole month, interleaved),
    // and REDELIVER the middle slice (at-least-once semantics).
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect()
    val batches = Seq(
      rows.filter(_.event_id % 3 == 0),
      rows.filter(_.event_id % 3 == 1),
      rows.filter(_.event_id % 3 == 1), // duplicate delivery
      rows.filter(_.event_id % 3 == 2))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.retentionFoldBatch(spark.read.parquet(s"$gens/g$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 4, s"expected 4 state generations, got ${gen.get()}")
    // state is a SET: the redelivered batch must not have grown it
    val g2 = spark.read.parquet(s"$gens/g2").count()
    val g3 = spark.read.parquet(s"$gens/g3").count()
    assert(g2 == g3, s"idempotence: redelivery grew the state $g2 -> $g3")
    val streamed = graft.operators.Relational.q48Present(
        spark.read.parquet(s"$gens/g4"))
      .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSeq
    val batch = SparkEntry.queries("q48_retention")(spark, sfDir)
      .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSeq
    assert(streamed == batch,
      s"shuffled+redelivered retention chain != batch matrix")
    val s52 = SparkEntry.queries("s52_stream_retention")(spark, sfDir)
      .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSeq
    assert(s52 == batch, "s52's registered fold != batch matrix")
  }

  test("s53 live HLL folds to the batch sketch even shuffled and redelivered") {
    val gens = java.nio.file.Files.createTempDirectory("s53gen").toString
    val ev = Tables.events(spark, sfDir)
    ev.select(col("ts").cast("date").as("day"), col("user_id").as("j"),
        lit(0).as("m")).filter(lit(false))
      .write.mode("overwrite").parquet(s"$gens/r0")
    ev.select(col("ts").cast("date").as("day"), col("user_id"))
      .filter(lit(false)).write.mode("overwrite").parquet(s"$gens/p0")
    // both states are max-merge / set-union: drive the chain
    // adversarially — residue slices + a redelivered batch
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect()
    val batches = Seq(
      rows.filter(_.event_id % 3 == 0),
      rows.filter(_.event_id % 3 == 1),
      rows.filter(_.event_id % 3 == 1), // duplicate delivery
      rows.filter(_.event_id % 3 == 2))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.hllFoldBatch(spark.read.parquet(s"$gens/r$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/r${g + 1}")
        Streaming.hllExactFoldBatch(spark.read.parquet(s"$gens/p$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/p${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 4, s"expected 4 state generations, got ${gen.get()}")
    // idempotence: the redelivered batch must not change either state
    val r2 = spark.read.parquet(s"$gens/r2").collect().toSet
    val r3 = spark.read.parquet(s"$gens/r3").collect().toSet
    assert(r2 == r3, "redelivery changed the register state")
    assert(spark.read.parquet(s"$gens/p2").count() ==
      spark.read.parquet(s"$gens/p3").count(),
      "redelivery grew the exact-anchor state")
    val streamed = graft.operators.Relational.q49Present(
        spark.read.parquet(s"$gens/r4"),
        spark.read.parquet(s"$gens/p4").groupBy("day")
          .agg(count(lit(1)).as("exact_users")))
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].collect().toSeq
    val batch = SparkEntry.queries("q49_hll_distinct")(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].collect().toSeq
    assert(streamed == batch, "shuffled+redelivered HLL chain != batch sketch")
    val s53 = SparkEntry.queries("s53_stream_hll")(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Long, Double, Double)].collect().toSeq
    assert(s53 == batch, "s53's registered fold != batch sketch")
  }

  test("s55 live profile folds to the batch profile under shuffled slicing") {
    val gens = java.nio.file.Files.createTempDirectory("s55gen").toString
    val ev = Tables.events(spark, sfDir)
    graft.operators.Relational.q52Stats(
        graft.operators.Relational.q52Stacked(ev.filter(lit(false))))
      .write.mode("overwrite").parquet(s"$gens/s0")
    graft.operators.Relational.q52Stacked(ev.filter(lit(false)))
      .write.mode("overwrite").parquet(s"$gens/v0")
    // the summary fold's contract is exactly-once but UNORDERED
    // (sums and extrema commute): drive event_id residue slices,
    // each spanning the whole month, interleaved out of time order
    val rows = ev.select("event_id", "ts", "user_id", "event_type",
      "value", "props").as[EvP].collect()
    val batches = Seq(
      rows.filter(_.event_id % 3 == 2),
      rows.filter(_.event_id % 3 == 0),
      rows.filter(_.event_id % 3 == 1))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[EvP](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        Streaming.profileStatsFold(spark.read.parquet(s"$gens/s$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/s${g + 1}")
        Streaming.profileDistinctFold(spark.read.parquet(s"$gens/v$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/v${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    val streamed = graft.operators.Relational.q52Present(
        spark.read.parquet(s"$gens/s3"), spark.read.parquet(s"$gens/v3"))
      .as[ProfRow].collect().toSeq
    val batch = SparkEntry.queries("q52_profile")(spark, sfDir)
      .as[ProfRow].collect().toSeq
    assert(streamed == batch, "shuffled profile chain != batch profile")
    // the distinct-value leg is a SET: refolding an already-seen
    // slice must not grow it (redelivery-safe, unlike the count leg
    // whose contract is exactly-once — the s54 stance)
    val v3 = spark.read.parquet(s"$gens/v3")
    val redelivered = Streaming.profileDistinctFold(
      v3, ev.filter(expr("event_id % 3 = 1")))
    assert(redelivered.count() == v3.count(),
      "redelivery grew the distinct-value state")
    val s55 = SparkEntry.queries("s55_stream_profile")(spark, sfDir)
      .as[ProfRow].collect().toSeq
    assert(s55 == batch, "s55's registered fold != batch profile")
  }

  test("the composed streaming admission (s43 anti-join ∘ stateful dedup ∘ s41 gate) equals d40") {
    // d40 is the batch daily-admission pipeline; its streaming face
    // is the composition of transforms this file already proves
    // individually. Drive the REAL composition through a MemoryStream
    // fed in doc_id order (first-arrival == batch min under in-order
    // feed; the stream's dedup state is semantically the growing
    // index — the production form periodically flushes it into the
    // d35 persisted artifact) and assert it lands exactly on d40.
    val (index, batchDocs) = graft.dedup.Dedup.d35IndexAndBatch(spark, sfDir)
    val rows = batchDocs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).map { case (id, tx) => Doc(id, tx) }
    // within ONE micro-batch, streaming dropDuplicates keeps an
    // ARBITRARY row per key — first-arrival is only deterministic
    // ACROSS micro-batches (state wins). The planted within-batch
    // dup pairs are exactly {12k, 12k+4}, so feeding the ≡4 (mod 12)
    // copies in a second micro-batch makes every collision cross the
    // boundary: originals enter state first, copies are dropped by
    // state — first-arrival == batch min, deterministically, while
    // genuinely exercising cross-batch state carry.
    val (copies, originals) = rows.partition(_.doc_id % 12 == 4)
    val in = MemoryStream[Doc](spark)
    val q = Streaming.qualityGateStream(
        Streaming.indexDedupStream(in.toDF(), index)
          .dropDuplicates("fingerprint"))
      .select("doc_id", "fingerprint", "quality_score_bp")
      .writeStream.format("memory").queryName("s44out")
      .outputMode("append").start()
    try {
      in.addData(originals: _*)
      q.processAllAvailable()
      in.addData(copies: _*)
      q.processAllAvailable()
      val streamed = spark.table("s44out")
        .as[(Long, String, Int)].collect().toSet
      val batch = SparkEntry.queries("d40_daily_admit")(spark, sfDir)
        .as[(Long, String, Int)].collect().toSet
      assert(streamed == batch,
        s"stream admission != d40: missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }

  test("s47 expectation counters fold to the batch q40 audit through real micro-batches") {
    import graft.operators.Relational
    val gens = java.nio.file.Files.createTempDirectory("s47gen").toString
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // gen-0 state: the first residue slice's 1-row counter partial
    Relational.q40Partials(ev.filter(pmod(col("event_id"), lit(3)) === 0))
      .write.mode("overwrite").parquet(s"$gens/g0")
    val rows = ev.filter(pmod(col("event_id"), lit(3)) =!= 0)
      .as[Ev].collect()
    val (b1, b2) = rows.partition(_.event_id % 3 == 1)
    assert(b1.nonEmpty && b2.nonEmpty)
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        spark.read.parquet(s"$gens/g$g")
          .union(Relational.q40Partials(b.toDF()))
          .write.mode("overwrite").parquet(s"$gens/g${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      in.addData(b1.toSeq: _*); q.processAllAvailable()
      in.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(gen.get() == 2, s"expected 2 audit generations, got ${gen.get()}")
    val streamed = Relational.q40Present(spark.read.parquet(s"$gens/g2"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    val batchAudit = SparkEntry.queries("q40_expectations")(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed == batchAudit,
      s"live audit != batch audit: missing=${(batchAudit -- streamed).take(3)} " +
        s"extra=${(streamed -- batchAudit).take(3)}")
    // and the registered s47 entry lands on the same rows
    val reg = SparkEntry.queries("s47_stream_expectations")(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(reg == batchAudit, "registered s47 != batch q40")
  }

  test("s54 live transition matrix folds to the batch matrix through real micro-batches") {
    val gens = java.nio.file.Files.createTempDirectory("s54gen").toString
    val ev = Tables.events(spark, sfDir)
    ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .filter(lit(false)).write.mode("overwrite").parquet(s"$gens/l0")
    ev.select(col("event_type").as("from_type"),
        col("event_type").as("to_type"), col("event_id").as("transitions"))
      .filter(lit(false)).write.mode("overwrite").parquet(s"$gens/c0")
    // event-time-ordered slices — the fold's documented precondition
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(_.ts.getTime)
    val cut1 = Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = Timestamp.valueOf("2024-01-21 00:00:00")
    val batches = Seq(
      rows.filter(_.ts.before(cut1)),
      rows.filter(r => !r.ts.before(cut1) && r.ts.before(cut2)),
      rows.filter(r => !r.ts.before(cut2)))
    assert(batches.forall(_.nonEmpty))
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val g = gen.get()
        val last = spark.read.parquet(s"$gens/l$g")
        Streaming.transitionsCountFold(last,
            spark.read.parquet(s"$gens/c$g"), b.toDF())
          .write.mode("overwrite").parquet(s"$gens/c${g + 1}")
        Streaming.transitionsLastFold(last, b.toDF())
          .write.mode("overwrite").parquet(s"$gens/l${g + 1}")
        gen.incrementAndGet()
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(gen.get() == 3, s"expected 3 state generations, got ${gen.get()}")
    // conservation law: every event except each user's last is a
    // 'from', so final transitions total == |events| − |users|
    def tot(g: Int): Long = spark.read.parquet(s"$gens/c$g")
      .agg(sum("transitions")).as[Long].head()
    val users = ev.select("user_id").distinct().count()
    assert(tot(3) == ev.count() - users,
      s"conservation: ${tot(3)} != ${ev.count()} - $users")
    // the batch boundary is genuinely crossed: generation 2's total
    // exceeds gen-1's + slice-2's INTERNAL pairs — the excess is
    // exactly the carried-seed → first-batch-event transitions
    val within2 = graft.operators.Relational.q50PairCounts(
        ev.filter(col("ts") >= lit("2024-01-11") &&
          col("ts") < lit("2024-01-21")))
      .agg(sum("transitions")).as[Long].head()
    assert(tot(2) > tot(1) + within2,
      s"no cross-boundary transitions counted: ${tot(2)} vs ${tot(1)} + $within2")
    // last-event state is one row per user seen so far
    val l3 = spark.read.parquet(s"$gens/l3")
    assert(l3.count() == users && l3.select("user_id").distinct().count() == users,
      "last-event state must hold exactly one row per user")
    val streamed = graft.operators.Relational.q50Present(
        spark.read.parquet(s"$gens/c3"))
      .as[(String, String, Long, Long, Double)].collect().toSeq
    val batch = SparkEntry.queries("q50_event_transitions")(spark, sfDir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(streamed == batch, "transition generation chain != batch matrix")
    val s54 = SparkEntry.queries("s54_stream_transitions")(spark, sfDir)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(s54 == batch, "s54's registered fold != batch matrix")
  }

  test("s66 live RFM: residue fold == time fold == batch; one state row per customer") {
    val ord = Tables.orders(spark, sfDir)
    val reg = SparkEntry.queries("s66_stream_rfm")(spark, sfDir).collect().toSeq
    assert(reg.nonEmpty)
    // residue slices interleave every customer's orders across all
    // batches — max/sum merges must not care
    val folded = Seq(0, 1, 2).map(r => ord.filter(col("o_orderkey") % 3 === r))
      .foldLeft(Streaming.s66BatchRollup(ord.filter(lit(false)))) {
        (st, b) => Streaming.rfmFoldBatch(st, b)
      }
    assert(folded.count() == folded.select("cust_key").distinct().count(),
      "state must hold exactly one row per customer")
    assert(Streaming.s66Present(folded).collect().toSeq == reg,
      "residue-sliced fold != registered time-sliced fold")
    // and both equal the unsliced batch rollup
    assert(Streaming.s66Present(Streaming.s66BatchRollup(ord)).collect().toSeq == reg,
      "fold != single-batch rollup")
  }

  test("s72 live join MV: fold == unsplit join recompute; compressed state; late dim pickup") {
    import org.apache.spark.sql.functions._
    val R = graft.operators.Relational
    val ord = Tables.orders(spark, sfDir)
    val cust = R.q88Custs(spark, sfDir)
    val reg = SparkEntry.queries("s72_stream_join_mv")(spark, sfDir)
      .as[(String, Int, Long, Long)].collect().toSeq
    // the two-stream fold must equal the full join + rollup
    val full = TestRecomputes.q88Unsplit(spark, sfDir)
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(reg.nonEmpty && reg == full, "two-stream fold != unsplit recompute")
    // the retained A-state is COMPRESSED: one row per (customer, year)
    // ever seen, never one per order
    val aState = R.q88APartials(ord)
    assert(aState.count() ==
      ord.select(col("o_custkey"), year(col("o_orderdate"))).distinct().count(),
      "A-state grain must be (customer, year)")
    assert(aState.count() < ord.count(), "A-state must compress the fact stream")
    // the cross-generation property: a customer arriving in a LATER
    // generation picks up EARLIER generations' order history through
    // the A_state⋈ΔB leg — that leg is non-empty at generation 1
    val gen0A = R.q88APartials(Streaming.orderSlices(ord).head)
    val gen1B = Streaming.s72CustSlices(cust,
      Streaming.orderSlices(ord).length)(1)
    assert(R.q88Leg(gen0A, gen1B).limit(1).count() == 1,
      "late-arriving dimension rows must pick up earlier fact history")
  }

  test("s73 live FIFO: fold == batch attribution; open-set law; real cross-batch matching") {
    import org.apache.spark.sql.functions._
    val R = graft.operators.Relational
    val ev = Tables.events(spark, sfDir)
    val reg = SparkEntry.queries("s73_stream_fifo")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = SparkEntry.queries("q90_fifo_attribution")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(reg.nonEmpty && reg == batch, "live FIFO ledger != q90 batch")
    // the open-set law, both directions: the final open-lot artifact
    // equals the lots whose interval outlives the user's total draws
    val stateDir = graft.sources.Export.scratch("s73_fifo", sfDir)
    val openLots = spark.read.parquet(s"$stateDir/l3")
      .select("user_id", "lot_id").as[(Long, Long)].collect().toSet
    val drawTot = R.q90Draws(ev).groupBy("user_id")
      .agg(max("d_hi").as("dt")).as[(Long, Long)].collect().toMap
    val expectOpen = R.q90Lots(ev).as[(Long, Long, Long, Long)].collect()
      .filter { case (u, _, _, hi) => hi > drawTot.getOrElse(u, 0L) }
      .map(r => (r._1, r._2)).toSet
    assert(openLots == expectOpen, "open-lot state != direct recompute")
    assert(openLots.nonEmpty, "no backlog — the open-set law is vacuous")
    // cross-batch matching is real: some generation-0 lot (ts before
    // the first cut) is consumed by a later-generation draw
    val lotTs = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect().toMap
    val drawTs = ev.filter(col("event_type") === "click")
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect().toMap
    val cut1 = java.sql.Timestamp.valueOf(Streaming.s50Cut1 + " 00:00:00")
    assert(reg.exists { case (_, lid, did, _) =>
      lotTs(lid).before(cut1) && !drawTs(did).before(cut1) },
      "no cross-batch allocation — the fold never matched history")
  }

  test("s74 live AS OF: maintained snapshot == ledger replay == direct snapshot at EVERY version") {
    import org.apache.spark.sql.functions._
    val R = graft.operators.Relational
    val S = graft.streaming.Streaming
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts", "event_type", "value")
    val stateDir = S.s74Build(spark, sfDir, "s74spec_asof")
    val cuts = R.q77Cutoffs
    for (k <- 0 to S.s74Head) {
      // the live ledger's AS OF k read
      val replayed = S.s74AsOf(spark, stateDir, k)
        .orderBy("user_id").collect().toSeq
      // the incrementally-maintained snapshot MV at generation k
      val maintained = spark.read.parquet(s"$stateDir/s74snap$k")
        .orderBy("user_id").collect().toSeq
      // the table as it actually was at version k's cutoff
      val direct = S.applyChangesSnapshot(
        if (k < S.s74Head) ev.filter(col("ts") <= lit(cuts(k))) else ev)
        .orderBy("user_id").collect().toSeq
      assert(replayed == direct, s"version $k: ledger replay != direct snapshot")
      assert(maintained == direct, s"version $k: maintained MV != direct snapshot")
      assert(replayed.nonEmpty, s"version $k empty")
    }
    // the registered face == q77's written-chain serving of the same
    // version (live ledger indistinguishable from a written chain)
    val live = SparkEntry.queries("s74_stream_asof")(spark, sfDir).collect().toSeq
    val written = SparkEntry.queries("q77_time_travel")(spark, sfDir).collect().toSeq
    assert(live.nonEmpty && live == written, "live AS OF != q77 written chain")
  }

  test("s75 live CDF: ledger-served feed == brute snapshot diff for EVERY version pair") {
    import org.apache.spark.sql.functions._
    val S = graft.streaming.Streaming
    val stateDir = S.s74Build(spark, sfDir, "s75spec_asof")
    // brute serving-level diff of two maintained snapshot
    // generations — an independent path sharing nothing with
    // s75Feed's ledger-net + pre-image assembly
    def served(k: Int): Map[Long, (Long, String, Double)] =
      spark.read.parquet(s"$stateDir/s74snap$k")
        .filter(col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    for (k1 <- 0 to S.s74Head; k2 <- (k1 + 1) to S.s74Head) {
      val feed = S.s75Feed(spark, stateDir, k1, k2)
        .as[(Long, String, Long, String, Double)].collect().toSeq
      assert(feed == TestCdf.bruteDiff(served(k1), served(k2)),
        s"live feed($k1,$k2) != snapshot diff")
    }
    // the registered window is non-degenerate: inserts + both images
    val reg = S.s75Feed(spark, stateDir, S.s75From, S.s75To)
      .select("change_type").as[String].collect().toSet
    assert(Set("insert", "update_preimage", "update_postimage").subsetOf(reg),
      s"registered window too thin: $reg")
  }

  test("s67 live overlap: folded sketches obey the merge law; redelivery is identity") {
    val D = graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    // the registered residue-sliced fold == d52's batch row
    val reg = SparkEntry.queries("s67_stream_overlap")(spark, sfDir).collect().toSeq
    val batch = SparkEntry.queries("d52_corpus_overlap")(spark, sfDir).collect().toSeq
    assert(reg == batch, "live overlap != d52 batch row")
    // merge law live: folding slices yields EXACTLY bottom-k of the
    // full corpus gram set
    val g = D.d52GramsOf(docs)
    val fullA = g.filter(col("doc_id") % 2 === 0).select("gram").distinct()
    val slices = Seq(0, 1, 2).map(r =>
      D.d52GramsOf(docs.filter(col("doc_id") % 3 === r))
        .filter(col("doc_id") % 2 === 0).select("gram").distinct())
    val folded = slices.foldLeft(fullA.filter(lit(false))) {
      (st, b) => Streaming.overlapSketchFold(st, b)
    }
    val direct = fullA.orderBy("gram").limit(D.d52K)
    assert(folded.orderBy("gram").as[Long].collect().toSeq ==
      direct.as[Long].collect().toSeq, "folded sketch != bottom-k of full set")
    // idempotency: re-delivering a slice changes nothing
    val replayed = Streaming.overlapSketchFold(folded, slices(1))
    assert(replayed.orderBy("gram").as[Long].collect().toSeq ==
      direct.as[Long].collect().toSeq, "redelivery must be identity")
  }

  test("s68 sink compaction: fragmentation grows per batch, optimize repairs it invisibly") {
    val (growth, run) = Streaming.s68Build(spark, sfDir)
    // the pathology is real and monotone: every append adds files
    assert(growth.size == 3 && growth.sliding(2).forall {
      case Seq(a, b) => b > a
      case _         => true
    }, s"file count must grow per batch: $growth")
    assert(run.fragFiles == growth.last)
    // compaction hit its closed-form target and genuinely shrank
    assert(run.outFiles == run.targetFiles && run.outFiles < run.fragFiles,
      s"expected ${run.targetFiles}, got ${run.outFiles} of ${run.fragFiles}")
    // and is invisible: identical daily rollup off both layouts
    def roll(p: String) = spark.read.parquet(p).groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("c"))
      .orderBy("day").collect().toSeq
    assert(roll(run.outDir) == roll(run.fragDir),
      "compaction changed the rollup")
  }

  test("s69 mid-stream schema evolution: old files untouched, legacy bucket == batch 1, face == q80's reader") {
    val (out, v1Files) = Streaming.s69Build(spark, sfDir)
    val v1Sizes = v1Files.map(p => p -> java.nio.file.Files.size(
      java.nio.file.Paths.get(p))).toMap
    assert(v1Files.nonEmpty, "batch 1 must write files")
    val allFiles = graft.sources.Export.listParquet(out)
    assert(allFiles.size > v1Files.size, "post-upgrade batches must append")
    // the upgrade rewrote NOTHING: batch-1 files byte-identical
    v1Sizes.foreach { case (p, sz) =>
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(p)) == sz,
        s"pre-upgrade file rewritten: $p")
    }
    // the legacy bucket is exactly the pre-upgrade slice
    val face = graft.sources.Export.q80EvolvedRead(spark, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch1 = Streaming.orderSlices(
      Tables.orders(spark, sfDir))(0).count()
    assert(face("legacy") == batch1,
      s"legacy bucket ${face("legacy")} != batch-1 rows $batch1")
    // every post-upgrade channel is populated
    (0 to 2).foreach(c => assert(face.contains(s"ch_$c"), s"ch_$c missing"))
    // and the registered face equals the source-replayed rollup
    val got = SparkEntry.queries("s69_stream_schema_evolution")(spark, sfDir)
      .collect().toSeq
    val replay = Tables.orders(spark, sfDir)
      .groupBy(when(col("o_orderdate") < lit("1998-01-01"), lit("legacy"))
        .otherwise(graft.sources.Export.q80Channel(col("o_orderkey")))
        .as("channel"))
      .agg(count(lit(1)).as("orders"),
        sum(expr("cast(round(o_totalprice * 100, 0) as bigint)")).as("cents"))
      .orderBy("channel").collect().toSeq
    assert(got == replay, "evolved sink read != source replay")
  }

  test("s70 live bloom maintenance: incremental sidecar == full rebuild, probe invisible, growth monotone") {
    val E = graft.sources.Export
    val (out, side, growth) = Streaming.s70Build(spark, sfDir)
    // the pathology is real: every batch appends files
    assert(growth.size == 3 && growth.sliding(2).forall {
      case Seq(a, b) => b > a
      case _         => true
    }, s"file count must grow per batch: $growth")
    // incremental maintenance == full rebuild, row-for-row
    val inc = spark.read.parquet(side)
      .orderBy("file", "word").collect().toSeq
    val rebuilt = E.q82SidecarRows(spark, Seq(out))
      .orderBy("file", "word").collect().toSeq
    assert(inc == rebuilt, "incremental sidecar diverged from rebuild")
    // the probe through the incremental sidecar prunes and equals
    // q82's registered lookup (same key, same table content)
    val h = E.q82LookupHash(spark, sfDir)
    val (rows, kept, total) = E.q82ProbeFiles(spark, out, side, h)
    assert(kept < total, s"pruning must engage ($kept/$total)")
    val got = E.q82Face(rows).collect().toSeq
    val q82 = SparkEntry.queries("q82_bloom_skipping")(spark, sfDir)
      .collect().toSeq
    assert(got == q82, "live-maintained lookup != q82's one-shot lookup")
  }

  test("s71 late data: fold equals direct classification; drops AND absorbed stragglers both real") {
    val got = SparkEntry.queries("s71_stream_late_data")(spark, sfDir)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    // independent replay: classify every event directly from the
    // arrival schedule and the running-max watermark
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts")
      .as[(Long, java.sql.Timestamp)].collect()
    val cut1 = java.sql.Timestamp.valueOf("2024-01-11 00:00:00")
    val cut2 = java.sql.Timestamp.valueOf("2024-01-21 00:00:00")
    def arr(e: (Long, java.sql.Timestamp)): Int = {
      val slice = if (e._2.before(cut1)) 0 else if (e._2.before(cut2)) 1 else 2
      math.min(slice + (if (e._1 % 17 == 0) 1 else 0), 2)
    }
    val byArr = ev.groupBy(arr)
    val maxTs = (0 to 2).map(i => byArr(i).map(_._2.getTime).max)
    val delay = 3L * 24 * 3600 * 1000
    def wm(i: Int): Option[Long] =
      if (i == 0) None else Some((0 until i).map(maxTs).max - delay)
    val mirror = ev.map { e =>
      val late = wm(arr(e)).exists(e._2.getTime < _)
      (e._2.toLocalDateTime.toLocalDate.toString, late)
    }.groupBy(_._1).map { case (d, rows) =>
      (d, rows.count(!_._2).toLong, rows.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    assert(got.map(r => (r._1.toString, r._2, r._3)) == mirror,
      "fold classification != direct replay")
    // the watermark genuinely bites, and allowed lateness genuinely
    // absorbs: some stragglers drop, some stragglers land on time
    val stragglers = ev.filter(_._1 % 17 == 0)
    def pushed(e: (Long, java.sql.Timestamp)): Boolean =
      e._2.before(cut2) // slices 0/1 stragglers genuinely arrive late
    val dropped = stragglers.count(e => wm(arr(e)).exists(e._2.getTime < _))
    val absorbed = stragglers.count(e =>
      pushed(e) && wm(arr(e)).forall(e._2.getTime >= _))
    assert(dropped > 0, "no straggler was ever late — the watermark is vacuous")
    assert(absorbed > 0, "no straggler was absorbed — allowed lateness is vacuous")
    // trigger 0 has no watermark: nothing before cut1 that arrives in
    // trigger 0 may be late
    assert(got.map(_._3).sum == dropped,
      "late total != straggler drops (only stragglers can be late)")
  }

  test("s65 exactly-once: replayed batch is a no-op, unguarded sum-merge diverges") {
    val ev = Tables.events(spark, sfDir)
    val R = graft.operators.Relational
    // the registered entry folds batch 1 TWICE through the guard and
    // must still equal the clean batch rollup
    val got = SparkEntry.queries("s65_exactly_once")(spark, sfDir)
      .as[(java.sql.Date, Long)].collect().toSeq
    val clean = R.q57Daily(ev).orderBy("day")
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(got == clean, "guarded fold with redelivery != batch rollup")

    // replay-is-identity, state-for-state: re-offering a committed id
    // returns BOTH artifacts unchanged (no write, no ledger growth)
    val deliveries = Streaming.s65Deliveries(ev)
    val ledger = R.q57Daily(deliveries(0)._2)
    val txn = spark.range(1).select(lit(0L).as("batch_id"))
    val replay = Streaming.s65GuardedFold(ledger, txn, deliveries(1)._2, 0L)
    assert(replay(0).collect().toSeq == ledger.collect().toSeq &&
      replay(1).as[Long].collect().toSeq == Seq(0L),
      "replayed id must be a structural no-op")
    // a FRESH id commits: data folds in and the ledger grows by one
    val fresh = Streaming.s65GuardedFold(ledger, txn, deliveries(1)._2, 1L)
    assert(fresh(1).as[Long].collect().sorted.toSeq == Seq(0L, 1L))

    // the guard is NOT redundant: the same schedule through the raw
    // sum-merge (no ledger) double-counts the replayed batch
    val unguarded = deliveries.map(_._2).foldLeft(
      R.q57Daily(ev.filter(lit(false)))) { (st, b) =>
      Streaming.anomalyFoldBatch(st, b)
    }.orderBy("day").as[(java.sql.Date, Long)].collect().toSeq
    assert(unguarded != clean, "unguarded fold should double-count the replay")
    // and the divergence is exactly the duplicated slice's days
    val dupDays = R.q57Daily(deliveries(1)._2)
      .as[(java.sql.Date, Long)].collect().map(r => r._1 -> r._2).toMap
    val cleanMap = clean.toMap
    val ungMap = unguarded.toMap
    assert(dupDays.forall { case (d, c) => ungMap(d) == cleanMap(d) + c },
      "divergence must be the replayed batch, day for day")
    assert((ungMap.keySet -- dupDays.keySet).forall(d => ungMap(d) == cleanMap(d)))
  }

  test("s76 live WAP: ledger == q96 batch protocol; reject leaves the table row-identical") {
    val S = graft.streaming.Streaming
    val live = SparkEntry.queries("s76_stream_wap")(spark, sfDir).collect().toSeq
    val batch = SparkEntry.queries("q96_wap")(spark, sfDir).collect().toSeq
    assert(live == batch, "live WAP ledger != batch WAP ledger")
    // generation audit across the reject: the w_b trigger (attempt 2)
    // must leave the table state row-identical; both publishes move it
    val sd = S.s76Build(spark, sfDir)
    def tab(k: Int): Map[org.apache.spark.sql.Row, Int] =
      spark.read.parquet(s"$sd/s76tab$k").collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    assert(tab(2) == tab(1), "a rejected attempt must not move the table")
    assert(tab(1) != tab(0) && tab(3) != tab(2),
      "published attempts must move the table")
  }

  test("s77 live MOR: every generation equals the direct predicate complement; vector append-only") {
    val S = graft.streaming.Streaming
    val E = graft.sources.Export
    val (layout, sd, n) = S.s77Build(spark, sfDir)
    val spans = {
      val (a, b) = E.q95Spans(spark, sfDir)
      Seq(a, b)
    }
    val src = Tables.orders(spark, sfDir)
      .select("o_orderkey").as[Long].collect()
    for (k <- 0 to n) {
      val (rows, _, _) = E.q95MorRead(spark, layout, s"$sd/dv$k")
      val got = rows.select("o_orderkey").as[Long].collect().sorted.toSeq
      val expect = src.filterNot(key =>
        spans.take(k).exists(sp => key >= sp._1 && key <= sp._2))
        .sorted.toSeq
      assert(got == expect, s"generation $k MOR read != predicate complement")
    }
    // the vector state only ever appends
    val gens = (0 to n).map(k =>
      spark.read.parquet(s"$sd/dv$k").as[(String, Long)].collect().toSet)
    assert(gens.sliding(2).forall { case Seq(a, b) => a.subsetOf(b) },
      "vector state must be append-only")
    assert(gens.last.size > gens.head.size, "the deletes must land rows")
  }

  test("s78 live index: incremental == rebuild row-for-row; every generation indexes exactly the data-so-far") {
    import org.apache.spark.sql.functions._
    val S = graft.streaming.Streaming
    val E = graft.sources.Export
    val (layout, sd, n) = S.s78Build(spark, sfDir)
    // incremental == rebuild: the folded state IS the (key, file)
    // projection of the final layout, as a multiset
    val inc = spark.read.parquet(s"$sd/idx$n")
      .as[(Long, String)].collect().sorted.toSeq
    val rebuild = spark.read.parquet(layout)
      .select(col("o_orderkey"),
        regexp_extract(col("_metadata.file_path"), "[^/]+$", 0))
      .as[(Long, String)].collect().sorted.toSeq
    assert(inc == rebuild, "incrementally-maintained index != from-scratch rebuild")
    // per-generation closure: generation k indexes exactly the keys
    // of the first k+1 commits — nothing early, nothing missed
    val slices = S.orderSlices(Tables.orders(spark, sfDir))
      .map(_.select("o_orderkey").as[Long].collect().sorted.toSeq)
    for (k <- 0 to n) {
      val want = slices.take(k + 1).flatten.sorted
      val got = spark.read.parquet(s"$sd/idx$k")
        .select("key").as[Long].collect().sorted.toSeq
      assert(got == want, s"generation $k indexes ${got.size} keys, " +
        s"data-so-far has ${want.size}")
    }
    assert(E.listParquet(layout).size > 8,
      "the appends must have landed as new files")
  }

  test("s79 live profiles: stream face == q98 batch release; state at every trigger == partials of data-so-far") {
    import org.apache.spark.sql.functions._
    val S = graft.streaming.Streaming
    val live = SparkEntry.queries("s79_stream_pseudonymize")(spark, sfDir)
      .collect().toSeq
    val batch = SparkEntry.queries("q98_pseudonymize")(spark, sfDir)
      .collect().toSeq
    assert(live == batch, "maintained profile != batch release")
    // generation closure: state k == (pseudo, type) partials of the
    // first k slices, recomputed independently
    val R = graft.operators.Relational
    val sd = S.s79Build(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val slices = S.eventSlices(ev)
    for (k <- 0 to slices.size) {
      val want =
        (if (k == 0) ev.filter(lit(false))
         else slices.take(k).reduce(_ unionByName _))
          .groupBy(R.q98Pseudo(col("user_id")).as("pseudo"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"))
          .as[(String, String, Long, Long)].collect().sorted.toSeq
      val got = spark.read.parquet(s"$sd/s79st$k")
        .as[(String, String, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"generation $k state != data-so-far partials")
    }
  }
}
