package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{EventOps, TextOps}

class TextEventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("languageId picks the marker-dominant language, 'und' with no evidence") {
    val df = Seq(
      (1L, "the cat and the dog of the house is in a tree"),
      (2L, "der hund und die katze das ist ein haus"),
      (3L, "el perro y la casa de que es"),
      (4L, "xyzzy plugh frobnicate")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.languageId(col("text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "es")
    assert(out(4L) === "und")
  }

  test("observedQualityFilter: gate metrics accumulate in the SAME pass, no second scan") {
    graft.functions.NativeExpressions.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val (gated, obs) = TextOps.observedQualityFilter(docs, "text")
    val kept = gated.count() // the one action — metrics ride on it
    assert(obs.get("n_in") === docs.count())
    assert(obs.get("n_kept") === kept)
    // metrics must agree with the unobserved gate (single source of truth)
    assert(kept === TextOps.qualityFilter(docs, "text").count())
    // and the observed run is still ONE scan: CollectMetrics in-plan,
    // exactly one parquet read
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), s"metrics not collected in-flight:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"observation must not add a scan:\n$plan")
  }

  test("repetitionRatio: exact on constructed repetition, NULL on too-short docs") {
    val df = Seq(
      (1L, "a b c a b c a b c"),     // 7 3-grams, 3 distinct -> 4/7 duplicated
      (2L, "all words here differ"), // 2 distinct of 2 -> 0.0
      (3L, "too short")              // no 3-grams -> NULL
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(math.rint((1.0 - 3.0 / 7.0) * 1e4) / 1e4))
    assert(out(2L) === Some(0.0))
    assert(out(3L) === None)
  }

  test("charEntropy: zero for single-char docs, ln(2) for an even two-char mix, high for varied text") {
    val df = Seq(
      (1L, "aaaa"),
      (2L, "abab"),
      (3L, "the quick brown fox jumps")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.charEntropy(col("text")).as("h"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L)) === 0.0)
    assert(math.abs(out(2L) - math.log(2)) < 1e-3)
    assert(out(3L) > 2.0, s"varied text entropy ${out(3L)}")
  }

  test("quality features computed exactly on a known sentence") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val row = TextOps.withQualityFeatures(df, "text").head
    assert(row.getAs[Int]("n_tokens") === 4)
    assert(row.getAs[Int]("n_chars_computed") === 19)
    // 16 non-space chars / 4 tokens = 4.0
    assert(row.getAs[Double]("mean_token_len") === 4.0)
    assert(row.getAs[Double]("stopword_ratio") === 0.25) // "the"
  }

  test("fingerprints: md5 matches reference value; rolling hash is order-sensitive") {
    val df = Seq(("abc", "acb")).toDF("t1", "t2")
    val r = df.select(
      TextOps.fingerprint(col("t1")).as("md5"),
      TextOps.rollingFingerprint(col("t1")).as("rh1"),
      TextOps.rollingFingerprint(col("t2")).as("rh2")).head
    assert(r.getAs[String]("md5") === "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    // Horner: ((0*31+97)*31+98)*31+99 = 96354 for "abc"
    assert(r.getAs[Long]("rh1") === 96354L)
    assert(r.getAs[Long]("rh1") !== r.getAs[Long]("rh2"))
  }

  test("sessionize splits on gap boundary exactly") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val events = Seq(
      (1L, 10L, ts(0), 1.0),   // session 1
      (2L, 10L, ts(20), 1.0),  // +20min -> same session
      (3L, 10L, ts(51), 1.0),  // +31min -> NEW session (gap > 30min)
      (4L, 20L, ts(5), 1.0)    // other user
    ).toDF("event_id", "user_id", "ts", "value")
    val sessions = EventOps.sessionStats(events, gapMinutes = 30)
      .select("user_id", "session_seq", "n_events").as[(Long, Long, Long)].collect().toSet
    assert(sessions === Set((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }

  test("sessionize gap is strictly-greater-than (exactly 30min stays in session)") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val events = Seq(
      (1L, 10L, ts(0), 1.0),
      (2L, 10L, ts(30), 1.0) // exactly 30min -> same session
    ).toDF("event_id", "user_id", "ts", "value")
    val n = EventOps.sessionStats(events, 30).count()
    assert(n === 1L)
  }

  test("sessionWindowStats: exact-boundary event MERGES (inclusive), a longer gap splits") {
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val events = Seq(
      (1L, 10L, ts("10:00:00"), 1.0),
      (2L, 10L, ts("10:05:00"), 2.0),  // +5min < 10 -> merges
      (3L, 10L, ts("10:15:00"), 4.0),  // == previous window end -> still MERGES (inclusive boundary)
      (4L, 10L, ts("10:26:00"), 8.0),  // +11min > 10 -> NEW session
      (5L, 20L, ts("10:00:00"), 16.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventOps.sessionWindowStats(events, gapMinutes = 10)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(out === Set(
      (10L, ts("10:00:00"), ts("10:25:00"), 3L, 7.0), // end = last event + gap
      (10L, ts("10:26:00"), ts("10:36:00"), 1L, 8.0),
      (20L, ts("10:00:00"), ts("10:10:00"), 1L, 16.0)))
    // same boundary rule as sessionize's strict-> gap test: the two
    // formulations agree session-for-session
    assert(EventOps.sessionStats(events.filter(col("user_id") === 10L), 10).count() === 2L)
  }

  test("funnel: strict ordering per stage; incomplete or same-timestamp users drop out") {
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    def ev(id: Long, u: Long, t: Timestamp, typ: String) = (id, u, t, typ, 1.0, "{}")
    val events = Seq(
      // user 1 completes: view@10:00, click@10:01, purchase@10:03
      ev(1, 1, ts("10:00:00"), "view"), ev(2, 1, ts("10:01:00"), "click"),
      ev(3, 1, ts("10:03:00"), "purchase"),
      // also a click BEFORE the view (must be ignored) and a later click
      ev(4, 1, ts("09:00:00"), "click"),
      // user 2: click precedes the first view -> no click after view -> out
      ev(5, 2, ts("10:00:00"), "click"), ev(6, 2, ts("10:01:00"), "view"),
      ev(7, 2, ts("10:02:00"), "purchase"),
      // user 3: no click at all -> out
      ev(8, 3, ts("10:00:00"), "view"), ev(9, 3, ts("10:01:00"), "purchase"),
      // user 4: click at the SAME instant as view -> strict > drops it
      ev(10, 4, ts("10:00:00"), "view"), ev(11, 4, ts("10:00:00"), "click"),
      ev(12, 4, ts("10:01:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = EventOps.funnel(events, Seq("view", "click", "purchase"))
      .select("user_id", "t_view", "t_click", "t_purchase", "funnel_micros")
      .as[(Long, Timestamp, Timestamp, Timestamp, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, ts("10:00:00"), ts("10:01:00"), ts("10:03:00"), 180000000L)))
  }

  test("latestPerKey: one deterministic winner per key, ties on ts break by id") {
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val events = Seq(
      (1L, 10L, ts("10:00:00"), "view", 1.0),
      (2L, 10L, ts("10:05:00"), "click", 2.0),  // latest for user 10
      (3L, 20L, ts("09:00:00"), "view", 3.0),
      (4L, 20L, ts("09:00:00"), "purchase", 4.0) // tie on ts -> higher event_id wins
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventOps.latestPerKey(events,
      Seq("user_id"), Seq("ts", "event_id"), Seq("event_type", "value"))
      .select("user_id", "event_id", "event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(out === Set((10L, 2L, "click"), (20L, 4L, "purchase")))
  }

  test("retentionCohorts: hand-computed weekly offsets (cohort = week of first event)") {
    // 2024-01-01 is a Monday: week boundaries land on it exactly
    def ts(d: String) = Timestamp.valueOf(s"2024-01-$d 12:00:00")
    val events = Seq(
      (1L, 1L, ts("01")), (2L, 1L, ts("03")),  // user 1: cohort wk0, active wk0 (twice)
      (3L, 1L, ts("16")),                       // ... and wk2
      (4L, 2L, ts("10"))                        // user 2: cohort wk1, active wk1 only
    ).toDF("event_id", "user_id", "ts")
    val out = EventOps.retentionCohorts(events)
      .as[(Timestamp, Long, Long)].collect()
      .map(r => (r._1.toString.take(10), r._2) -> r._3).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("kneserNeyScores: hand-computed interpolated KN through all backoff guards") {
    // train: docs 0-2; holdout: doc 3 (hash%100 = 87)
    val docs = Seq(
      (0L, "a b c"), (1L, "a b d"), (2L, "b c"),
      (3L, "a b c e")
    ).toDF("doc_id", "text")
    // counts: c3 (a,b,c)=1 (a,b,d)=1; c2 (a,b)=2 (b,c)=2 (b,d)=1; V=4
    // continuation: n1mid (b,c)=1; n1ctx b=2; n1right (a,b)=2;
    //               ntypes b=2; n1luni b=c=d=1; N1+(..)=3
    // (a,b,c): full KN = max(1-.75,0)/2 + .75*(2/2)*p2
    //   p2(c|b) = max(1-.75,0)/2 + .75*(2/2)*p1, p1(c) = (1+1)/(3+4+1)
    // (b,c,e): n1right(b,c) absent (doc-end bigram) -> back off to p2;
    //   n1ctx(c) absent -> back off to p1(e) = (0+1)/8
    val p1c = 2.0 / 8
    val p2c = 0.25 / 2 + (0.75 * (2.0 / 2)) * p1c
    val p3abc = 0.25 / 2 + (0.75 * (2.0 / 2)) * p2c
    val p3bce = 1.0 / 8
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = (r6(-math.log(p3abc)) + r6(-math.log(p3bce))).toDouble
    val out = graft.ops.TextOps.kneserNeyScores(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((3L, 2L, expected)))
  }

  test("sourceFreshness: exact integer staleness, pass/warn/error thresholds") {
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val events = Seq(
      ("a", ts("12:00:00")), ("a", ts("11:00:00")), // latest 12:00 = anchor -> 0min pass
      ("b", ts("11:30:30")),                        // 29.5min -> floor 29 -> warn
      ("c", ts("09:00:00"))                         // 180min -> error
    ).toDF("src", "ts")
    val out = graft.quality.Checks.sourceFreshness(
      events, "src", "ts", warnAfterMinutes = 15, errorAfterMinutes = 60)
      .select("src", "staleness_minutes", "freshness_status")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      "a" -> ((0L, "pass")), "b" -> ((29L, "warn")), "c" -> ((180L, "error"))))
  }

  test("unigramLearn: hand-derived Viterbi segmentation, char floor, and fixed-point costs") {
    // corpus: "abab abab cd" -> words abab (w=2), cd (w=1)
    // round 1: Viterbi picks the whole-word pieces (one ~2.4M/3.1M cost
    // beats any two-piece >=3.5M split), so used = {abab:2, cd:1};
    // chars floor in at 1 -> total 7
    // round 2: same segmentation survives (substrings like 'ab'/'bab'
    // were pruned, whole words stay cheapest); final vocab is stable
    val docs = Seq((1L, "abab abab"), (2L, "cd")).toDF("doc_id", "text")
    def cost(c: Long, total: Long): Long =
      math.round(-math.log(c.toDouble / total.toDouble) * 1e6)
    val out = graft.ops.TextOps.unigramLearn(docs, "text")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("abab", 2L, cost(2, 7)),
      ("a", 1L, cost(1, 7)), ("b", 1L, cost(1, 7)), ("c", 1L, cost(1, 7)),
      ("cd", 1L, cost(1, 7)), ("d", 1L, cost(1, 7))))
    val seg = graft.ops.TextOps.unigramSegment(docs, "text")
      .as[(String, Long, String)].collect()
      .map { case (wd, n, s) => wd -> ((n, s)) }.toMap
    assert(seg === Map("abab" -> ((2L, "abab")), "cd" -> ((1L, "cd"))))
  }

  test("unigramLearn: deterministic under repartitioning (integer DP, no float argmin)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(df: org.apache.spark.sql.DataFrame) = graft.ops.TextOps
      .unigramLearn(df, "text").collect().map(_.toSeq).toSeq
    assert(run(docs.repartition(1)) === run(docs.repartition(7)))
  }

  test("trigramBackoffScores: hand-computed backoff through all three tiers") {
    // Knuth-hash split at 80: ids 0,1,2 land in train, 3 and 11 in
    // holdout (hash%100 = 87 and 95 — derived below so drift is loud)
    def h(id: Long) = ((id % 2147483648L) * 2654435761L) % 4294967296L % 100L
    assert(Seq(0L, 1L, 2L).forall(h(_) < 80) && h(3L) === 87L && h(11L) === 95L)
    val docs = Seq(
      (0L, "a b c"),   // train: c3("a b c")=1
      (1L, "b c d"),   // train: c3("b c d")=1; c2("b c")=2
      (2L, "d e"),     // train: c2("d e")=1
      (3L, "a b c d e z"), // holdout: 4 trigram positions
      (11L, "x y")     // holdout, <3 tokens -> absent
    ).toDF("doc_id", "text")
    // train counts: c1 a=1 b=2 c=2 d=2 e=1, N=8, V=5
    // pos1 (a,b,c): seen trigram, ctx "a b"=1 -> S=1
    // pos2 (b,c,d): seen trigram, ctx "b c"=2 -> S=1/2
    // pos3 (c,d,e): unseen tri; bigram "d e"=1, c1(d)=2 -> S=0.4*(1/2)
    // pos4 (d,e,z): unseen tri and bigram; OOV z -> S=0.4*(0.4*(1/13))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = (r6(-math.log(1.0)) + r6(-math.log(0.5)) +
      r6(-math.log(0.4 * (1.0 / 2))) + r6(-math.log(0.4 * (0.4 * (1.0 / 13))))).toDouble
    val out = graft.ops.TextOps
      .trigramBackoffScores(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((3L, 4L, expected)))
  }

  test("sourceFreshness: boundary ages follow dbt's strict-> rule on un-floored micros") {
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val events = Seq(
      ("anchor", ts("12:00:00")),
      ("at_warn", ts("11:45:00")),        // exactly warn_after=15min -> still pass (dbt: strictly after)
      ("past_warn", ts("11:44:59.999999")), // 1 micro past -> warn, though floor is still 15min
      ("at_error", ts("11:00:00")),       // exactly error_after=60min -> warn, not error
      ("past_error", ts("10:59:59.999999")) // 1 micro past -> error
    ).toDF("src", "ts")
    val out = graft.quality.Checks.sourceFreshness(
      events, "src", "ts", warnAfterMinutes = 15, errorAfterMinutes = 60)
      .select("src", "staleness_minutes", "freshness_status")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      "anchor" -> ((0L, "pass")),
      "at_warn" -> ((15L, "pass")),
      "past_warn" -> ((15L, "warn")),
      "at_error" -> ((60L, "warn")),
      "past_error" -> ((60L, "error"))))
  }

  test("tumblingCounts buckets by hour with flat schema") {
    val events = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:15:00"), "click", 2.0, "{}"),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:45:00"), "click", 3.0, "{}"),
      (3L, 1L, Timestamp.valueOf("2024-01-01 11:05:00"), "click", 5.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val out = EventOps.tumblingCounts(events, "hour")
      .select("window_start", "n_events", "total_value")
      .as[(Timestamp, Long, Double)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(out("2024-01-01 10:00:00.0") === ((2L, 5.0)))
    assert(out("2024-01-01 11:00:00.0") === ((1L, 5.0)))
  }

  test("naiveBayes: hand-computed smoothed scores pick the right class; ties break lexicographically") {
    import graft.ops.ClassifyOps
    // V = {the, le}; doc 3 "le": fr wins (ln(1/3)+ln(2/3) > ln(2/3)+ln(1/5));
    // docs 1-2 "the...": en wins — all hand-checked
    val docs = Seq(
      (1L, "en", "the the"), (2L, "en", "the"), (3L, "fr", "le")
    ).toDF("doc_id", "lang", "text")
    val pred = ClassifyOps.naiveBayesPredict(docs, "doc_id", "lang", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pred === Map(1L -> "en", 2L -> "en", 3L -> "fr"))
    val conf = ClassifyOps.naiveBayesConfusion(docs, "doc_id", "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(conf === Set(("en", "en", 2L), ("fr", "fr", 1L)))
    // perfectly symmetric corpus: every score ties, the lexicographically
    // smallest class must win deterministically
    val tied = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("doc_id", "lang", "text")
    val tiedPred = ClassifyOps.naiveBayesPredict(tied, "doc_id", "lang", "text")
      .collect().map(r => r.getString(2)).toSet
    assert(tiedPred === Set("a"))
  }

  test("bpeLearnMerges: hand-computed merges on the classic low/lower/newest corpus") {
    // words: low×5, lower×2, newest×3
    // round 1: (l,o)=7 ties (o,w)=7 → lexicographic lhs wins → (l,o)
    // round 2: (lo,w)=7   round 3: max freq 3, lex-first pair is (e,s)
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest")
    ).toDF("doc_id", "text")
    val out = TextOps.bpeLearnMerges(docs, "text", numMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(out === Set((1, "l", "o", 7L), (2, "lo", "w", 7L), (3, "e", "s", 3L)))
  }

  test("bpeLearnMerges: greedy left-to-right merge (aaaa -> [aa][aa]) and early exhaustion") {
    // word aaaa×3: round 1 pair (a,a) occurs 3×/word = freq 9, and the
    // greedy merge leaves [aa][aa] (NOT [a][aa][a] or overlap); round 2
    // merges (aa,aa)=3; round 3 has no pairs left -> stops at 2 rows
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val out = TextOps.bpeLearnMerges(docs, "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSet === Set((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("bpeSegment: the learned merges segment the vocabulary as hand-derived") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest")
    ).toDF("doc_id", "text")
    // merges after 3 rounds: (l,o), (lo,w), (e,s) — see the learn spec
    val seg = TextOps.bpeSegment(docs, "text", numMerges = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(seg("low") === ((5L, "low")))
    assert(seg("lower") === ((2L, "low.e.r")))
    assert(seg("newest") === ((3L, "n.e.w.es.t")))
  }

  test("bpeApply: learned merges segment UNSEEN words by the trained subwords") {
    val train = Seq(
      (1L, "low low low low low"), (2L, "lower lower"), (3L, "newest newest newest")
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeLearnMerges(train, "text", numMerges = 3)
      .orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("e", "s")))
    // "lowest"/"slow" were never in training, but segment by the
    // learned subwords (lowest -> low+es+t; slow -> s+low via the
    // chained lo then lo+w merges); a fully-novel word stays chars
    val newDocs = Seq((10L, "lowest slow"), (11L, "zzz")).toDF("doc_id", "text")
    val out = TextOps.bpeApply(newDocs, "text", merges)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(10L) === "low.es.t s.low")
    assert(out(11L) === "z.z.z")
  }

  test("wordpieceLearnMerges: likelihood scoring picks the exclusive pair over the frequent one") {
    import graft.ops.TextOps
    // corpus: "ab"×4, "cd"×3, "ac"×5. Symbol counts: a=9, b=4, c=8, d=3.
    // pair freqs: (a,b)=4, (c,d)=3, (a,c)=5. BPE would merge (a,c)
    // (max freq); WordPiece scores (·10^12, truncating div):
    //   (a,b): 4e12/36 = 111111111111
    //   (c,d): 3e12/24 = 125000000000   <- winner
    //   (a,c): 5e12/72 =  69444444444
    val docs = Seq(
      (1L, "ab ab ab ab cd cd cd"),
      (2L, "ac ac ac ac ac")
    ).toDF("doc_id", "text")
    val m = TextOps.wordpieceLearnMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, Long, Long)].collect()
    assert(m.toSeq === Seq((1, "c", "d", 3L, 125000000000L)))
    val bpe = TextOps.bpeLearnMerges(docs, "text", numMerges = 1)
      .as[(Int, String, String, Long)].collect()
    assert(bpe.toSeq === Seq((1, "a", "c", 5L)), "BPE must still pick raw frequency")
  }

  test("bigramLmScores: hand-computed add-one model on a 3-doc corpus") {
    // tokens: a×3 b×2 c×1 → V=3; c1(a)=3; bigrams: "a b"×2, "a c"×1
    // doc 1,2: -ln((2+1)/(3+3)) = ln 2;  doc 3: -ln((1+1)/(3+3)) = ln 3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - 0.693147) < 1e-9) // round(ln 2, 6)
    assert(math.abs(out(2L)._2 - 0.693147) < 1e-9)
    assert(math.abs(out(3L)._2 - 1.098612) < 1e-9) // round(ln 3, 6)
    // a common-bigram doc scores LOWER nll per bigram than a rare-bigram
    // doc — the quality-ranking property the CCNet filter relies on
    assert(out(1L)._2 < out(3L)._2)
  }

  test("bigramLmScores: single-token docs have no bigrams and drop out; terms sum per doc") {
    val docs = Seq((1L, "a"), (2L, "a b a b")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!out.contains(1L))
    // corpus: a×3 b×2, V=2; c2("a b")=2, c2("b a")=1
    // nll = 2·(-ln(3/5)) + 1·(-ln(2/4)) with per-term round(…,6)
    val expected = 2 * 0.510826 + 0.693147 // round(ln(5/3),6), round(ln 2,6)
    assert(out(2L)._1 === 3L)
    assert(math.abs(out(2L)._2 - expected) < 1e-9)
  }

  test("pmiPairs: hand-computed micro-PMI incl. a negative association; support filter prunes") {
    // dw: d1{a,b} d2{a,b} d3{a,c} d4{c,d} → N=4; cw: a=3 b=2 c=2 d=1
    // pairs: (a,b)=2 → ln(8/6)  = 287682 µ
    //        (a,c)=1 → ln(4/6)  = −405465 µ (negative association)
    //        (c,d)=1 → ln(4/2)  = 693147 µ
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "a c"), (4L, "c d"))
      .toDF("doc_id", "text")
    val out = TextOps.pmiPairs(docs, "doc_id", "text", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 287682L)),
      ("a", "c") -> ((1L, -405465L)),
      ("c", "d") -> ((1L, 693147L))))
    val supported = TextOps.pmiPairs(docs, "doc_id", "text", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(supported === Set(("a", "b")))
  }

  test("bm25Scores: hand-computed integer scores on a 3-doc corpus; absent terms drop docs; query dup dedupes") {
    // corpus: (1, "a b"), (2, "a"), (3, "c c c") → N=3, L=6;
    // df: a=2, b=1, c=1; idf_micro = round(ln((2N+2)/(2df+1))·1e6):
    //   a: ln(8/5) → 470004;  b, c: ln(8/3) → 980829
    // term = idf·22·tf·L div (10·tf·L + 3·L + 9·len·N):
    //   doc1 (len 2): den = 60+18+54 = 132 = 22·1·6 → term = idf exactly
    //   doc2 (len 1): den = 105 → floor(470004·132/105) = 590862
    //   doc3 (len 3, tf 3): den = 279, num = 396 → floor(980829·396/279)
    //                       = 1392144
    val docs = Seq((1L, "a b"), (2L, "a"), (3L, "c c c")).toDF("doc_id", "text")
    val out = TextOps.bm25Scores(docs, "doc_id", "text",
        Seq(("q1", "a b"), ("q2", "c"), ("q3", "a a")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("q1", 1L) -> (470004L + 980829L), ("q1", 2L) -> 590862L,
      ("q2", 3L) -> 1392144L,
      ("q3", 1L) -> 470004L, ("q3", 2L) -> 590862L))
    // ranking property: the doc matching BOTH query terms outranks the
    // partial match
    assert(out(("q1", 1L)) > out(("q1", 2L)))
  }

  test("depth2TreeConfusion: a perfectly separating word becomes the root split; holdout confusion is diagonal") {
    import graft.ops.ClassifyOps
    // label = doc contains "zebra"; positives are all "zebra apple",
    // negatives all "apple". The unique zero-error root candidate is
    // (bucket("zebra"), θ=1) — every other (b, θ) puts all docs on one
    // side, erring min(P, N) > 0 — so the trained root is knowable
    // without computing a single md5. (Even under a zebra/apple bucket
    // collision the shared bucket separates at θ=2, so the property
    // holds regardless.) Classes share identical text, so each holdout
    // doc routes exactly like its train twins → diagonal confusion.
    def knuth(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L % 100L
    val ids = 0L until 40L
    val docs = ids.map(i => (i, if (i % 2 == 0) "zebra apple" else "apple"))
      .toDF("doc_id", "text")
    val out = ClassifyOps.depth2TreeConfusion(docs, "doc_id", "text",
        array_contains(split(col("text"), " "), "zebra"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val holdPos = ids.count(i => knuth(i) >= 80 && i % 2 == 0).toLong
    val holdNeg = ids.count(i => knuth(i) >= 80 && i % 2 == 1).toLong
    assert(holdPos > 0 && holdNeg > 0, "fixture must land both classes in the holdout")
    assert(out === Map((1L, 1L) -> holdPos, (-1L, -1L) -> holdNeg))
  }

  test("depth2TreeConfusion: the second level refines what the root cannot separate") {
    import graft.ops.ClassifyOps
    // label = contains "zebra" AND "quartz" — no single bucket separates
    // (zebra alone and quartz alone both appear in negatives), so the
    // depth-1 root MUST err on at least one train doc while depth 2
    // reaches zero train error; texts are class-identical again, so a
    // perfectly-fit tree ⇒ diagonal holdout confusion. Positives are
    // HALF the corpus (classes 0,1 of i%4) so that splitting on the
    // zebra (or quartz) bucket — err = the smaller negative family —
    // strictly beats the degenerate all-on-one-side split (err =
    // min(P, N) = both families); with equal thirds they would tie and
    // the root argmin would fall to md5 bucket order.
    def knuth(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 4294967296L % 100L
    val ids = 0L until 60L
    val docs = ids.map { i =>
      val text = i % 4 match {
        case 0 | 1 => "zebra quartz mango" // +1
        case 2     => "zebra mango"        // -1: zebra but no quartz
        case _     => "quartz mango"       // -1: quartz but no zebra
      }
      (i, text)
    }.toDF("doc_id", "text")
    val tk = split(col("text"), " ")
    val out = ClassifyOps.depth2TreeConfusion(docs, "doc_id", "text",
        array_contains(tk, "zebra") && array_contains(tk, "quartz"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val trainP = ids.count(i => knuth(i) < 80 && i % 4 <= 1).toLong
    val trainZM = ids.count(i => knuth(i) < 80 && i % 4 == 2).toLong
    val trainQM = ids.count(i => knuth(i) < 80 && i % 4 == 3).toLong
    assert(trainZM > 0 && trainQM > 0 &&
      math.min(trainZM, trainQM) < math.min(trainP, trainZM + trainQM),
      "fixture must make the informative root split strictly best")
    val holdPos = ids.count(i => knuth(i) >= 80 && i % 4 <= 1).toLong
    val holdNeg = ids.count(i => knuth(i) >= 80 && i % 4 > 1).toLong
    assert(holdPos > 0 && holdNeg > 0, "fixture must land both classes in the holdout")
    assert(out === Map((1L, 1L) -> holdPos, (-1L, -1L) -> holdNeg))
  }

  test("topPaths: sessions split at the gap, paths truncate at maxSteps, ties order by event_id") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1, session 1: a > b > c; session 2 after a 2h gap: a > b
      (1L, 1L, ts("2024-01-10 10:00:00"), "a", 0.0),
      (2L, 1L, ts("2024-01-10 10:05:00"), "b", 0.0),
      (3L, 1L, ts("2024-01-10 10:10:00"), "c", 0.0),
      (4L, 1L, ts("2024-01-10 13:00:00"), "a", 0.0),
      (5L, 1L, ts("2024-01-10 13:05:00"), "b", 0.0),
      // user 2: one 7-event session — the path stops at step 5
      (10L, 2L, ts("2024-01-10 10:00:00"), "a", 0.0),
      (11L, 2L, ts("2024-01-10 10:01:00"), "b", 0.0),
      (12L, 2L, ts("2024-01-10 10:02:00"), "c", 0.0),
      (13L, 2L, ts("2024-01-10 10:03:00"), "d", 0.0),
      (14L, 2L, ts("2024-01-10 10:04:00"), "e", 0.0),
      (15L, 2L, ts("2024-01-10 10:05:00"), "f", 0.0),
      (16L, 2L, ts("2024-01-10 10:06:00"), "g", 0.0),
      // user 3: same ts twice — event_id orders the path
      (21L, 3L, ts("2024-01-10 10:00:00"), "x", 0.0),
      (20L, 3L, ts("2024-01-10 10:00:00"), "y", 0.0),
      // user 4: replicates user 1's first path → count 2
      (30L, 4L, ts("2024-01-10 10:00:00"), "a", 0.0),
      (31L, 4L, ts("2024-01-10 10:05:00"), "b", 0.0),
      (32L, 4L, ts("2024-01-10 10:10:00"), "c", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventOps.topPaths(events, gapMinutes = 30, maxSteps = 5, k = 10)
      .as[(String, Long)].collect().toList
    assert(out === List(
      ("a>b>c", 2L), // count DESC first, then path ASC
      ("a>b", 1L), ("a>b>c>d>e", 1L), ("y>x", 1L)))
  }

  test("attribution: hand-computed four-model credits; ties by id, lookback boundary, no-touch drops") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: view, click, view → purchase 10.0 (n=3, first+last both view)
      (1L, 1L, ts("2024-01-10 10:00:00"), "view", 0.0),
      (2L, 1L, ts("2024-01-10 11:00:00"), "click", 0.0),
      (3L, 1L, ts("2024-01-10 12:00:00"), "view", 0.0),
      (4L, 1L, ts("2024-01-10 13:00:00"), "purchase", 10.0),
      // user 2: click & view at the SAME ts → id decides first vs last (n=2)
      (10L, 2L, ts("2024-01-10 10:00:00"), "click", 0.0),
      (11L, 2L, ts("2024-01-10 10:00:00"), "view", 0.0),
      (12L, 2L, ts("2024-01-10 11:00:00"), "purchase", 5.0),
      // user 3: touch 10 days before conversion → outside lookback, drops
      (20L, 3L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (21L, 3L, ts("2024-01-11 10:00:00"), "purchase", 3.0),
      // user 5: touch AFTER the conversion → no credit
      (40L, 5L, ts("2024-01-10 10:00:00"), "purchase", 2.0),
      (41L, 5L, ts("2024-01-10 11:00:00"), "click", 0.0),
      // user 6: touch exactly 7 days before → >= boundary INCLUDES it (n=1)
      (50L, 6L, ts("2024-01-03 10:00:00"), "view", 0.0),
      (51L, 6L, ts("2024-01-10 10:00:00"), "purchase", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = EventOps.attribution(events, Seq("view", "click"), "purchase", 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2).toLong, r.getDouble(3).toLong,
        r.getDouble(4).toLong, r.getDouble(5).toLong)).toMap
    // view: u1 first 10e6 + last 10e6, linear 2*(10e6 div 3), position 2*(2*10e6 div 5)
    //       u2 last 5e6 (id 11 > 10 at equal ts), linear/position 5e6 div 2
    //       u6 all models 1e6 (single touch)
    assert(out("view") === ((4L, 11000000L, 16000000L,
      3333333L + 3333333L + 2500000L + 1000000L,
      4000000L + 4000000L + 2500000L + 1000000L)))
    // click: u1 middle (linear 10e6 div 3, position 10e6 div 5), u2 first
    assert(out("click") === ((2L, 5000000L, 0L,
      3333333L + 2500000L, 2000000L + 2500000L)))
  }

  test("textRankKeywords: the connector word outranks leaves; singletons and self-loops drop") {
    import spark.implicits._
    // star-of-words corpus: 'x' is adjacent to a, b, c, d across docs;
    // leaves touch only x. Graph: x—a, x—b, x—c, x—d (dedup pins that
    // repeated adjacency adds no weight); 'solo' has no pairs; 'z z'
    // is a self-loop and must vanish.
    val docs = Seq(
      (1L, "a x b"), (2L, "c x d"), (3L, "a x b"), // duplicate adjacency
      (4L, "solo"), (5L, "z z")
    ).toDF("doc_id", "text")
    val out = TextOps.textRankKeywords(docs, "text", iterations = 3, k = 10)
      .as[(String, Long)].collect()
    assert(out.map(_._1).toSet === Set("a", "b", "c", "d", "x"),
      "singletons and self-loops must not enter the graph")
    assert(out.head._1 === "x", s"the hub must rank first, got ${out.toList}")
    // degree symmetry: the four leaves are structurally identical
    val leafRanks = out.filter(_._1 != "x").map(_._2).toSet
    assert(leafRanks.size === 1, s"leaves must tie exactly: ${out.toList}")
    // partition invariance: same ranks from a repartitioned corpus
    val out2 = TextOps.textRankKeywords(docs.repartition(7), "text", 3, 10)
      .as[(String, Long)].collect()
    assert(out2.toList === out.toList)
  }

  test("rrfFuse: hand-computed fusion, missing legs contribute 0, ties break by doc id") {
    import spark.implicits._
    // leg A ranks d1 #1, d2 #2, d5 #3; leg B ranks d2 #1, d3 #2, d4 #3
    val a = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 5L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3)).toDF("query_id", "doc_id", "rank")
    val out = TextOps.rrfFuse(Seq(a, b), k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toList
      .sortBy(_._3)
    // 1000000 div 61 = 16393, div 62 = 16129, div 63 = 15873
    // d2 = 16129 + 16393 = 32522; d1 = 16393; d3 = 16129; d4 = d5 = 15873
    // the d4/d5 tie breaks by smaller doc id
    assert(out === List(
      (2L, 32522L, 1), (1L, 16393L, 2), (3L, 16129L, 3),
      (4L, 15873L, 4), (5L, 15873L, 5)))
  }
}
