package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchOps

/** The replayable HyperLogLog: exact integer registers + estimate, the
  * union-max merge law, and the accuracy the 13%-error layout promises.
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def estOf(values: Seq[Long]): (Long, BigDecimal) = {
    val df = values.map(v => ("g", v)).toDF("g", "v")
    val r = SketchOps.hllCountDistinct(df, Seq("g"), "v").head()
    (r.getAs[Long]("n_zero_registers"), BigDecimal(r.getAs[Long]("est_micro")))
  }

  test("small cardinality takes the linear-counting branch and lands near the truth") {
    val (zeros, estMicro) = estOf(1L to 10L)
    assert(zeros > 0, "10 values cannot fill 64 registers")
    val est = estMicro.toDouble / 1e6
    // linear counting at n << m is tight; 3 of headroom covers collisions
    assert(est >= 7 && est <= 14, s"lc estimate $est too far from 10")
  }

  test("large cardinality takes the raw branch within the 1.04/sqrt(64) error band") {
    val (zeros, estMicro) = estOf(1L to 5000L)
    assert(zeros === 0L, "5000 values must fill all 64 registers")
    val est = estMicro.toDouble / 1e6
    assert(est > 5000 * 0.6 && est < 5000 * 1.4,
      s"raw estimate $est outside 3-sigma of 5000")
  }

  test("registers are duplicate-insensitive and partition-invariant") {
    val vals = (1L to 500L).map(v => ("g", v))
    val once = SketchOps.hllRegisters(vals.toDF("g", "v").repartition(1), Seq("g"), "v")
      .as[(String, Long, Long)].collect().toSet
    val thrice = SketchOps.hllRegisters(
      (vals ++ vals ++ vals).toDF("g", "v").repartition(7), Seq("g"), "v")
      .as[(String, Long, Long)].collect().toSet
    assert(once === thrice)
  }

  test("merge law: union + per-bucket max equals the sketch of the union (and so does the estimate)") {
    val a = (1L to 1000L).map(v => ("g", v)).toDF("g", "v")
    val b = (600L to 2000L).map(v => ("g", v)).toDF("g", "v")
    val merged = SketchOps.hllMerge(
      SketchOps.hllRegisters(a, Seq("g"), "v"),
      SketchOps.hllRegisters(b, Seq("g"), "v"))
      .as[(String, Long, Long)].collect().toSet
    val direct = SketchOps.hllRegisters(a.unionByName(b), Seq("g"), "v")
      .as[(String, Long, Long)].collect().toSet
    assert(merged === direct,
      "sketches must merge losslessly — the distributed-combine property")
  }

  test("CMS: estimates never undercount, and on a sparse fixture they are exact") {
    val df = (Seq.fill(50)(1L) ++ Seq.fill(7)(2L) ++ Seq(3L)).map(("g", _)).toDF("g", "v")
    val sk = SketchOps.cmsSketch(df.drop("g"), Nil, "v")
    val probes = Seq(1L, 2L, 3L, 99L).toDF("v")
    val est = SketchOps.cmsEstimate(sk, probes, "v")
      .as[(Long, Long)].collect().toMap
    // 3 distinct values in 4x256 cells: min-over-rows collision chance is
    // nil, and md5 is fixed — exactness here is deterministic forever
    assert(est === Map(1L -> 50L, 2L -> 7L, 3L -> 1L, 99L -> 0L))
  }

  test("CMS never undercounts on a dense fixture (the one-sided error law)") {
    val vals = (1L to 3000L).flatMap(v => Seq.fill((v % 7 + 1).toInt)(v))
    val sk = SketchOps.cmsSketch(vals.toDF("v"), Nil, "v")
    val probes = (1L to 50L).toDF("v")
    val est = SketchOps.cmsEstimate(sk, probes, "v")
      .as[(Long, Long)].collect().toMap
    (1L to 50L).foreach { v =>
      assert(est(v) >= v % 7 + 1, s"CMS undercounted $v: ${est(v)}")
    }
  }

  test("CMS merge law: union + per-cell sum equals the sketch of the union") {
    val a = (1L to 800L).map(("g", _)).toDF("g", "v")
    val b = (500L to 1500L).map(("g", _)).toDF("g", "v")
    val merged = SketchOps.cmsMerge(
      SketchOps.cmsSketch(a, Seq("g"), "v"),
      SketchOps.cmsSketch(b, Seq("g"), "v"))
      .as[(String, Int, Long, Long)].collect().toSet
    val direct = SketchOps.cmsSketch(a.unionByName(b), Seq("g"), "v")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(merged === direct, "counters are linear — merge must be exact")
  }

  test("CMS sketch is partition-invariant and bounded at d*w cells") {
    val vals = (1L to 5000L).map(v => ("g", v))
    val one = SketchOps.cmsSketch(vals.toDF("g", "v").repartition(1), Seq("g"), "v")
      .as[(String, Int, Long, Long)].collect().toSet
    val many = SketchOps.cmsSketch(vals.toDF("g", "v").repartition(7), Seq("g"), "v")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(one === many)
    assert(one.size <= SketchOps.CmsDepth * SketchOps.CmsWidth,
      s"sketch exceeded d*w cells: ${one.size}")
  }

  test("bottom-k quantiles: partition-invariant (the merge law), exact when k covers the group, monotone, O(1/sqrt k) accurate") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
      SketchOps.bottomKQuantiles(df, Seq("o_orderstatus"), "o_orderkey",
        "o_totalprice", k, Seq(0.25, 0.5, 0.75, 0.95))
    // the merge law, exercised through partial aggregation: ANY
    // partitioning of the input yields the identical sample and so the
    // identical quantiles (bottom-k is associative/commutative)
    val one = sketch(orders.repartition(1), 128).collect().map(_.toSeq).toSet
    val many = sketch(orders.repartition(13), 128).collect().map(_.toSeq).toSet
    assert(one === many, "bottom-k must be partition-invariant (mergeable)")
    // k >= group size: the sample IS the group — rank quantiles exact
    val g = orders.filter(col("o_orderstatus") === "P")
    val n = g.count().toInt
    val exact = g.select(col("o_totalprice").cast("double"), col("o_orderkey"))
      .as[(Double, Long)].collect().sortBy(identity)
    val full = sketch(g, n + 10).head()
    assert(full.getAs[Long]("sample_n") === n.toLong)
    Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95").foreach {
      case (q, c) =>
        val want = exact(math.ceil(q * n).toInt - 1)._1
        assert(full.getAs[Double](c) === want, s"$c must be the exact rank quantile")
    }
    // monotone estimates and O(1/sqrt k) rank accuracy at k=128: the
    // estimated median's true rank within ~3/sqrt(128) of 0.5
    val est = sketch(orders, 128).collect()
    est.foreach { r =>
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50") &&
        r.getAs[Double]("p50") <= r.getAs[Double]("p75") &&
        r.getAs[Double]("p75") <= r.getAs[Double]("p95"), s"quantiles must be monotone: $r")
    }
    val medF = est.find(_.getString(0) == "F").get.getAs[Double]("p50")
    val fVals = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_totalprice").cast("double")).as[Double].collect()
    val trueRank = fVals.count(_ <= medF).toDouble / fVals.length
    assert(math.abs(trueRank - 0.5) < 3.0 / math.sqrt(128),
      s"estimated median's true rank $trueRank must be near 0.5")
  }

  test("bottom-k quantiles: the sampled-id semi join carries NO broadcast hint (AQE decides), names are collision-free, bad ids fail loudly") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val df = SketchOps.bottomKQuantiles(orders, Seq("o_orderstatus"),
      "o_orderkey", "o_totalprice", 16, Seq(0.5, 0.95))
    // a forced broadcast() hint would pin a groups·k-proportional frame
    // into executor memory at ANY group cardinality; the operator must
    // leave the strategy to AQE's observed-size decision
    val hinted = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint != JoinHint.NONE => j
    }
    assert(hinted.isEmpty, s"semi join must be un-hinted, found: $hinted")
    // fractional percents derive distinct names instead of colliding
    val frac = SketchOps.bottomKQuantiles(orders, Seq("o_orderstatus"),
      "o_orderkey", "o_totalprice", 16, Seq(0.996, 1.0))
    assert(frac.columns.count(_ == "p100") == 1 && frac.columns.contains("p99_6"))
    intercept[IllegalArgumentException] {
      SketchOps.bottomKQuantiles(orders, Seq("o_orderstatus"),
        "o_orderkey", "o_totalprice", 16, Seq(0.999999999999, 1.0)) // both round to p100
    }
    // the sample-identity contract is enforced per row, not just documented
    val neg = orders.withColumn("o_orderkey", negate(col("o_orderkey")))
    val ex = intercept[Exception] {
      SketchOps.bottomKQuantiles(neg, Seq("o_orderstatus"),
        "o_orderkey", "o_totalprice", 16, Seq(0.5)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("NULL values are ignored; empty input yields no rows") {
    val df = Seq(Some(1L), None, Some(2L), None).map(("g", _)).toDF("g", "v")
    val regs = SketchOps.hllRegisters(df, Seq("g"), "v")
    val nonNullOnly = SketchOps.hllRegisters(
      Seq(("g", 1L), ("g", 2L)).toDF("g", "v"), Seq("g"), "v")
    assert(regs.as[(String, Long, Long)].collect().toSet ===
      nonNullOnly.as[(String, Long, Long)].collect().toSet)
    assert(SketchOps.hllCountDistinct(
      df.filter(col("v").isNull), Seq("g"), "v").isEmpty)
  }
}
