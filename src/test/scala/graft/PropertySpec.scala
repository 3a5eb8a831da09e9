package graft

import org.apache.spark.sql.functions._

import graft.models.Jaffle
import graft.ops.{DedupOps, SkewOps}

/** Property-based invariants (SURVEY §5.4) over seeded random data — the
  * complement to the golden-value and oracle tests. Plain seeded
  * generation (no scalatestplus bridge in the offline dep set); 5 trials
  * per property, deterministic across runs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def trials[A](n: Int)(body: scala.util.Random => Unit): Unit =
    (0 until n).foreach(i => body(new scala.util.Random(1000 + i)))

  test("property: orders-mart pivot columns always sum to amount; row count preserved") {
    trials(5) { rnd =>
      val rawPayments = (1 to 120).map { i =>
        (i, rnd.nextInt(60) + 1, Jaffle.PaymentMethods(rnd.nextInt(4)), rnd.nextInt(5000))
      }.toDF("id", "order_id", "payment_method", "amount")
      val rawOrders = (1 to 50).map { i =>
        (i, rnd.nextInt(30) + 1, f"2018-01-${rnd.nextInt(28) + 1}%02d", Jaffle.OrderStatuses(rnd.nextInt(5)))
      }.toDF("id", "user_id", "order_date", "status")
        .withColumn("order_date", col("order_date").cast("date"))
      val mart = Jaffle.orders(
        Jaffle.stgOrders(rawOrders), Jaffle.stgPayments(rawPayments)).cache()
      // row preservation: left join keeps every order
      assert(mart.count() === 50L)
      // pivot exhaustiveness: methods cover all payments, so parts == total
      val broken = mart.filter(col("amount").isNotNull &&
        col("credit_card_amount") + col("coupon_amount") +
          col("bank_transfer_amount") + col("gift_card_amount") =!= col("amount"))
      assert(broken.count() === 0L)
      mart.unpersist()
    }
  }

  test("property: exactDedup is idempotent and count-preserving") {
    trials(5) { rnd =>
      val texts = Seq.fill(80)("abcde".charAt(rnd.nextInt(5)).toString)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = DedupOps.exactDedup(docs, "doc_id", Seq("text")).cache()
      // copies add back to the original row count
      assert(once.agg(sum("n_copies")).head.getLong(0) === 80L)
      // dedup of the deduped output changes nothing
      val twice = DedupOps.exactDedup(
        once.select(col("doc_id"), col("text")), "doc_id", Seq("text"))
      assert(twice.count() === once.count())
      assert(twice.filter(col("n_copies") =!= 1).count() === 0L)
      once.unpersist()
    }
  }

  test("property: saltedJoin equals the plain join under key skew") {
    trials(5) { rnd =>
      // skewed: most rows land on keys 1-2
      val fact = (0 until 200).map { i =>
        (if (rnd.nextDouble() < 0.7) 1 + rnd.nextInt(2) else 1 + rnd.nextInt(5), rnd.nextInt(1000), i.toLong)
      }.toDF("k", "v", "row_id")
      val dim = Seq((1, "one"), (2, "two"), (3, "three"), (4, "four"), (5, "five"), (6, "six"))
        .toDF("k", "name")
      val plain = fact.join(dim, Seq("k")).select("row_id", "name")
        .as[(Long, String)].collect().toSet
      val salted = SkewOps.saltedJoin(fact, dim, "k", col("row_id"), factor = 4)
        .select("row_id", "name").as[(Long, String)].collect().toSet
      assert(salted === plain)
    }
  }

  test("property: dedup of exact copies halves a doubled corpus") {
    trials(3) { rnd =>
      val base = (0 until 40).map(i => (i.toLong, s"doc content ${rnd.nextInt(10000)} $i"))
      val doubled = (base ++ base.map { case (id, t) => (id + 1000, t) })
        .toDF("doc_id", "text")
      val out = DedupOps.exactDedup(doubled, "doc_id", Seq("text"))
      assert(out.count() === 40L)
      // winner is always the lower id (the original, not the +1000 copy)
      assert(out.filter(col("doc_id") >= 1000).count() === 0L)
    }
  }

  test("property: graft_topk equals sort-take on random data, any k") {
    graft.functions.NativeExpressions.register(spark)
    trials(5) { rnd =>
      val k = 1 + rnd.nextInt(4)
      val rows = Seq.fill(300)((rnd.nextInt(8).toLong,
        rnd.nextInt(20).toDouble, // coarse values force ties
        rnd.nextInt(1000).toLong))
      val df = rows.toDF("g", "v", "p")
      val got = df.groupBy("g").agg(expr(s"graft_topk(v, p, $k)").as("top"))
        .as[(Long, Seq[(Double, Long)])].collect().toMap
      // reference: sort by (value desc, payload asc), take k
      val ref = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sortBy { case (v, p) => (-v, p) }.take(k)
      }
      got.foreach { case (g, top) => assert(top === ref(g), s"group $g k=$k") }
      assert(got.keySet === ref.keySet)
    }
  }

  test("property: asOfJoinNative equals the composition on random skewed data") {
    trials(3) { rnd =>
      val left = Seq.fill(200)((rnd.nextInt(500).toLong,
        rnd.nextInt(6).toLong, // few keys: many per-key rows
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
        .toDF("id", "k", "t")
      val right = Seq.fill(80)((rnd.nextInt(8).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextInt(1000).toDouble))
        .toDF("rk", "rt", "v")
      val native = graft.ops.TemporalOps.asOfJoinNative(left, "k", "t", right, "rk", "rt", Seq("v"))
        .collect().map(_.toString).sorted
      val composed = graft.ops.TemporalOps.asOfJoin(left, "k", "t", right, "rk", "rt", Seq("v"))
        .collect().map(_.toString).sorted
      assert(native.sameElements(composed))
    }
  }

  test("property: hashSplit partitions any id set disjointly at any cutoff") {
    trials(5) { rnd =>
      val cut = rnd.nextInt(98) + 1
      val ids = Seq.fill(200)(rnd.nextLong().abs % 1000000L).distinct.toDF("id")
      val n = ids.count()
      val out = graft.ops.SampleOps.hashSplit(ids, "id", cut).cache()
      // disjoint-exhaustive: every row gets exactly one of the two labels
      assert(out.filter(col("split").isin("train", "holdout")).count() === n)
      // stable: same cutoff → same assignment (no rand() anywhere)
      val again = graft.ops.SampleOps.hashSplit(ids, "id", cut)
      assert(out.select("id", "split").exceptAll(again.select("id", "split")).count() === 0L)
      out.unpersist()
    }
  }

  test("property: perGroupCap keeps min(n, group size) rows per group, always a subset") {
    trials(5) { rnd =>
      val cap = rnd.nextInt(10) + 1
      val rows = Seq.fill(150)((s"g${rnd.nextInt(8)}", rnd.nextLong().abs % 100000L))
        .distinct
      val df = rows.toDF("grp", "id")
      val out = graft.ops.SampleOps.perGroupCap(df, Seq("grp"), "id", cap)
      val keptPerGroup = out.groupBy("grp").count().as[(String, Long)].collect().toMap
      val sizePerGroup = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      sizePerGroup.foreach { case (g, sz) =>
        assert(keptPerGroup.getOrElse(g, 0L) === math.min(cap.toLong, sz), s"group $g cap $cap")
      }
      // subset: no invented rows
      assert(out.select("grp", "id").exceptAll(df).count() === 0L)
    }
  }

  test("property: connectedComponents labels agree with a reference union-find") {
    trials(5) { rnd =>
      val nodes = 30
      val pairs = Seq.fill(25)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference union-find on the driver
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(v => v -> {
          // root of the union-find tree, then the MIN member of that
          // component (union-by-min above makes the root the min already)
          find(v.toInt).toLong
        }).toMap
      val got = DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("FAILFAST seed loading rejects malformed rows instead of nulling them") {
    val dir = java.nio.file.Files.createTempDirectory("badseed")
    java.nio.file.Files.writeString(dir.resolve("raw_customers.csv"),
      "id,first_name,last_name\n1,Ann,A.\nnot_an_int,Bob,B.\n")
    val ex = intercept[Throwable] {
      graft.seed.SeedLoader.loadCsv(spark, dir.resolve("raw_customers.csv").toString,
        graft.schema.Schemas.rawCustomers).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m => m.contains("MALFORMED") || m.contains("FAILFAST") || m.contains("Malformed")))
  }

  test("property: rollup routing is SOUND — a skipped table provably holds no matching row") {
    import graft.sources.ManifestTable
    trials(3) { rnd =>
      val root = java.nio.file.Files.createTempDirectory("prop_rollup").toString
      val n = 200 + rnd.nextInt(300)
      val base = rnd.nextInt(100000).toLong
      val rows = (0 until n).map { i =>
        (base + rnd.nextInt(5000).toLong,
          if (rnd.nextInt(10) == 0) null else s"s${rnd.nextInt(40)}",
          rnd.nextDouble() * 1000 - 500)
      }
      val df = rows.toDF("k", "s", "x").repartition(3 + rnd.nextInt(4))
      ManifestTable.create(spark, root, df, statsColumns = Seq("k", "s", "x"))
      val probes = Seq(
        col("k") === (base + rnd.nextInt(8000).toLong),
        col("k") > (base + rnd.nextInt(8000).toLong),
        col("k") < base, // provably out of range
        col("s") === s"s${rnd.nextInt(60)}",
        col("s").isNull,
        col("x") > rnd.nextDouble() * 2000 - 1000,
        col("k").isin((0 until 5).map(_ => base + rnd.nextInt(8000).toLong): _*),
        col("k") > (base + 2000L) && col("x") < 0.0,
        col("s") === "s1" || col("k") === base)
      probes.foreach { p =>
        val matches = ManifestTable.read(spark, root).filter(p).count()
        val may = ManifestTable.tableMayMatch(spark, root, p)
        // SOUNDNESS: a skipped table must be provably empty for p —
        // never the other direction (keep-bias allows may && matches==0)
        assert(may || matches === 0L, s"rollup unsoundly skipped $p with $matches matching rows")
        // and the pruned read agrees with the plain filtered read exactly
        assert(ManifestTable.readPruned(spark, root, p).count() === matches, s"pruned read diverges for $p")
        val (cnt, _, _) = ManifestTable.countWhere(spark, root, p)
        assert(cnt === matches, s"countWhere diverges for $p")
      }
    }
  }

  test("property: column mapping is invisible to every read path (rename + append + CoW)") {
    import graft.sources.ManifestTable
    trials(3) { rnd =>
      val root = java.nio.file.Files.createTempDirectory("prop_colmap").toString
      val n = 150 + rnd.nextInt(200)
      val rows = (0 until n).map(i => (i.toLong, s"v${rnd.nextInt(50)}", rnd.nextInt(1000)))
      val (a, b) = rows.partition(_._1 % 2 == 0)
      ManifestTable.create(spark, root,
        a.toDF("id", "tag", "amt").repartitionByRange(3, col("id")),
        statsColumns = Seq("id"))
      ManifestTable.renameColumn(spark, root, "id", "row_id")
      ManifestTable.renameColumn(spark, root, "tag", "label")
      ManifestTable.append(spark, root,
        b.toDF("row_id", "label", "amt").repartitionByRange(3, col("row_id")),
        statsColumns = Seq("row_id"))
      // delete a random slice copy-on-write through the mapping
      val cut = rnd.nextInt(n).toLong
      ManifestTable.delete(spark, root, col("row_id") < cut, statsColumns = Seq("row_id"))
      val expected = rows.filter(_._1 >= cut).map { case (i, t, m) => (i, t, m) }.toSet
      val got = ManifestTable.read(spark, root)
        .select("row_id", "label", "amt").as[(Long, String, Int)].collect().toSet
      assert(got === expected, "mapped reads must serve exactly the logical content")
      // pruned point reads agree row-for-row under the logical names
      val probe = cut + rnd.nextInt(math.max(1, (n - cut).toInt)).toLong
      val viaPrune = ManifestTable.readPruned(spark, root, col("row_id") === probe)
        .select("row_id", "label", "amt").as[(Long, String, Int)].collect().toSet
      assert(viaPrune === expected.filter(_._1 == probe))
      val (cnt, _, _) = ManifestTable.countWhere(spark, root, col("row_id") >= cut)
      assert(cnt === expected.size.toLong)
    }
  }
}
