package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Integer fixed-point PageRank + co-occurrence edge derivation. The
  * exactness claim under test: every round is pure integer arithmetic,
  * so ranks are hand-computable and bit-stable under any partitioning.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    GraphOps.pageRank(sym.toDF("u", "v"), iters)
      .as[(Long, Long)].collect().toMap
  }

  test("coOccurrenceEdges: distinct pairs per group, symmetrized, input dups collapse") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 30L), (2L, 30L), (2L, 40L))
      .toDF("g", "item")
    val edges = GraphOps.coOccurrenceEdges(df, "g", "item")
      .as[(Long, Long)].collect().toSet
    val pairs = Set((10L, 20L), (10L, 30L), (20L, 30L), (30L, 40L))
    assert(edges === pairs ++ pairs.map(_.swap))
  }

  test("triangle: perfect symmetry gives identical exact ranks every round") {
    val r1 = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 1)
    // pr0 = 10^12 div 3; each node receives 2 × (pr0 div 2) = 333333333332;
    // pr1 = (15·10^12 div 3 + 85·333333333332) div 100 = 333333333332
    assert(r1 === Map(1L -> 333333333332L, 2L -> 333333333332L, 3L -> 333333333332L))
    val r5 = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 5)
    assert(r5.values.toSet.size === 1, "symmetric graph must stay symmetric")
  }

  test("path a-b-c: hand-computed exact ranks after one round; hub outranks pendants") {
    val r = ranks(Seq((1L, 2L), (2L, 3L)), 1)
    // deg: a=1, b=2, c=1; pr0 = 333333333333 each. Each pendant sends
    // pr0 div 1 to b; b sends pr0 div 2 to each pendant. So
    // S(b) = 666666666666, S(a) = S(c) = 166666666666, and with base
    // 15·10^12 div 3 = 5000000000000:
    // pr1(pendant) = (base + 85·166666666666) div 100 = 191666666666
    // pr1(hub)     = (base + 85·666666666666) div 100 = 616666666666
    assert(r === Map(1L -> 191666666666L, 2L -> 616666666666L, 3L -> 191666666666L))
    assert(r(2L) > r(1L))
  }

  test("ranks are partitioning-invariant (exact integers, no float reduce)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val one = GraphOps.pageRank(sym.toDF("u", "v").repartition(1), 3)
      .as[(Long, Long)].collect().toMap
    val many = GraphOps.pageRank(sym.toDF("u", "v").repartition(7), 3)
      .as[(Long, Long)].collect().toMap
    assert(one === many)
  }

  test("labelPropagation: two triangles over a bridge settle into two communities (hand-traced)") {
    // triangle {1,2,3} + triangle {4,5,6} + bridge 3-4; min-label
    // tie-break traced by hand through three synchronous rounds
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val labels = GraphOps.labelPropagation(sym.toDF("u", "v"), 3)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation is partitioning-invariant (integer counts, struct argmax)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val one = GraphOps.labelPropagation(sym.toDF("u", "v").repartition(1), 4)
      .as[(Long, Long)].collect().toMap
    val many = GraphOps.labelPropagation(sym.toDF("u", "v").repartition(7), 4)
      .as[(Long, Long)].collect().toMap
    assert(one === many)
  }

  test("hits: hand-derived two rounds on a 2x2 bipartite graph") {
    // u1 -> {p1, p2}, u2 -> {p2}; S = RankScale = 1e12
    // r1: a = (S, 2S) -> norm (S/2, S); h = (1.5S, S) -> norm (S, 666666666666)
    // r2: a = (S, 1666666666666) -> norm (600000000000, S)
    //     h = (1.6S, S) -> norm (S, 625000000000)
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 102L)).toDF("u", "v")
    val (hubs, auths) = GraphOps.hits(edges, iterations = 2)
    assert(auths.as[(Long, Long)].collect().toMap ===
      Map(101L -> 600000000000L, 102L -> 1000000000000L))
    assert(hubs.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1000000000000L, 2L -> 625000000000L))
  }

  test("hits is partitioning-invariant (decimal sums, integer normalization)") {
    val edges = (1L to 40L).map(i => (i % 7, i % 11)).distinct
    def run(n: Int) = GraphOps.hits(edges.toDF("u", "v").repartition(n), 3)
    val (h1, a1) = run(1); val (h7, a7) = run(7)
    assert(h1.as[(Long, Long)].collect().toMap === h7.as[(Long, Long)].collect().toMap)
    assert(a1.as[(Long, Long)].collect().toMap === a7.as[(Long, Long)].collect().toMap)
  }

  private def tris(edges: Seq[(Long, Long)], parts: Int = 1): Map[Long, Long] = {
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    GraphOps.triangleCounts(sym.toDF("u", "v").repartition(parts))
      .as[(Long, Long)].collect().toMap
  }

  test("triangleCounts: square with one diagonal — two triangles, hand-counted corners") {
    // {1,2,3} and {1,3,4}: nodes 1 and 3 sit in both, 2 and 4 in one
    val r = tris(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(r === Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCounts: triangle-free graphs produce no rows") {
    // a star (all wedges, no closure) and a 4-cycle
    assert(tris(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) === Map.empty)
    assert(tris(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === Map.empty)
  }

  test("triangleCounts: K4 — every node in C(3,2)=3 triangles; each triangle counted once") {
    val k4 = for { u <- 1L to 4L; v <- 1L to 4L if u < v } yield (u, v)
    val r = tris(k4)
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // total corner credits = 3 × triangle count → exactly 4 triangles
    assert(r.values.sum === 12L)
  }

  test("triangleCounts is partitioning-invariant and dup-edge-proof") {
    val edges = (1L to 60L).map(i => (i % 9, (i * 7) % 13)).filter(e => e._1 != e._2)
    val one = tris(edges, parts = 1)
    val many = tris(edges ++ edges, parts = 7) // duplicated input collapses
    assert(one === many)
    assert(one.nonEmpty, "fixture must actually contain triangles")
  }

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int, parts: Int = 1) = {
    val sym = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val (c, conv) = GraphOps.kCore(sym.toDF("u", "v").repartition(parts), k, rounds)
    (c.as[(Long, Long)].collect().toMap, conv)
  }

  test("kCore: K4 plus a pendant — the pendant peels, the clique stays with hand-traced degrees") {
    val k4 = for { u <- 1L to 4L; v <- 1L to 4L if u < v } yield (u, v)
    val (c, conv) = core(k4 :+ (1L, 5L), k = 3, rounds = 3)
    // round 1: node 5 (deg 1) peels; node 1 drops 4→3; fixed point
    assert(conv, "3 rounds must reach the fixed point")
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: a chain cascades to an empty core; a short budget reports unconverged") {
    // 1-2-3-4-5 at k=2: ends peel, then their neighbors, then the middle
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val (c, conv) = core(chain, k = 2, rounds = 5)
    assert(conv && c.isEmpty, s"chain must cascade to empty, got $c")
    // one round only removes the ends — the flag must refuse to call it a core
    val (partial, conv1) = core(chain, k = 2, rounds = 1)
    assert(!conv1, "one round cannot have converged")
    assert(partial.keySet === Set(2L, 3L, 4L))
  }

  test("kCore is partitioning-invariant") {
    val edges = (1L to 80L).map(i => (i % 11, (i * 5) % 13)).filter(e => e._1 != e._2)
    val (one, c1) = core(edges, k = 3, rounds = 4, parts = 1)
    val (many, c2) = core(edges, k = 3, rounds = 4, parts = 7)
    assert(one === many && c1 === c2)
  }

  test("kTruss: K4 is a 4-truss (every edge closes 2 triangles); k=5 empties it") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val sym = k4.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("u", "v")
    val (t4, conv4) = GraphOps.kTruss(sym, k = 4, rounds = 2)
    assert(conv4)
    assert(t4.as[(Long, Long, Long)].collect().toSet ===
      k4.map { case (u, v) => (u, v, 2L) }.toSet)
    val (t5, conv5) = GraphOps.kTruss(sym, k = 5, rounds = 2)
    assert(conv5 && t5.isEmpty, "K4 has no edge in 3 triangles")
  }

  test("kTruss: peeling CASCADES — square+diagonal at k=4 drops the diagonal one round later") {
    // triangles (1,2,3) and (1,3,4): diagonal 1-3 has support 2, the
    // four rim edges support 1. k=4 needs support ≥ 2: round 1 keeps
    // only 1-3, round 2 finds it triangle-free and drops it — the
    // cascade a one-shot support filter would miss.
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val sym = g.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("u", "v")
    val (t1, conv1) = GraphOps.kTruss(sym, k = 4, rounds = 1)
    assert(!conv1 && t1.as[(Long, Long, Long)].collect().toList === List((1L, 3L, 0L)),
      "one round must keep the now-triangle-free diagonal at support 0 and REPORT unconverged")
    val (t2, conv2) = GraphOps.kTruss(sym, k = 4, rounds = 2)
    assert(conv2 && t2.isEmpty, "the second round must finish the cascade")
    // k=3 (support ≥ 1): everything survives, support values hand-checked
    val (t3, conv3) = GraphOps.kTruss(sym, k = 3, rounds = 2)
    assert(conv3)
    assert(t3.as[(Long, Long, Long)].collect()
      .map { case (u, v, s) => (u, v) -> s }.toMap ===
      Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (3L, 4L) -> 1L, (1L, 4L) -> 1L,
        (1L, 3L) -> 2L))
  }

  test("kTruss is partitioning-invariant and dup/direction-proof") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val noisy = (g ++ g.map(_.swap) ++ g).toDF("u", "v")
    val (a, _) = GraphOps.kTruss(noisy.repartition(1), 4, 2)
    val (b, _) = GraphOps.kTruss(noisy.repartition(13), 4, 2)
    val sa = a.as[(Long, Long, Long)].collect().toSet
    assert(sa.nonEmpty && sa === b.as[(Long, Long, Long)].collect().toSet)
    assert(!sa.exists(e => e._1 == 5L || e._2 == 5L), "the pendant edge cannot be in a truss")
  }

  test("rank mass is conserved up to truncation loss (each div sheds < 1 unit)") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L)), 5)
    val total = r.values.sum
    assert(total <= GraphOps.RankScale)
    // per round each edge's contrib div and each node's base/final div
    // shed < 1 unit (×85/100 for the contribs) — comfortably < 1000
    // units over 5 rounds on 10 directed edges; relative loss ~1e-9
    assert(total > GraphOps.RankScale - 1000L)
  }
}
