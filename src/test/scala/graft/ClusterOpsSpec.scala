package graft

import org.apache.spark.sql.functions._

import graft.ops.ClusterOps

class ClusterOpsSpec extends SparkSpec {
  import spark.implicits._

  // 1-D corpora keep the fixed-point arithmetic hand-checkable:
  // quantized coord = floor(x*1e6 + 0.5) + 2^20.
  private def oneD(points: (Long, Float)*) =
    points.toSeq.toDF("vec_id", "x")
      .select(col("vec_id"), array(col("x")).as("embedding"))

  test("kmeans: hand-computed 1-D round — seeds, truncating mean, final audit") {
    // ids 1,2 seed at 0.0 and 1.0; points 0.1 and 0.9 join their sides
    val df = oneD(1L -> 0.0f, 2L -> 1.0f, 3L -> 0.1f, 4L -> 0.9f)
    val out = ClusterOps.kmeansSummary(df, "vec_id", "embedding", k = 2, rounds = 1)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    // quantized (offset o=1048576): q1=o, q2=o+1e6, q3=o+100000, q4=o+900000
    // round 1 assigns {1,3}->c1, {2,4}->c2; centroids (o+50000, o+950000)
    // final dists: c1: 50000^2 each; c2: 50000^2 each
    val o = 1048576L
    assert(out === Array(
      (1L, 2L, 2 * 2500000000.0, o + 50000),
      (2L, 2L, 2 * 2500000000.0, o + 950000)))
  }

  test("kmeans: assignment ties break to the smaller cluster id") {
    // point 3 sits exactly between the two seeds -> cluster 1
    val df = oneD(1L -> 0.0f, 2L -> 0.5f, 3L -> 0.25f)
    val (fin, _, release) =
      ClusterOps.kmeansFit(df, "vec_id", "embedding", k = 2, rounds = 1)
    val cids = fin.select("vid", "cid").as[(Long, Long)].collect().toMap
    release()
    assert(cids(3L) === 1L)
  }

  test("kmeans: an emptied cluster drops out deterministically (no respawn)") {
    // duplicate seed vectors: every 0-point ties to cid 1, so cid 2
    // empties after round 1 and the audit reports one cluster
    val df = oneD(1L -> 0.0f, 2L -> 0.0f, 3L -> 0.0f)
    val out = ClusterOps.kmeansSummary(df, "vec_id", "embedding", k = 2, rounds = 1)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(1L))
    assert(out.head._2 === 3L)
  }

  test("kmeans: partition-invariant on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      ClusterOps.kmeansSummary(df, "vec_id", "embedding", k = 4, rounds = 2)
        .collect().map(_.toSeq).toSet
    assert(run(emb.repartition(1)) === run(emb.repartition(7)))
  }

  test("kmeans: monotone improvement on real data — inertia never rises with more rounds") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def inertia(rounds: Int): Double =
      ClusterOps.kmeansSummary(emb, "vec_id", "embedding", k = 8, rounds = rounds)
        .agg(sum("inertia")).as[Double].head()
    // Lloyd descent: each assignment and each (exact-mean) update can
    // only reduce total squared distance; fixed-point truncation shifts
    // centroids by <1 unit, far below the inertia scale
    assert(inertia(2) <= inertia(1))
  }

  test("kmeans: a coordinate outside the fixed-point range fails loudly") {
    val df = oneD(1L -> 0.0f, 2L -> 2.0f)
    val e = intercept[Exception] {
      ClusterOps.kmeansSummary(df, "vec_id", "embedding", k = 1, rounds = 1).collect()
    }
    assert(e.getMessage.contains("fixed-point range")
      || Option(e.getCause).exists(_.getMessage.contains("fixed-point range")))
  }

  private def seeds(df: org.apache.spark.sql.DataFrame, k: Int) =
    ClusterOps.kCenterSeeds(df, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq

  test("kCenterSeeds: hand-traced farthest-first picks with exact integer radii") {
    // 1-d points 0.0 / 0.01 / 0.1 / 0.04 (ids 0-3): seed1 = min id 0;
    // pick2 = id2 at (1e5)² = 1e10; after folding, id3 keeps its
    // to-seed1 distance (1.6e9 < 3.6e9) and wins pick3
    val df = oneD(0L -> 0.0f, 1L -> 0.01f, 2L -> 0.1f, 3L -> 0.04f)
    assert(seeds(df, 3) === Seq(
      (1L, 0L, None), (2L, 2L, Some(10000000000L)), (3L, 3L, Some(1600000000L))))
  }

  test("kCenterSeeds: equidistant candidates tie to the smaller id") {
    val df = oneD(0L -> 0.0f, 1L -> 0.02f, 2L -> -0.02f)
    assert(seeds(df, 2) === Seq((1L, 0L, None), (2L, 1L, Some(400000000L))))
  }

  test("kCenterSeeds: the coverage radius is non-increasing and the traversal is partition-invariant") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val one = seeds(emb.repartition(1), 5)
    val many = seeds(emb.repartition(7), 5)
    assert(one === many)
    val radii = one.flatMap(_._3)
    assert(radii === radii.sorted.reverse, s"radii must not increase: $radii")
    assert(one.map(_._2).distinct.size === 5, "seeds must be distinct points")
  }
}
