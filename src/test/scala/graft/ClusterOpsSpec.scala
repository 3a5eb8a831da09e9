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
}
