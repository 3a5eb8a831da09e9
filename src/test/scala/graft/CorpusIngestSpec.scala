package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** End-to-end streaming corpus ingest: document files arrive in waves, a
  * Structured Streaming file source drives them through the SAME
  * TextOps.qualityGate the batch pipe2 query uses, and foreachBatch
  * appends survivors to the corpus table. The whole pipeline must land on
  * exactly the batch answer — the map-only gate has no state, so
  * streaming vs batch can differ only if the plumbing is wrong.
  */
class CorpusIngestSpec extends SparkSpec {

  test("streamed quality-gated ingest lands on the batch-filtered corpus") {
    graft.functions.NativeExpressions.register(spark)
    val srcDir = Files.createTempDirectory("graft_ingest_src").toString
    val tableDir = Files.createTempDirectory("graft_ingest_out").toString + "/corpus"
    val ckpt = Files.createTempDirectory("graft_ingest_ckpt").toString

    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

    // wave 1 lands before the stream starts (backfill), wave 2 while live
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)

    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    val gated = TextOps.qualityGate(stream, "doc_id", "text")
    val query = gated.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(tableDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      query.processAllAvailable()
      docs.filter(col("doc_id") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(srcDir)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.read.parquet(tableDir)
    val batchAnswer = TextOps.qualityGate(docs, "doc_id", "text")
    assert(streamed.count() === batchAnswer.count())
    assert(streamed.exceptAll(batchAnswer).isEmpty &&
      batchAnswer.exceptAll(streamed).isEmpty,
      "streamed ingest must equal the batch quality gate")
    // both waves contributed (the gate passes docs from each parity class)
    assert(streamed.filter(col("doc_id") % 2 === 0).count() > 0)
    assert(streamed.filter(col("doc_id") % 2 === 1).count() > 0)
  }

  test("streaming gate metrics accumulate per micro-batch to the batch totals") {
    graft.functions.NativeExpressions.register(spark)
    val srcDir = Files.createTempDirectory("graft_obs_src").toString
    val ckpt = Files.createTempDirectory("graft_obs_ckpt").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    val gated = TextOps.qualityFilterNamedMetrics(stream, "text", "ingest_gate")
    val query = gated.writeStream.format("noop")
      .option("checkpointLocation", ckpt).start()
    try {
      query.processAllAvailable()
      docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
      query.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val perBatch = query.recentProgress.toSeq
        .flatMap(p => p.observedMetrics.asScala.get("ingest_gate"))
        .map(r => (r.getAs[Long]("n_in"), r.getAs[Long]("n_kept")))
      // two non-empty waves -> at least two batches carried metrics, and
      // their SUMS equal the batch-mode answer over the full corpus
      assert(perBatch.count(_._1 > 0) >= 2, s"expected >=2 observed batches: $perBatch")
      assert(perBatch.map(_._1).sum === docs.count())
      assert(perBatch.map(_._2).sum === TextOps.qualityFilter(docs, "text").count())
    } finally query.stop()
  }
}
