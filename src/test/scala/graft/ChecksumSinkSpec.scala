package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{ChecksumSink, ChecksumSinkProvider, DatagenTableProvider}

/** The V2 write protocol end to end: a Datagen read (pushdown intact)
  * written through the checksum sink — stats must equal an independent
  * replay of the hash formula, be invariant under repartitioning (row
  * order must not matter; exactly-once per partition), be sensitive to
  * column order, and publish NOTHING when the job aborts.
  */
class ChecksumSinkSpec extends SparkSpec {

  private def datagen(n: Int): DataFrame =
    spark.read.format(classOf[DatagenTableProvider].getName)
      .option("numRows", n.toString).option("numPartitions", "8").load()

  private def writeTo(df: DataFrame, runId: String, opts: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format(classOf[ChecksumSinkProvider].getName).option("runId", runId)
    opts.foreach { case (k, v) => w.option(k, v) }
    w.mode("append").save()
  }

  // the spec-side replay of ChecksumSink.rowHash — duplicated on purpose
  // (executable specification of the hash contract, not a call into it)
  private val Mix = 0x9E3779B97F4A7C15L
  private def replay(rows: Seq[Seq[Any]]): ChecksumSink.Stats = {
    var n = 0L; var sum = 0L; var xor = 0L
    rows.foreach { r =>
      var h = 1L
      r.foreach { v =>
        val f = v match {
          case l: Long => l
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case s: String => UTF8String.fromString(s).hashCode.toLong
          case null => 0L
        }
        h = h * Mix + f
      }
      n += 1; sum += h; xor ^= h
    }
    ChecksumSink.Stats(n, sum, xor)
  }

  test("round-trip: datagen read with pushed filter -> sink stats match an independent replay") {
    val df = datagen(10000).filter(col("id") < 5000)
    writeTo(df, "rt")
    val got = ChecksumSink.committed.get("rt")
    assert(got != null && got.rows === 5000L)
    val want = replay(df.collect().toSeq.map(_.toSeq.asInstanceOf[Seq[Any]]))
    assert(got === want)
  }

  test("stats are row-order-invariant: any partitioning commits identical checksums") {
    val df = datagen(4000)
    writeTo(df, "ord_a")
    writeTo(df.repartition(7), "ord_b")
    assert(ChecksumSink.committed.get("ord_a") === ChecksumSink.committed.get("ord_b"))
  }

  test("stats are column-order-sensitive: the hash covers field position") {
    val df = datagen(1000)
    writeTo(df.select("id", "bucket"), "cols_ab")
    writeTo(df.select("bucket", "id"), "cols_ba")
    val a = ChecksumSink.committed.get("cols_ab")
    val b = ChecksumSink.committed.get("cols_ba")
    assert(a.rows === b.rows)
    assert(a.hashSum !== b.hashSum)
  }

  test("abort path: a failed job publishes NOTHING") {
    val df = datagen(2000)
    intercept[Exception] { writeTo(df, "boom", Map("failWrites" -> "true")) }
    assert(ChecksumSink.committed.get("boom") == null,
      "aborted job leaked stats into the committed view")
    assert(ChecksumSink.aborted.contains("boom"))
  }
}
