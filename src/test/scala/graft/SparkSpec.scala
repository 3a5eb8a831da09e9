package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. Small thread/partition counts keep
  * unit tests fast; production entry points (Bench/Verify) size from env.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  // One session per JVM (sbt forks one test JVM); building per-suite wastes ~5s each.
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan-audit specs assert on PushedFilters text in plan strings; the
      // 100-char default truncates a scan's filter list mid-entry (the
      // round-7 timestamp literals render longer than the old data's, which
      // pushed LessThan(o_orderdate,...) past the cut)
      .config("spark.sql.maxMetadataStringLength", "2000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
