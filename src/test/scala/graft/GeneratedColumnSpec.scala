package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ManifestTable

/** Generated columns (`GENERATED ALWAYS AS (expr)`): the definition is
  * table metadata riding every commit; a write that omits the column
  * gets it computed, a write that provides it is validated, and nothing
  * can make the stored value drift from the expression while the
  * definition stands. */
class GeneratedColumnSpec extends SparkSpec {
  private def freshRoot(): String =
    Files.createTempDirectory("manifest_gen").toFile.getAbsolutePath

  private def orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  private def withYear(base: org.apache.spark.sql.DataFrame) =
    base.withColumn("o_year", year(col("o_orderdate")))

  test("addGeneratedColumn validates the whole existing content; violations refuse with a count") {
    val root = freshRoot()
    ManifestTable.create(spark, root, withYear(orders))
    val v = ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    assert(ManifestTable.generatedColumnsOf(spark, root, v) ===
      Map("o_year" -> "year(o_orderdate)"))
    // a definition existing rows violate must refuse
    val root2 = freshRoot()
    ManifestTable.create(spark, root2,
      orders.withColumn("o_year", lit(1999)))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addGeneratedColumn(spark, root2, "o_year", "year(o_orderdate)")
    }
    assert(e.getMessage.contains("rows differ"), e.getMessage)
  }

  test("the column must already exist and may not reference itself or unknowns") {
    val root = freshRoot()
    ManifestTable.create(spark, root, orders)
    intercept[IllegalArgumentException] {
      ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    } // o_year not in schema
    val root2 = freshRoot()
    ManifestTable.create(spark, root2, withYear(orders))
    intercept[IllegalArgumentException] {
      ManifestTable.addGeneratedColumn(spark, root2, "o_year", "o_year + 1")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.addGeneratedColumn(spark, root2, "o_year", "year(nope)")
    }
  }

  test("append: omitted column computed; correct values pass; wrong values refused") {
    val root = freshRoot()
    val half = orders.filter(col("o_orderkey") % 2 === 0)
    ManifestTable.create(spark, root, withYear(half))
    ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    // omitted -> computed
    val b1 = orders.filter(col("o_orderkey") % 4 === 1)
    ManifestTable.append(spark, root, b1)
    // provided and correct -> accepted
    val b2 = withYear(orders.filter(col("o_orderkey") % 4 === 3))
    ManifestTable.append(spark, root, b2)
    val got = ManifestTable.read(spark, root)
    assert(got.filter(col("o_year") =!= year(col("o_orderdate"))).count() === 0)
    assert(got.count() === orders.count())
    // provided and WRONG -> refused, nothing lands
    val before = got.count()
    val bad = orders.filter(col("o_orderkey") % 4 === 1)
      .withColumn("o_year", lit(1900))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root, bad)
    }
    assert(e.getMessage.contains("GENERATED column 'o_year'"), e.getMessage)
    assert(ManifestTable.read(spark, root).count() === before)
  }

  test("merge: a source omitting the generated column is computed, then upserts normally") {
    val root = freshRoot()
    val base = orders.filter(col("o_orderkey") <= 1000)
    ManifestTable.create(spark, root, withYear(base))
    ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    val k = base.agg(max("o_orderkey")).head().getLong(0)
    val src = base.filter(col("o_orderkey") === k)
      .withColumn("o_orderstatus", lit("X")) // no o_year column provided
    ManifestTable.merge(spark, root, src.drop("o_year"), "o_orderkey")
    val row = ManifestTable.read(spark, root)
      .filter(col("o_orderkey") === k).head()
    assert(row.getAs[String]("o_orderstatus") === "X")
    assert(row.getAs[Int]("o_year") ===
      base.filter(col("o_orderkey") === k).select(year(col("o_orderdate"))).head().getInt(0))
  }

  test("rename/drop of the generated column or its sources is blocked while defined") {
    val root = freshRoot()
    ManifestTable.create(spark, root, withYear(orders.limit(50)))
    ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "o_orderdate", "odate")
    }
    assert(e1.getMessage.contains("generated column"), e1.getMessage)
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "o_year")
    }
    // dropping the DEFINITION unblocks both
    ManifestTable.dropGeneratedColumn(spark, root, "o_year")
    ManifestTable.renameColumn(spark, root, "o_orderdate", "odate")
    ManifestTable.dropColumn(spark, root, "o_year")
    assert(!ManifestTable.read(spark, root).columns.contains("o_year"))
  }

  test("the definition rides compact and restore; enforcement persists after both") {
    val root = freshRoot()
    ManifestTable.create(spark, root, withYear(orders.limit(80)).repartition(4))
    val vGen = ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    val (vc, _) = ManifestTable.compact(spark, root, 64L * 1024 * 1024)
    assert(ManifestTable.generatedColumnsOf(spark, root, vc).contains("o_year"))
    val vr = ManifestTable.restore(spark, root, vGen)
    assert(ManifestTable.generatedColumnsOf(spark, root, vr).contains("o_year"))
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, root,
        orders.limit(5).withColumn("o_year", lit(1900)))
    }
  }

  test("after dropGeneratedColumn the column is free to drift (ordinary column again)") {
    val root = freshRoot()
    ManifestTable.create(spark, root, withYear(orders.limit(50)))
    ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    ManifestTable.dropGeneratedColumn(spark, root, "o_year")
    ManifestTable.append(spark, root,
      orders.limit(5).withColumn("o_year", lit(1900))) // no longer refused
    assert(ManifestTable.read(spark, root).filter(col("o_year") === 1900).count() === 5)
  }

  test("overwrite computes an omitted generated column and carries the definition") {
    val root = freshRoot()
    ManifestTable.create(spark, root, withYear(orders.limit(50)))
    ManifestTable.addGeneratedColumn(spark, root, "o_year", "year(o_orderdate)")
    val v = ManifestTable.overwrite(spark, root, orders.limit(20)) // no o_year
    assert(ManifestTable.generatedColumnsOf(spark, root, v).contains("o_year"))
    val got = ManifestTable.read(spark, root)
    assert(got.count() === 20)
    assert(got.filter(col("o_year") =!= year(col("o_orderdate"))).count() === 0)
  }
}
