package graft.seed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.schema.Schemas

/** Seed loading — the engine's equivalent of `dbt seed`
  * (reference: README.md:46-49).
  *
  * A seed CSV becomes a typed DataFrame under a pinned schema. dbt infers
  * types once at seed time; we replicate that inference statically
  * (SURVEY.md §1.3) so runtime behavior never depends on data sniffing —
  * at 100 TB a schema drift silently changing a column type is not
  * acceptable.
  *
  * Scale note: `csv()` scans parallelize per-file/per-split; materializing
  * to parquet (`materialize`) is what a production run would do so every
  * downstream read is columnar with pushdown. At the reference's ~100-row
  * scale the write is trivial; the shape is what matters.
  */
object SeedLoader {

  /** Load one CSV under an explicit schema (header row skipped).
    * FAILFAST: a row that doesn't fit the pinned schema aborts the seed
    * load — silent NULL-coercion of malformed data (PERMISSIVE default)
    * is how schema drift sneaks into a 100 TB lake.
    */
  def loadCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Load the three jaffle-shop seeds from a directory containing
    * raw_customers.csv / raw_orders.csv / raw_payments.csv.
    */
  def loadJaffleSeeds(spark: SparkSession, dir: String): Map[String, DataFrame] = Map(
    "raw_customers" -> loadCsv(spark, s"$dir/raw_customers.csv", Schemas.rawCustomers),
    "raw_orders"    -> loadCsv(spark, s"$dir/raw_orders.csv", Schemas.rawOrders),
    "raw_payments"  -> loadCsv(spark, s"$dir/raw_payments.csv", Schemas.rawPayments)
  )

  /** Materialize seeds as parquet (columnar, splittable) and re-read, so
    * downstream models scan parquet not CSV.
    */
  def materialize(spark: SparkSession, seeds: Map[String, DataFrame], outDir: String): Map[String, DataFrame] =
    seeds.map { case (name, df) =>
      val path = s"$outDir/$name"
      df.write.mode("overwrite").parquet(path)
      name -> spark.read.parquet(path)
    }
}
