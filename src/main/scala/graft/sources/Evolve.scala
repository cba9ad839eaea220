package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** R48: schema-evolution-tolerant reads. A 100 TB table ingested daily
  * for years accumulates schema ERAS — columns added as the pipeline
  * grows — and the day-one partitions never get rewritten (rewriting
  * 100 TB to add a column is exactly what a lake layout must avoid).
  * Three pieces make old and new eras one queryable table:
  *
  *  - era-partitioned layout (`path/era=N`): each schema era writes
  *    its own partition dir, so partition pruning still works and the
  *    era is a real column after discovery;
  *  - `readEvolved`: parquet `mergeSchema` unions the era schemas
  *    (footer-only work — no data read to build the schema), columns
  *    absent in old eras surface as null and are backfilled with
  *    caller defaults IN THE PLAN (a projection — map-side, free);
  *  - `schemaAudit`: the metadata sweep that says WHICH eras lack
  *    which columns (footer reads per era, row counts from the
  *    parquet statistics path — no full scan).
  *
  * The gate query (q_schema_evolution) hash-proves the whole chain:
  * two eras with different physical schemas read back as one frame
  * whose defaulted values replay exactly from the source-of-truth
  * table.
  */
object Evolve {

  /** Write one schema era under `path/era=<era>` (idempotent
    * overwrite of that era's partition only). */
  def writeEra(df: DataFrame, path: String, era: Int,
               partitions: Option[Int] = None): Unit = {
    val out = partitions.fold(df)(n => df.repartition(n))
    out.write.mode("overwrite").parquet(s"$path/era=$era")
  }

  /** Read every era as ONE frame: mergeSchema unions the era
    * schemas; `defaults` backfills columns that old eras lack
    * (null from the union) with plan-level literals. */
  def readEvolved(spark: SparkSession, path: String,
                  defaults: Map[String, Column]): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    defaults.foldLeft(df) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v))
    }
  }

  /** Per-era schema inventory: (era, n_rows, columns) — which eras
    * carry which columns. Era count is small by construction (schema
    * changes are rare events), so the driver loop is bounded; row
    * counts ride the parquet metadata path (count() over a bare scan
    * is statistics-served, no data read). */
  def schemaAudit(spark: SparkSession, path: String): DataFrame = {
    val fs = new java.io.File(path)
    val eras = Option(fs.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("era="))
      .map(_.getName.stripPrefix("era=").toInt).sorted
    require(eras.nonEmpty, s"no era= partitions under $path")
    val rows = eras.map { e =>
      val d = spark.read.parquet(s"$path/era=$e")
      Row(e.toLong, d.count(), d.schema.fieldNames.sorted.mkString(","))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("era",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("columns",
          org.apache.spark.sql.types.StringType, nullable = false))))
  }
}
