package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-width (mainframe/layout-file) source/sink — SURVEY §2 L58d.
  *
  * The interchange format legacy feeds still speak: one record per
  * line, each field a fixed character range, no delimiters. Layout is a
  * `Seq[(name, width)]` applied against an explicit schema (same
  * no-inference contract as [[Csv]]/[[Jsonl]]). Encoding rules:
  * strings LEFT-aligned space-padded, integers RIGHT-aligned
  * space-padded — the COBOL-ish convention — with a loud write-time
  * failure (one bounded agg) when any value outruns its field, since
  * rpad/lpad would otherwise truncate silently and the corruption
  * would surface only as a downstream hash mismatch.
  *
  * Contract notes, honestly stated: fields are CHARACTER ranges (the
  * `substring` slice — consistent with Spark's length()); embedded
  * newlines are impossible by construction (the writer refuses any
  * string field containing \n or \r rather than corrupting the
  * record stream); trailing-space-significant strings don't fit a
  * space-padded format (read strips the padding) — ship such columns
  * through a fixed-length surrogate (md5, as q_fixedwidth_roundtrip
  * does for `text`) or a quoted format ([[Csv]]). Long text columns
  * belong in [[Jsonl]]/parquet; fixed width is for the structured
  * slice.
  *
  * Scale: write is one map-side projection into `.text` shards (gzip
  * per shard, writer-controlled count); read is a line scan +
  * per-field substring/cast — both codegen'd, no UDFs, splittable by
  * shard exactly like the CSV path. */
object FixedWidth {

  private def encodeField(c: Column, t: DataType, width: Int): Column =
    t match {
      case _: StringType => rpad(coalesce(c, lit("")), width, " ")
      case _ => lpad(coalesce(c.cast("string"), lit("")), width, " ")
    }

  /** Write `df` as fixed-width text shards under `path`. Layout must
    * cover exactly the frame's columns (order = field order). */
  def write(df: DataFrame, path: String, layout: Seq[(String, Int)],
            compression: String = "gzip",
            partitions: Option[Int] = None): Unit = {
    require(layout.map(_._1) == df.columns.toSeq,
      s"layout fields ${layout.map(_._1)} must match columns ${df.columns.toSeq}")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // one bounded agg: a value wider than its field, or a string with
    // an embedded line break, fails the WRITE — never silent truncation
    val guards = layout.map { case (name, width) =>
      val c = col(name)
      val tooWide = max(length(coalesce(c.cast("string"), lit("")))).as(s"w_$name")
      tooWide -> (types(name) match {
        case _: StringType =>
          Some(max(when(c.contains("\n") || c.contains("\r"), 1)
            .otherwise(0)).as(s"nl_$name"))
        case _ => None
      })
    }
    val aggCols = guards.flatMap { case (w, nl) => w +: nl.toSeq }
    val g = df.agg(aggCols.head, aggCols.tail: _*).head()
    layout.foreach { case (name, width) =>
      val w = g.getAs[Any](s"w_$name")
      val wv = if (w == null) 0 else w.asInstanceOf[Number].intValue()
      require(wv <= width,
        s"column $name has a $wv-char value but the field is $width wide " +
          "(fixed-width never truncates; widen the field)")
      if (g.schema.fieldNames.contains(s"nl_$name"))
        require(g.getAs[Int](s"nl_$name") == 0,
          s"column $name contains line breaks; fixed-width records are " +
            "line-framed (use Csv multiLine or Jsonl for such payloads)")
    }
    val line = concat(layout.map { case (name, width) =>
      encodeField(col(name), types(name), width)
    }: _*)
    val out = partitions.fold(df)(n => df.repartition(n))
    out.select(line.as("value")).write.mode("overwrite")
      .option("compression", compression)
      .text(path)
  }

  /** Read fixed-width text under `path` against `schema` + `layout`:
    * per-field substring slice, padding stripped (rtrim for strings,
    * trim+cast for numerics). */
  def read(spark: SparkSession, path: String, schema: StructType,
           layout: Seq[(String, Int)]): DataFrame = {
    require(layout.map(_._1) == schema.fields.map(_.name).toSeq,
      "layout fields must match the schema")
    val raw = spark.read.text(path)
    var off = 1 // substring is 1-based
    val cols = layout.map { case (name, width) =>
      val slice = substring(col("value"), off, width)
      off += width
      val f = schema(name)
      val out = f.dataType match {
        case _: StringType => rtrim(slice)
        case t => trim(slice).cast(t)
      }
      out.as(name)
    }
    raw.select(cols: _*)
  }

  /** Write-then-read with the writing frame's own schema. */
  def roundtrip(df: DataFrame, path: String, layout: Seq[(String, Int)],
                compression: String = "gzip",
                partitions: Option[Int] = None): DataFrame = {
    write(df, path, layout, compression, partitions)
    read(df.sparkSession, path, df.schema, layout)
  }
}
