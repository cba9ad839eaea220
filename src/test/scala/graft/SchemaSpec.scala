package graft

import org.apache.spark.sql.types._

import graft.schema.{GraftSchema, GraftType, IncompatibleSchemaException}

class SchemaSpec extends SparkSpec {
  import spark.implicits._

  test("maps the reference's 5 types onto Spark types") {
    assert(GraftType.INTEGER.sparkType == LongType)
    assert(GraftType.REAL.sparkType == DoubleType)
    assert(GraftType.TEXT.sparkType == StringType)
    assert(GraftType.BINARY.sparkType == BinaryType)
    assert(GraftType.TENSOR.sparkType.isInstanceOf[StructType])
  }

  test("validate normalizes compatible frames to canonical types") {
    val df = Seq((1, 2.5f, "x")).toDF("a", "b", "c") // int/float widen
    val out = GraftSchema(("a", GraftType.INTEGER), ("b", GraftType.REAL),
      ("c", GraftType.TEXT)).validate(df)
    assert(out.schema.map(_.dataType) == Seq(LongType, DoubleType, StringType))
    assert(out.collect().head.toSeq == Seq(1L, 2.5d, "x"))
  }

  test("validate rejects wrong arity and wrong types") {
    val df = Seq((1L, "x")).toDF("a", "b")
    intercept[IncompatibleSchemaException] {
      GraftSchema(("a", GraftType.INTEGER)).validate(df)
    }
    intercept[IncompatibleSchemaException] {
      GraftSchema(("a", GraftType.BINARY), ("b", GraftType.TEXT)).validate(df)
    }
  }

  test("descriptor round-trips type ids (4-bit packing like the reference)") {
    val s = GraftSchema(("a", GraftType.INTEGER), ("b", GraftType.TENSOR),
      ("c", GraftType.TEXT))
    assert(GraftSchema.fromDescriptor(s.descriptor) ==
      Seq(GraftType.INTEGER, GraftType.TENSOR, GraftType.TEXT))
  }

  test("tensor column enforces shape.product == values.length") {
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(2, 2), Seq(1.0, 2.0, 3.0, 4.0)),
      (Seq(3), Seq(1.0))).toDF("shape", "values")
    val out = df.select(GraftSchema.tensor(col("shape"), col("values")).as("t"))
      .collect()
    assert(out(0).get(0) != null) // 2x2 with 4 values: ok
    assert(out(1).get(0) == null) // shape 3 with 1 value: rejected
  }

  test("validate raises a clear non-null-contract error on null values") {
    val df = Seq((1L, "x"), (2L, null)).toDF("a", "b")
    val out = GraftSchema(("a", GraftType.INTEGER), ("b", GraftType.TEXT))
      .validate(df)
    val err = intercept[Exception] { out.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("non-null schema field 'b'")),
      s"expected the null-guard message, got: ${messages(err)}")
  }
}
