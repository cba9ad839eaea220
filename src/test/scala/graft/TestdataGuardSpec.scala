package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Environment tripwire (SURVEY §5). Round 8 lost 13 queries to a silent
  * testdata/runtime change: `events.ts` stopped resolving as Long nanos
  * (parquet TIMESTAMP(NANOS) + `nanosAsLong`) and became TIMESTAMP_NTZ
  * (now TIMESTAMP(MICROS) in the files). This spec pins what the engine
  * actually relies on — the POST-LOAD schema through the canonical
  * loader and the event-time invariants — so the next such change is one
  * readable failure here instead of 13 confusing runtime errors.
  */
class TestdataGuardSpec extends SparkSpec {

  private def loaded(name: String): Map[String, DataType] =
    table(name).schema.map(f => f.name -> f.dataType).toMap

  test("events loads with ts as Long nanoseconds") {
    val sch = loaded("events")
    assert(sch("ts") == LongType,
      s"events.ts must normalize to Long nanos, got ${sch("ts")}")
    assert(sch("event_id") == LongType && sch("user_id") == LongType &&
      sch("event_type") == StringType && sch("value") == DoubleType &&
      sch("props") == StringType)
  }

  test("events.ts values are nanosecond-scale (unit regression tripwire)") {
    // 2001-09-09 in nanos is 1e18; 2106 is ~4.3e18. A micros-unit
    // regression would land at ~1.7e15 and fail loudly here.
    val mm = table("events")
      .agg(min("ts").as("lo"), max("ts").as("hi"),
        count(when(col("ts").isNull, 1)).as("nulls"))
      .collect().head
    assert(mm.getAs[Long]("nulls") == 0L, "events.ts must be non-null")
    val (lo, hi) = (mm.getAs[Long]("lo"), mm.getAs[Long]("hi"))
    assert(lo > 1000000000000000000L && hi < 4300000000000000000L,
      s"events.ts out of nanos range: [$lo, $hi]")
  }

  test("events event_id is unique (deterministic tie-break invariant)") {
    // sessionize/as-of order by (ts, event_id): every oracle comparison
    // relies on event_id breaking same-instant ties deterministically
    val ev = table("events")
    assert(ev.select("event_id").distinct().count() == ev.count())
  }

  test("relational tables load with the expected key column types") {
    assert(loaded("lineitem")("l_orderkey") == LongType)
    assert(loaded("lineitem")("l_quantity") == DoubleType)
    // shipdate/orderdate may arrive TZ or NTZ from the generator; the
    // queries only compare them against timestamp literals, so pin just
    // "some timestamp type" — a move to string/date would break pushdown
    assert(Seq(TimestampType, TimestampNTZType)
      .contains(loaded("lineitem")("l_shipdate")))
    assert(Seq(TimestampType, TimestampNTZType)
      .contains(loaded("orders")("o_orderdate")))
    assert(loaded("orders")("o_totalprice") == DoubleType)
    assert(loaded("customer")("c_custkey") == LongType)
  }

  test("pipeline tables load with the expected schemas") {
    val d = loaded("documents")
    assert(d("doc_id") == LongType && d("text") == StringType &&
      d("lang") == StringType && d("source") == StringType)
    val e = loaded("embeddings")
    assert(e("vec_id") == LongType && e("label") == IntegerType)
    assert(e("embedding") == ArrayType(FloatType, containsNull = true) ||
      e("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${e("embedding")}")
  }
}
