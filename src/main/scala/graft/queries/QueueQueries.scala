package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.schema.{GraftSchema, GraftType}
import RelationalQueries.{t, dsum}

/** Queue-semantics queries (SURVEY.md §2 C1-C10) expressed over the
  * `events` journal table: `event_id` is the queue's total-order `seq`,
  * so FIFO pop, TTL expiry, `latest`, size/diskSpace accounting all
  * become declarative plans the driver can oracle-check. The live queue
  * implementation itself is [[graft.queue.ParquetQueue]] (QueueSpec).
  */
object QueueQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C5/C6: FIFO consumption order — pop of the first 100 entries.
    "q_queue_fifo" -> { (s, dir) =>
      t(s, dir, "events")
        .orderBy("event_id")
        .select(col("event_id").as("seq"), col("user_id"), col("event_type"),
          col("value"))
        .limit(100)
    },

    // C7: TTL expiry — synthetic lifetime of floor(value*10) queue
    // slots; an entry is live if it hasn't aged past the highwater.
    "q_queue_ttl" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val hw = ev.agg(max("event_id").as("hw"))
      ev.crossJoin(broadcast(hw))
        .filter(col("event_id") + floor(col("value") * 10) > col("hw"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_live"))
        .orderBy("event_type")
    },

    // C9: Publisher.latest per key — the newest entry survives even
    // after full consumption. Single map-side-combinable aggregation
    // (max_by on the unique seq): one shuffle, no join, no broadcast
    // of a table that grows with key cardinality.
    "q_queue_latest" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(max("event_id").as("last_seq"),
          max_by(col("event_type"), col("event_id")).as("last_type"),
          max_by(col("value"), col("event_id")).as("last_value"))
        .orderBy("user_id")
    },

    // C10: size / diskSpace accounting per queue (= event_type).
    "q_queue_size" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_items"),
          sum(length(col("props")).cast("long")).as("payload_bytes"),
          max("event_id").as("highwater"))
        .orderBy("event_type")
    },

    // C3: codec round-trip — gzip_compress/decompress native
    // expressions; output proves identity (byte length preserved) and
    // that compression actually happened (compressed length differs).
    "q_codec_roundtrip" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(gzip_decompress(gzip_compress(encode(col("text"), "UTF-8"))))
            .cast("long").as("n_bytes"))
        .orderBy("doc_id")
    },

    // C1: schema validation/normalization through GraftSchema (the
    // reference's serialize-time type check, done at plan time).
    "q_schema_cast" -> { (s, dir) =>
      val schema = GraftSchema(
        ("event_id", GraftType.INTEGER),
        ("value", GraftType.REAL),
        ("props", GraftType.TEXT))
      schema.validate(t(s, dir, "events").select("event_id", "value", "props"))
        .orderBy("event_id")
    },

    // C2: tensor ops — embeddings as graft TENSOR vectors; dim + L2
    // norm (decimal-free: per-element fold is order-identical).
    "q_tensor_ops" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), size(col("embedding")).cast("long").as("dim"),
          round(l2_norm(as_double_array(col("embedding"))), 4).as("norm"))
        .orderBy("vec_id")
    })

  val oracles: Map[String, String] = Map(
    "q_queue_fifo" ->
      """SELECT event_id AS seq, user_id, event_type, value FROM events
        |ORDER BY event_id LIMIT 100""".stripMargin,

    "q_queue_ttl" ->
      """SELECT event_type, COUNT(*) AS n_live FROM events
        |WHERE event_id + FLOOR(value * 10) > (SELECT MAX(event_id) FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_queue_latest" ->
      """SELECT e.user_id, s.last_seq, e.event_type AS last_type, e.value AS last_value
        |FROM events e
        |JOIN (SELECT user_id, MAX(event_id) AS last_seq FROM events GROUP BY user_id) s
        |  ON e.user_id = s.user_id AND e.event_id = s.last_seq
        |ORDER BY e.user_id""".stripMargin,

    "q_queue_size" ->
      """SELECT event_type, COUNT(*) AS n_items,
        |  CAST(SUM(LENGTH(props)) AS BIGINT) AS payload_bytes, MAX(event_id) AS highwater
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_codec_roundtrip" ->
      """SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_schema_cast" ->
      """SELECT event_id, CAST(value AS DOUBLE) AS value, props FROM events
        |ORDER BY event_id""".stripMargin,

    "q_tensor_ops" ->
      """SELECT vec_id, LEN(embedding) AS dim,
        |  ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
