package graft

import scala.util.Random

import graft.operators.{Dedup, Sessionize}

/** Randomized invariants (seeded → reproducible): the salted/banded
  * rewrites must equal their straightforward twins on arbitrary
  * inputs, not just the fixtures. Sizes stay small — each sample runs
  * Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("salted sessionize equals plain on random event sets") {
    val rnd = new Random(42)
    (1 to 5).foreach { round =>
      val n = 1 + rnd.nextInt(40)
      val rows = (0 until n).map { i =>
        // few users → collisions + hot keys; dense ts → boundary ties
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(5000).toLong,
          rnd.nextInt(100) / 10.0)
      }
      val ev = rows.toDF("user_id", "event_id", "ts", "value")
      // gap 100, bucket 700: sessions cross buckets and span empties
      val p = Sessionize.plain(ev, "user_id", 100L).collect().map(_.toSeq).toSeq
      val s = Sessionize.salted(ev, "user_id", 100L, 700L).collect().map(_.toSeq).toSeq
      assert(p == s, s"round $round diverged for rows=$rows")
    }
  }

  test("banded jaccard equals unbanded brute force on random docs") {
    val words = Array("alpha", "beta", "gamma", "delta", "eps")
    val rnd = new Random(7)
    (1 to 5).foreach { round =>
      val n = 2 + rnd.nextInt(14)
      val rows = (0 until n).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val df = rows.toDF("doc_id", "text").withColumn("lang",
        org.apache.spark.sql.functions.lit("xx"))
      val got = Dedup.jaccardPairs(df, "doc_id", "text", Seq("lang"),
          minJaccard = 0.6, parallelBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force: exact jaccard over distinct word sets, driver-side
      val sets = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
      val truth = (for {
        (i1, s1) <- sets.toSeq; (i2, s2) <- sets.toSeq if i1 < i2
        inter = (s1 & s2).size
        uni = (s1 | s2).size
        j = math.floor(inter.toDouble / uni * 10000 + 0.5) / 10000
        if j >= 0.6
      } yield (i1, i2, j)).toSet
      assert(got == truth,
        s"round $round: missed=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    }
  }
}
