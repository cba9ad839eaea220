package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each left point row to
  * every right interval `[start, end]` that contains it, within equal
  * `keys`. Spark's native plan for this is an equi-join on the keys
  * with the range as a post-filter — which serializes a hot key and,
  * with no keys at all, degenerates to a cross join.
  *
  * [[byBucket]] is the scale shape: intervals explode to one narrow
  * row per `bucketSize` slice they overlap, points map to their single
  * bucket, and the join becomes a pure equi-join on (keys, bucket)
  * with a cheap residual `between` filter. Each (point, interval)
  * match is produced exactly once (the point's bucket is unique), so
  * no dedup pass is needed. Bucket width trades explode factor
  * (duration/bucketSize rows per interval) against residual
  * selectivity — pick it near the typical interval length.
  */
object RangeJoin {

  def byBucket(left: DataFrame, right: DataFrame, keys: Seq[String],
               ptCol: String, startCol: String, endCol: String,
               bucketSize: Long): DataFrame = {
    val l = left.withColumn("__bkt", expr(s"$ptCol div ${bucketSize}L"))
    val r = right.withColumn("__bkt",
      explode(sequence(expr(s"$startCol div ${bucketSize}L"),
        expr(s"$endCol div ${bucketSize}L"))))
    l.join(r, keys :+ "__bkt")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bkt")
  }
}
