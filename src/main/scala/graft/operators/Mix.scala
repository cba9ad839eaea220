package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture control: keep each row with a per-source probability,
  * decided by the row's content hash — fully deterministic, so
  * re-runs, engines, and partitionings produce the same mixture
  * (unlike rand()-based sampling, which also breaks retries at
  * scale). Probabilities quantize to k/256 and become a 2-hex-char
  * threshold on the md5 prefix; weight 1.0 maps to a sentinel above
  * every hex digit ("g0") so it keeps everything.
  */
object Mix {

  private def thr(w: Double): String = {
    val k = math.round(math.max(0.0, math.min(1.0, w)) * 256).toInt
    if (k >= 256) "g0" else f"$k%02x"
  }

  /** Filter keeping rows with probability `weights(source)` (default
    * `defaultWeight` for unlisted sources), by content hash. */
  def weightedSample(df: DataFrame, sourceCol: String, contentCol: String,
                     weights: Map[String, Double],
                     defaultWeight: Double): DataFrame = {
    val threshold: Column = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(thr(defaultWeight))) { case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(thr(w))).otherwise(acc)
      }
    df.filter(substring(md5(col(contentCol)), 1, 2) < threshold)
  }
}
