package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** L63: deterministic DeepWalk-style random walks — the graph-corpus
  * generation step of node-embedding pipelines (Perozzi et al.,
  * KDD'14: walks become "sentences" for a skip-gram trainer; node2vec
  * with p=q=1 degenerates to exactly this). From every start node,
  * `nWalks` walks of `len` steps.
  *
  * The step choice is pseudo-random but FULLY deterministic: next =
  * the neighbor at rank `rolling_hash(node|walk|step) mod degree`
  * over the node's dst-sorted neighbor list. No RNG state means the
  * walks are (a) reproducible across runs, partitionings, and
  * cluster sizes — a corpus you can regenerate bit-for-bit — and
  * (b) replayable by a second engine, so the whole walk table
  * carries a hash oracle (the rolling-hash kernel already replays as
  * a list_reduce codepoint fold).
  *
  * Scale: adjacency ((src, rank, dst) + degree) builds once with one
  * src-window; each step is ONE equi-join of the constant-size
  * frontier (starts × nWalks rows — walks never branch) against the
  * adjacency, `len` joins total. No cross product, no driver-side
  * iteration over data, frontier never grows. A walk ending on a
  * dangling node (no out-edges) simply stops — shorter walks, never
  * an error.
  */
object Walk {

  def deterministicWalks(edges: DataFrame, srcCol: String, dstCol: String,
                         nWalks: Int, len: Int): DataFrame = {
    require(nWalks >= 1 && len >= 1, s"need nWalks >= 1 and len >= 1")
    val adj = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .withColumn("nrank",
        (row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
          .cast("long"))
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    val adjd = adj.join(deg, "src").localCheckpoint(true)
    var frontier = adjd.select(col("src").as("start")).distinct()
      .withColumn("walk", explode(sequence(lit(0L), lit(nWalks - 1L))))
      .withColumn("node", col("start"))
    var out = frontier.select(col("start"), col("walk"),
      lit(0L).as("step"), col("node"))
    for (stp <- 1 to len) {
      frontier = frontier.join(adjd, frontier("node") === adjd("src"))
        .filter(col("nrank") ===
          pmod(rolling_hash(concat_ws("|", col("node"), col("walk"),
            lit(stp.toString))), col("deg")))
        .select(col("start"), col("walk"), col("dst").as("node"))
      out = out.unionByName(frontier.select(col("start"), col("walk"),
        lit(stp.toLong).as("step"), col("node")))
    }
    out
  }
}
