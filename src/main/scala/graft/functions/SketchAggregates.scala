package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving (Metwally et al.) summary: at most `capacity` counters;
  * an unseen item evicts the smallest counter and inherits its count as
  * error. Invariants (the heavy-hitter contract):
  *  - est(x) >= true(x)            (never undercounts)
  *  - est(x) - err(x) <= true(x)   (the error is tracked per item)
  *  - any x with true(x) > n/capacity is in the summary
  *  - capacity >= |distinct|  =>  est is EXACT and err = 0
  * Merging two summaries (Agarwal et al., "Mergeable Summaries") adds
  * counts, charging an absent item the other summary's worst-case
  * undercount (its min counter — 0 if that summary never evicted),
  * then trims back to capacity; all invariants survive the merge, so
  * partial aggregation is safe at any parallelism.
  */
object SpaceSaving {
  /** counters: item -> (est, err). `full` tracks whether an eviction
    * floor exists (minEst of a FULL summary bounds absent items). */
  final class Summary(val capacity: Int) {
    val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
    var evicted: Boolean = false

    /** worst-case count of an item ABSENT from this summary */
    def absentBound: Long =
      if (!evicted && counters.size < capacity) 0L
      else if (counters.isEmpty) 0L
      else counters.valuesIterator.map(_._1).min

    def add(item: String, by: Long, errBy: Long): Unit =
      counters.get(item) match {
        case Some((e, r)) => counters.update(item, (e + by, r + errBy))
        case None =>
          if (counters.size < capacity) counters.update(item, (by, errBy))
          else {
            // evict the smallest counter (deterministic: min est, then
            // key order); the newcomer inherits its count as error.
            // O(capacity) scan — fine for the thousands-of-counters
            // regime; a min-heap is the upgrade path for huge capacities
            var minKey: String = null
            var minEst = Long.MaxValue
            counters.foreach { case (k, (e, _)) =>
              if (e < minEst || (e == minEst && (minKey == null || k < minKey))) {
                minEst = e; minKey = k
              }
            }
            counters.remove(minKey)
            counters.update(item, (minEst + by, minEst + errBy))
            evicted = true
          }
      }

    /** Merge `other` into this (summary addition + trim). */
    def merge(other: Summary): Summary = {
      val aBound = absentBound
      val bBound = other.absentBound
      val keys = counters.keySet ++ other.counters.keySet
      val merged = keys.toSeq.map { k =>
        val (ae, ar) = counters.getOrElse(k, (aBound, aBound))
        val (be, br) = other.counters.getOrElse(k, (bBound, bBound))
        (k, ae + be, ar + br)
      }
      val out = new Summary(capacity)
      out.evicted = evicted || other.evicted || merged.size > capacity
      // keep the top-capacity by (est desc, key asc) — deterministic
      merged.sortBy { case (k, e, _) => (-e, k) }.take(capacity).foreach {
        case (k, e, r) => out.counters.update(k, (e, r))
      }
      out
    }
  }
}

/** `approx_top_k(expr, k, capacity)`: mergeable Space-Saving top-k over
  * a string column — the fixed-memory heavy-hitters aggregate for
  * cardinalities where exact groupBy(term) is too wide. Partial
  * aggregation ships one `capacity`-bounded summary per partition
  * (map-side combine), never the raw terms. Returns
  * array<struct<term,est,err>> sorted (est desc, term asc), truncated
  * to k; explode it for one row per hitter. With capacity >= |distinct|
  * the result is exact (err 0) — which is how the oracle gate
  * hash-proves the merge plumbing.
  */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Summary]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  // Coerce any castable input (ints, dates, ...) to string at analysis
  // time: SQL callers of the registered function get heavy hitters over
  // the value's canonical string form instead of an executor-side
  // ClassCastException.
  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(StringType)

  override def createAggregationBuffer(): SpaceSaving.Summary =
    new SpaceSaving.Summary(capacity)

  override def update(buffer: SpaceSaving.Summary, input: InternalRow): SpaceSaving.Summary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buffer
  }

  override def merge(b1: SpaceSaving.Summary, b2: SpaceSaving.Summary): SpaceSaving.Summary =
    b1.merge(b2)

  override def eval(buffer: SpaceSaving.Summary): Any = {
    val top = buffer.counters.toSeq
      .sortBy { case (t, (e, _)) => (-e, t) }
      .take(k)
      .map { case (t, (e, r)) =>
        InternalRow(UTF8String.fromString(t), e, r)
      }
    new GenericArrayData(top)
  }

  override def serialize(buffer: SpaceSaving.Summary): Array[Byte] = {
    val entries = buffer.counters.toSeq.map { case (t, (e, r)) =>
      (t.getBytes(StandardCharsets.UTF_8), e, r)
    }
    val size = 5 + entries.map(_._1.length + 20).sum
    val bb = ByteBuffer.allocate(size)
    bb.put(if (buffer.evicted) 1.toByte else 0.toByte)
    bb.putInt(entries.size)
    entries.foreach { case (b, e, r) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(e); bb.putLong(r)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSaving.Summary = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new SpaceSaving.Summary(capacity)
    out.evicted = bb.get() == 1.toByte
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val e = bb.getLong
      val r = bb.getLong
      out.counters.update(new String(b, StandardCharsets.UTF_8), (e, r))
      i += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "approx_top_k"
  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ApproxTopK =
    copy(child = newChild)
}

/** `count_min_agg(expr, depth, width)`: mergeable count-min sketch
  * (Cormode & Muthukrishnan) over a string column — `depth` hash rows
  * of `width` counters; est(x) = min over rows of the x-cell, so
  * est(x) >= true(x) always and est(x) <= true(x) + eps*N with
  * eps = e/width at probability 1 - e^-depth. Partial aggregation
  * ships one depth*width long array per partition; merging is
  * elementwise addition, so sketches also roll up AFTER the aggregate
  * via the existing `vector_sum` (store per-day sketches, merge to any
  * grain without rescanning raw data — same contract as the HLL
  * rollup).
  *
  * Cell hashing is Spark's own `xxhash64(value, row_i)` seed chain
  * (replicated via XxHash64Function), which is what lets
  * [[graft.functions.count_min_estimate]] probe the sketch with
  * composed BUILT-INS — the estimate stays in WholeStageCodegen, no
  * custom scalar expression.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"need 1 <= depth <= 16, got $depth")
  require(width >= 2, s"need width >= 2, got $width")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // xxhash64(value, i) = hash(i, hash(value, 42)) — the SQL
      // expression's left-to-right seed chain
      val h0 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, child.dataType, 42L)
      var i = 0
      while (i < depth) {
        val hi = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(i, IntegerType, h0)
        val cell = ((hi % width) + width) % width
        buffer(i * width + cell.toInt) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** `kll_agg(expr, k)`: mergeable KLL quantile sketch (Karnin, Lang &
  * Liberty, FOCS 2016 — the DataSketches implementation Spark already
  * ships for HLL's sibling problem) over a double column. The R17c/R45b
  * mergeable-store discipline extended to ORDER STATISTICS: per-day
  * sketches persist as binary columns, union to any grain, and answer
  * any quantile — the profile piece min/max/NDV can't cover (median,
  * p95 latency, quantile drift). Rank error is ~1.65/√k with k=200
  * default upstream; we default HIGH (k = 65535, the format max, ~2 MB
  * worst case per sketch) because profile rows are per-(partition,
  * column) — thousands, not billions — and it buys the EXACT regime:
  * a KLL sketch that has absorbed ≤ k values retains all of them, so
  * gate-scale sketches reproduce exact order statistics and the whole
  * chain hash-oracles (the R3c exact-regime trick); at 100 TB the same
  * code degrades gracefully to the published 0.01% rank error. */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"kll_agg needs 8 <= k <= 65535, got $k")

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(DoubleType)

  override def createAggregationBuffer(): org.apache.datasketches.kll.KllDoublesSketch =
    org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: org.apache.datasketches.kll.KllDoublesSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(b1: org.apache.datasketches.kll.KllDoublesSketch,
                     b2: org.apache.datasketches.kll.KllDoublesSketch): org.apache.datasketches.kll.KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: org.apache.datasketches.kll.KllDoublesSketch): Any =
    buffer.toByteArray

  override def serialize(buffer: org.apache.datasketches.kll.KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.kll.KllDoublesSketch =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllAgg =
    copy(child = newChild)
}

/** `kll_union_agg(sketch, k)`: fold serialized [[KllAgg]] sketches into
  * one — the rollup side of the mergeable quantile store (any subset of
  * per-partition sketch rows + appended delta batches → one sketch,
  * never rescanning the base table). */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllDoublesSketch]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"kll_union_agg needs 8 <= k <= 65535, got $k")

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(BinaryType)

  override def createAggregationBuffer(): org.apache.datasketches.kll.KllDoublesSketch =
    org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: org.apache.datasketches.kll.KllDoublesSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(b1: org.apache.datasketches.kll.KllDoublesSketch,
                     b2: org.apache.datasketches.kll.KllDoublesSketch): org.apache.datasketches.kll.KllDoublesSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buffer: org.apache.datasketches.kll.KllDoublesSketch): Any =
    buffer.toByteArray

  override def serialize(buffer: org.apache.datasketches.kll.KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.kll.KllDoublesSketch =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_union_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Static helpers for the KLL scalar readers (one static call per row
  * from generated code — the Kernels discipline). */
object KllKernels {
  def quantiles(sketch: Array[Byte], probsPpm: Array[Long]): ArrayData = {
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(sketch))
    // empty sketch → empty array (defineCodeGen cannot surface a null
    // result from the static helper)
    if (sk.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](probsPpm.length)
    var i = 0
    while (i < probsPpm.length) {
      out(i) = sk.getQuantile(probsPpm(i).toDouble / 1e6,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
      i += 1
    }
    new GenericArrayData(out)
  }

  def n(sketch: Array[Byte]): Long =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(sketch)).getN
}

/** `kll_quantiles(sketch, probsPpm)`: read INCLUSIVE-rank quantiles out
  * of a serialized KLL sketch — in the exact regime (absorbed n ≤ k)
  * this is the order statistic at 1-based position ceil(p·n), which is
  * what the DuckDB oracle replays. Probabilities ride as integer ppm
  * (the engine's portability rule — 0.95 is not exactly representable,
  * 950000 is). An empty sketch yields an empty array. */
case class KllQuantiles(child: Expression, probsPpm: Seq[Long])
    extends UnaryExpression {
  require(probsPpm.nonEmpty && probsPpm.forall(p => p >= 0 && p <= 1000000),
    s"kll_quantiles needs ppm ranks in [0, 1000000], got $probsPpm")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"
  @transient private lazy val probsArr: Array[Long] = probsPpm.toArray
  override def nullSafeEval(v: Any): Any =
    KllKernels.quantiles(v.asInstanceOf[Array[Byte]], probsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("kllProbs", probsArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.KllKernels.quantiles($c, $pref)")
  }
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

/** `kll_n(sketch)`: the absorbed-value count of a serialized KLL
  * sketch — the exact-regime witness (n ≤ k ⇒ quantiles are exact
  * order statistics). */
case class KllN(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override def nullSafeEval(v: Any): Any =
    KllKernels.n(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.KllKernels.n($c)")
  override protected def withNewChildInternal(c: Expression): KllN =
    copy(child = c)
}

/** `theta_agg(expr, lgK)`: mergeable Theta sketch (Dasgupta et al.,
  * the DataSketches KMV-style theta family) over a string column —
  * the distinct-count sketch that, unlike HLL, supports SET
  * OPERATIONS: intersections and differences of sketches estimate
  * |A∩B| and |A\B| without ever joining the underlying sets. That is
  * the corpus-release question HLL structurally cannot answer ("how
  * many documents/tokens do releases A and B share; how many are
  * new"). Below 2^lgK distinct values the sketch retains every hash
  * (θ = 1) and all estimates are EXACT — the oracle regime; beyond,
  * the published ~1/√(2^lgK) relative error applies. */
case class ThetaAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(lgK >= 4 && lgK <= 26, s"theta_agg needs 4 <= lgK <= 26, got $lgK")

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(StringType)

  private def newUnion(): org.apache.datasketches.theta.Union =
    org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
    newUnion()

  override def update(buffer: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(b1: org.apache.datasketches.theta.Union,
                     b2: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buffer: org.apache.datasketches.theta.Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: org.apache.datasketches.theta.Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
    val u = newUnion()
    u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaAgg =
    copy(child = newChild)
}

/** Static helpers for the Theta scalar readers. */
object ThetaKernels {
  private def wrap(b: Array[Byte]) =
    org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(b))

  /** Rounded estimate — exact-integer in the θ = 1 regime. */
  def estimate(sketch: Array[Byte]): Long =
    Math.round(wrap(sketch).getEstimate)

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = org.apache.datasketches.theta.SetOperation.builder()
      .buildIntersection()
    i.intersect(wrap(a))
    i.intersect(wrap(b))
    i.getResult.toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val d = org.apache.datasketches.theta.SetOperation.builder().buildANotB()
    d.setA(wrap(a))
    d.notB(wrap(b))
    d.getResult(true, null, true).toByteArray
  }

  def union2(a: Array[Byte], b: Array[Byte], lgK: Int): Array[Byte] = {
    val u = org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    u.getResult.toByteArray
  }
}

/** `theta_estimate(sketch)`: rounded distinct estimate. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(v: Any): Any =
    ThetaKernels.estimate(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaKernels.estimate($c)")
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(c)
}

/** `theta_intersect(a, b)`: sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaKernels.intersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

/** `theta_anotb(a, b)`: sketch of A \ B. */
case class ThetaANotB(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_anotb"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaKernels.aNotB($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB =
    copy(left = l, right = r)
}

/** `theta_union2(a, b, lgK)`: sketch of A ∪ B. */
case class ThetaUnion2(left: Expression, right: Expression, lgK: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union2"
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.union2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], lgK)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ThetaKernels.union2($a, $b, $lgK)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnion2 =
    copy(left = l, right = r)
}

/** `cm_inner_product(a, b, depth, width)`: join-size estimate from two
  * [[CountMinAgg]] sketches — min over hash rows of the cellwise
  * inner product Σ_j a[i][j]·b[i][j], the classic AGMS/count-min
  * result: an UPPER bound on Σ_k f_a(k)·f_b(k) = |A ⋈ B| within
  * ε·N_a·N_b (ε = e/width), exact when at least one hash row maps the
  * two key multisets collision-free. Pre-flight join sizing from
  * persistable, mergeable per-table sketches: no data joins, no scan
  * at decision time. */
case class CmInnerProduct(left: Expression, right: Expression,
                          depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // CodegenFallback: evaluated once per (pair of 1-row sketch frames)
  // — a cold-path scalar, never in a per-row hot loop
  require(depth >= 1 && width >= 1, s"need depth/width >= 1, got $depth/$width")
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_inner_product"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    require(av.numElements() == depth * width &&
      bv.numElements() == depth * width,
      s"cm_inner_product expects $depth*$width cells")
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      var s = 0L
      var j = 0
      while (j < width) {
        s += av.getLong(i * width + j) * bv.getLong(i * width + j)
        j += 1
      }
      if (s < best) best = s
      i += 1
    }
    best
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmInnerProduct =
    copy(left = l, right = r)
}

/** `theta_union_agg(sketch, lgK)`: fold serialized [[ThetaAgg]]
  * sketches into one — the rollup side of the mergeable theta store
  * (per-day sketches union to any grain without rescanning keys). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with UnaryLike[Expression] with ImplicitCastInputTypes {

  require(lgK >= 4 && lgK <= 26, s"theta_union_agg needs 4 <= lgK <= 26, got $lgK")

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(BinaryType)

  private def newUnion(): org.apache.datasketches.theta.Union =
    org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): org.apache.datasketches.theta.Union =
    newUnion()

  override def update(buffer: org.apache.datasketches.theta.Union,
                      input: InternalRow): org.apache.datasketches.theta.Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(
      org.apache.datasketches.theta.Sketches.wrapSketch(
        org.apache.datasketches.memory.Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(b1: org.apache.datasketches.theta.Union,
                     b2: org.apache.datasketches.theta.Union): org.apache.datasketches.theta.Union = {
    b1.union(b2.getResult)
    b1
  }

  override def eval(buffer: org.apache.datasketches.theta.Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: org.apache.datasketches.theta.Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.theta.Union = {
    val u = newUnion()
    u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}
