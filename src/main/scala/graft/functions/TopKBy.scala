package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score DESC, id ASC): arrays kept
  * sorted, O(k) shift on accept, O(1) reject against the current floor.
  * k is small (single digits in every caller), so the linear shift beats
  * heap bookkeeping. */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  @inline private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long): Unit = {
    if (size == k && !beats(s, id, size - 1)) return
    var pos = if (size == k) size - 1 else { size += 1; size - 1 }
    while (pos > 0 && beats(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
  }
}

/** `topk_by(score, id, k)` — bounded top-k as a Catalyst aggregate:
  * returns ARRAY<STRUCT<id BIGINT, score DOUBLE>> of the k largest
  * (score, id) pairs, ordered (score DESC, id ASC) — exactly the prefix a
  * `row_number() OVER (ORDER BY score DESC, id ASC) <= k` window keeps.
  *
  * The point is the SHUFFLE SHAPE, not the arithmetic. The window
  * spelling of distributed top-k must first cluster the scored rows, so
  * `Window.partitionBy(qid)` exchanges the ENTIRE n·q-row candidate set
  * before discarding all but k per query — at 100 TB that exchange, not
  * the scan, is the bottleneck. As a TypedImperativeAggregate this runs
  * inside ObjectHashAggregate with a partial pass: each map task reduces
  * its slice to ≤ k entries per query, and the exchange carries one
  * ~k·16-byte buffer per (query, map task). n·q rows shrink to q·tasks·k
  * before any network move — the same partial/final split Spark's own
  * sum() gets, applied to an order statistic.
  *
  * Null scores/ids are skipped (a null candidate can't rank). k must be a
  * foldable positive INT. Ties are impossible in the callers (ids are
  * distinct), but the (score DESC, id ASC) total order makes the result
  * deterministic under any merge order regardless. */
case class TopKBy(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case n: Number if n.intValue() > 0 => n.intValue()
    case other => throw new IllegalArgumentException(
      s"topk_by: k must be a positive integer literal, got $other")
  }

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = kExpr

  override def prettyName: String = "topk_by"
  override def nullable: Boolean = false
  // Neutral field names: topk_by serves ANN top-k (qx2/qx3/qx13/qx15/
  // qx16), KMV min-k hashes (qx18) and heavy-hitter counts (qx19) —
  // callers alias on select.
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: score must be DOUBLE, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: id must be BIGINT, got ${id.dataType.simpleString}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("topk_by: k must be a foldable INT")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = new GenericInternalRow(Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // Entries arrive already sorted, so re-inserting is O(n·1) shifts.
    while (i < n) { val s = bb.getDouble(); val id = bb.getLong(); buf.insert(s, id); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKBy =
    copy(score = newFirst, id = newSecond, kExpr = newThird)
}
