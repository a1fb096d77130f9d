package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared Bloom arithmetic — one definition of the probe-bit family used
  * by BOTH the aggregate (set bits at build) and the SQL prescreen
  * predicate (test bits at scan), so the two can never drift.
  *
  * Probe i of key h (h assumed non-negative, < 2³¹): affine scramble
  * bit_i = ((h·A_i + B_i) mod p) mod (64·mWords) with the repo's integer
  * hash family (A_i = 1000003·(i+1) + 31, B_i = 977·(i+1), p = 2³¹−1).
  * h·A_i ≤ 2.1e9 · ~(d·1e6) stays far below 2⁶³ for any sane d. */
object BloomFilter {
  val P = 2147483647L
  def a(i: Int): Long = 1000003L * (i + 1) + 31L
  def b(i: Int): Long = 977L * (i + 1)

  /** floorMod (pmod in the SQL spelling) keeps the bit non-negative for
    * NEGATIVE keys too (round-6 advice: a negative BIGINT fed to the
    * registered SQL function previously indexed the buffer at a negative
    * offset). Key domain is |h| < 2³¹ either sign — beyond that h·a
    * itself overflows int64 (ANSI mode rejects the multiply). For the
    * non-negative keys every in-repo caller produces, floorMod ≡ % —
    * bit-identical images. Build and probe share this one function
    * (bloom_agg / [[probeSql]] / DeconStream.bloomPass), so the
    * normalization cannot desynchronize them. */
  @inline def bitOf(h: Long, i: Int, mWords: Int): Long =
    Math.floorMod(Math.floorMod(h * a(i) + b(i), P), 64L * mWords)

  /** SQL predicate testing all d probe bits of `hashCol` against the
    * ARRAY<BIGINT> column `bloomCol` — pure codegen'd arithmetic
    * (element_at + shiftright), usable in a WHERE that runs inside the
    * scan stage after a broadcast of the one-row bloom table. pmod
    * mirrors [[bitOf]]'s floorMod — same bits for any sign. */
  def probeSql(bloomCol: String, hashCol: String, mWords: Int, d: Int): String =
    (0 until d).map { i =>
      val bit = s"pmod(pmod($hashCol * ${a(i)} + ${b(i)}, $P), ${64L * mWords})"
      s"(shiftright(element_at($bloomCol, CAST($bit div 64 AS INT) + 1), " +
        s"CAST($bit % 64 AS INT)) & 1) = 1"
    }.mkString(" AND ")
}

/** `bloom_agg(h, mWords, d)` — a Bloom filter (Bloom, CACM 13(7), 1970)
  * as a Catalyst aggregate:
  * OR-folds the d probe bits of every BIGINT key into a fixed
  * ARRAY<BIGINT> of mWords 64-bit words.
  *
  * The point is the BROADCAST SHAPE for membership screens at scale
  * (qx32's decontamination prescreen): an exact key set of 10⁸ eval
  * fingerprints is gigabytes — too big to broadcast — while its Bloom
  * image is mWords·8 bytes at any key count, so the filter rides to
  * every scan task and rejects non-members INSIDE the scan stage with
  * ~d integer ops per row and a documented false-positive rate (the
  * standard (1−e^{−dn/m})^d). False positives are then killed by an
  * exact confirm join whose probe side is contamination-bound, not
  * corpus-bound. No false negatives, so the composed result is exact —
  * same mechanism as Spark's runtime row-level filtering, spelled with
  * this repo's deterministic integer hash family so an oracle can
  * reason about it.
  *
  * Merge is word-wise OR — commutative/associative/idempotent, so the
  * result is identical under any partial-aggregation order. Null keys
  * are skipped. mWords and d must be foldable positive INTs. */
case class BloomAgg(
    child: Expression,
    mWordsExpr: Expression,
    dExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with TernaryLike[Expression] {

  private def foldablePositiveInt(e: Expression, name: String): Int =
    e.eval(InternalRow.empty) match {
      case n: Number if n.intValue() > 0 => n.intValue()
      case other => throw new IllegalArgumentException(
        s"bloom_agg: $name must be a positive integer literal, got $other")
    }
  private lazy val mWords: Int = foldablePositiveInt(mWordsExpr, "mWords")
  private lazy val d: Int = foldablePositiveInt(dExpr, "d")

  override def first: Expression = child
  override def second: Expression = mWordsExpr
  override def third: Expression = dExpr

  override def prettyName: String = "bloom_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg: key must be BIGINT, got ${child.dataType.simpleString}")
    else if (!mWordsExpr.foldable || mWordsExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bloom_agg: mWords must be a foldable INT")
    else if (!dExpr.foldable || dExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bloom_agg: d must be a foldable INT")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        val bit = BloomFilter.bitOf(h, i, mWords)
        buf((bit >>> 6).toInt) |= (1L << (bit & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < mWords) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomAgg =
    copy(child = newFirst, mWordsExpr = newSecond, dExpr = newThird)
}
