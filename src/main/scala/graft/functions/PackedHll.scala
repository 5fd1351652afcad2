package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** 5-bit-packed HLL register files for HyperBall (Boldi & Vigna 2013
  * §4.2 — their counters are exactly this: ⌈log log n⌉ = 5-bit
  * registers packed into words, merged by per-register max).
  *
  * Why not Datasketches (the engine's default HLL elsewhere): the
  * HyperBall superstep merges one sketch PER EDGE MESSAGE — at 100×
  * scale ~10⁸ merges per hop — and a library-object merge pays
  * heapify (decompress the compact form, allocate a sketch object)
  * plus a Union update and a re-serialization per row. Measured on
  * the 100× layout that CPU dominates end-to-end (HLL_4-compact wire
  * at HALF the bytes of HLL_8 ran 1506 s vs 1226 s — the byte saving
  * lost to decode cost). These expressions strip the superstep to
  * primitive ops: the wire format IS the aggregation buffer (identity
  * serialize/deserialize), update and merge are a bounded loop of
  * shift/mask/max over the packed array, and nothing allocates but
  * the buffer itself.
  *
  * Register semantics are textbook HLL: hash the vertex id with the
  * splitmix64 finalizer (public-domain constants), index by the low
  * lgK bits, rho = trailing-zero count of the remaining bits + 1,
  * clamped to 31 (5 bits) — P(rho > 31) = 2⁻³¹ per insertion, vacuous
  * at any graph size a single register file can estimate. Estimation
  * uses Ertl's improved raw estimator (Ertl 2017, "New cardinality
  * estimation algorithms for HyperLogLog sketches", alg. 8: the σ/τ
  * series) — bias-free across the small/intermediate/large ranges
  * without HLL++'s empirical tables, so the g34 10% audit holds on
  * every scale without special-casing linear counting.
  *
  * Wire formats (bytes[0] is the discriminator):
  *  - DENSE: bytes[0] = lgK (> 0); register j occupies bits
  *    [5j, 5j+5) of the remaining bytes, little-endian within each
  *    byte.
  *  - SPARSE: bytes[0] = −lgK (< 0); bytes[1..2] = entry count
  *    (little-endian), then 3 bytes per entry (2-byte register index,
  *    1-byte value). A 1-element seed is 6 bytes, a degree-68
  *    neighbourhood ~200 — the LIST-mode property that keeps hop-1
  *    messages (and any small-ball graph) from paying the full
  *    register file on the wire. [[maybeSparse]] picks whichever
  *    encoding is smaller at serialize/eval time; aggregation buffers
  *    are always dense.
  */
object PackedHll {

  private[graft] def numRegs(lgK: Int): Int = 1 << lgK
  private[graft] def numBytes(lgK: Int): Int = 1 + (5 * numRegs(lgK) + 7) / 8

  private[graft] def getReg(b: Array[Byte], j: Int): Int = {
    val bit = 5 * j
    val byt = 1 + (bit >> 3)
    val off = bit & 7
    val lo = (b(byt) & 0xFF) >>> off
    val v = if (off <= 3) lo else lo | ((b(byt + 1) & 0xFF) << (8 - off))
    v & 31
  }

  private[graft] def setReg(b: Array[Byte], j: Int, v: Int): Unit = {
    val bit = 5 * j
    val byt = 1 + (bit >> 3)
    val off = bit & 7
    b(byt) = ((b(byt) & ~(31 << off)) | ((v & 31) << off)).toByte
    if (off > 3)
      b(byt + 1) = ((b(byt + 1) & ~(31 >>> (8 - off))) |
        ((v & 31) >>> (8 - off))).toByte
  }

  /** Per-register max of `from` (dense OR sparse) into dense `into`
    * (in place). Sparse inputs merge in O(entries), not O(m). */
  private[graft] def maxMerge(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into(0) > 0, "merge target must be dense")
    if (from(0) < 0) {
      require(-from(0) == into(0),
        s"packed-HLL lgK mismatch: ${-from(0)} vs ${into(0)}")
      val c = (from(1) & 0xFF) | ((from(2) & 0xFF) << 8)
      var i = 0
      while (i < c) {
        val o = 3 + 3 * i
        val j = (from(o) & 0xFF) | ((from(o + 1) & 0xFF) << 8)
        val v = from(o + 2) & 0xFF
        if (v > getReg(into, j)) setReg(into, j, v)
        i += 1
      }
    } else {
      require(into(0) == from(0),
        s"packed-HLL lgK mismatch: ${into(0)} vs ${from(0)}")
      val m = numRegs(into(0).toInt)
      var j = 0
      while (j < m) {
        val f = getReg(from, j)
        if (f > getReg(into, j)) setReg(into, j, f)
        j += 1
      }
    }
  }

  /** Dense copy of a dense-or-sparse register file. */
  private[graft] def toDense(b: Array[Byte]): Array[Byte] = {
    if (b(0) > 0) return b
    val lgK = -b(0)
    val d = new Array[Byte](numBytes(lgK))
    d(0) = lgK.toByte
    maxMerge(d, b)
    d
  }

  /** The smaller wire encoding of a DENSE register file: sparse when
    * the non-zero entries fit in fewer bytes, the input otherwise. */
  private[graft] def maybeSparse(b: Array[Byte]): Array[Byte] = {
    val lgK = b(0).toInt
    val m = numRegs(lgK)
    var c = 0
    var j = 0
    while (j < m) { if (getReg(b, j) != 0) c += 1; j += 1 }
    if (3 + 3 * c >= b.length) return b
    val s = new Array[Byte](3 + 3 * c)
    s(0) = (-lgK).toByte
    s(1) = (c & 0xFF).toByte
    s(2) = ((c >> 8) & 0xFF).toByte
    var i = 0
    j = 0
    while (j < m) {
      val v = getReg(b, j)
      if (v != 0) {
        val o = 3 + 3 * i
        s(o) = (j & 0xFF).toByte
        s(o + 1) = ((j >> 8) & 0xFF).toByte
        s(o + 2) = v.toByte
        i += 1
      }
      j += 1
    }
    s
  }

  /** splitmix64 finalizer — the public-domain 64-bit mix. */
  private[graft] def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[graft] def singleton(id: Long, lgK: Int): Array[Byte] = {
    val z = mix64(id)
    val j = (z & (numRegs(lgK) - 1)).toInt
    val w = z >>> lgK
    val rho = math.min(
      if (w == 0L) 64 - lgK + 1
      else java.lang.Long.numberOfTrailingZeros(w) + 1, 31)
    // sparse 1-entry encoding: 6 bytes on the wire, not a register file
    Array[Byte]((-lgK).toByte, 1, 0,
      (j & 0xFF).toByte, ((j >> 8) & 0xFF).toByte, rho.toByte)
  }

  // ---- Ertl 2017 improved raw estimator (σ/τ series, alg. 8) ------

  private def sigma(x0: Double): Double = {
    if (x0 >= 1.0) return Double.PositiveInfinity
    var x = x0; var y = 1.0; var z = x; var zPrev = -1.0
    while (z != zPrev) { x *= x; zPrev = z; z += x * y; y += y }
    z
  }

  private def tau(x0: Double): Double = {
    if (x0 <= 0.0 || x0 >= 1.0) return 0.0
    var x = x0; var y = 1.0; var z = 1.0 - x; var zPrev = -1.0
    while (z != zPrev) {
      x = math.sqrt(x); zPrev = z; y *= 0.5
      val d = 1.0 - x
      z -= d * d * y
    }
    z / 3.0
  }

  private[graft] def estimate(b0: Array[Byte]): Double = {
    val b = toDense(b0)
    val lgK = b(0).toInt
    val m = numRegs(lgK)
    val q = 64 - lgK
    val hist = new Array[Int](q + 2)
    var j = 0
    while (j < m) {
      val v = getReg(b, j)
      hist(math.min(v, q + 1)) += 1
      j += 1
    }
    var z = m * tau(1.0 - hist(q + 1).toDouble / m)
    var k = q
    while (k >= 1) { z = 0.5 * (z + hist(k)); k -= 1 }
    z += m * sigma(hist(0).toDouble / m)
    (m.toDouble * m / z) / (2.0 * math.log(2.0))
  }

  // ---- Catalyst surface -------------------------------------------

  /** Scalar singleton register file: the HyperBall sk₀(v) = {v} seed —
    * a pure function of the id; no aggregate, no shuffle. */
  case class Hll5Singleton(child: Expression, lgK: Int)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"hll5_singleton requires a bigint input, got $t")
      }
    override def dataType: DataType = BinaryType
    override def prettyName: String = "hll5_singleton"
    override protected def nullSafeEval(v: Any): Any =
      singleton(v.asInstanceOf[Long], lgK)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Union aggregate over packed register files. The buffer IS the
    * wire format — serialize/deserialize are identity — and every
    * update/merge is one bounded shift-mask-max loop, so map-side
    * combine runs at memory speed and the exchange moves 5 bits per
    * register. */
  case class Hll5UnionAgg(child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"hll5_union_agg requires a binary (packed registers) input, got $t")
      }
    override def createAggregationBuffer(): Array[Byte] = {
      val b = new Array[Byte](numBytes(lgK))
      b(0) = lgK.toByte
      b
    }
    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) maxMerge(buf, v.asInstanceOf[Array[Byte]])
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      maxMerge(a, b); a
    }
    // eval/serialize emit the SMALLER encoding (sparse below ~1/3
    // register occupancy): hop-1 HyperBall messages and small-ball
    // graphs then ship bytes ∝ ball size, not ∝ m. deserialize
    // re-densifies so merge() always mutates a full register file.
    override def eval(buf: Array[Byte]): Any = maybeSparse(buf)
    override def serialize(buf: Array[Byte]): Array[Byte] = maybeSparse(buf)
    override def deserialize(bytes: Array[Byte]): Array[Byte] = toDense(bytes)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "hll5_union_agg"
    override def withNewMutableAggBufferOffset(o: Int): Hll5UnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): Hll5UnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Scalar cardinality estimate (Ertl's improved raw estimator). */
  case class Hll5Estimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case BinaryType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"hll5_estimate requires a binary (packed registers) input, got $t")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "hll5_estimate"
    override protected def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  import GraftExpressionBridge.{column, expression}

  /** `hll5_singleton(id)`: packed one-element register file. */
  def hll5Singleton(id: Column, lgK: Int): Column =
    column(Hll5Singleton(expression(id), lgK))

  /** `hll5_union_agg(sk)`: per-register max union. */
  def hll5UnionAgg(sk: Column, lgK: Int): Column =
    column(Hll5UnionAgg(expression(sk), lgK).toAggregateExpression())

  /** `hll5_estimate(sk)`: Ertl-estimated cardinality (double). */
  def hll5Estimate(sk: Column): Column =
    column(Hll5Estimate(expression(sk)))
}
