package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog register arrays for HyperBall-style iterative graph
  * sketches ([[graft.operators.Graph.harmonicHyperBall]]).
  *
  * Public algorithm (Flajolet et al. 2007; Boldi & Vigna 2013 use
  * exactly this merge for HyperBall): a set is summarized by m = 2^p
  * byte registers; adding element x sets register (top p bits of
  * h(x)) to max(current, 1 + leading-zeros of the remaining bits);
  * UNION of two sets is the elementwise max of their registers — the
  * property that makes ball expansion a mergeable aggregate: at 100 TB
  * each vertex carries m bytes of state, and a round's shuffle moves
  * registers, never vertex SETS.
  *
  * Hash: the engine's standard xxhash64 (catalyst XXH64.hashLong,
  * seed 42) — deterministic across runs and engines.
  */
object Hll {
  val P: Int = 8
  val M: Int = 1 << P // 256 registers, rel. std. err. 1.04/sqrt(m) = 6.5%

  private val alphaM: Double = 0.7213 / (1.0 + 1.079 / M)

  /** Registers for the singleton set {x}. */
  def init(x: Long): Array[Byte] = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(x, 42L)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rho = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = new Array[Byte](M)
    r(idx) = rho.toByte
    r
  }

  /** Standard HLL cardinality estimate with the small-range
    * (linear-counting) correction; large-range correction is moot for
    * 64-bit hashes. */
  def estimate(reg: Array[Byte]): Double = {
    var sum = 0.0; var zeros = 0; var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -reg(i).toDouble)
      if (reg(i) == 0) zeros += 1
      i += 1
    }
    val e = alphaM * M * M / sum
    if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else e
  }
}

/** Typed aggregate: elementwise max of HLL register arrays = the union
  * of the sketched sets (SURVEY §2.10 Aggregator family, beside
  * [[VectorCentroid]]). Buffer is one m-byte array per group — the
  * ONLY state that crosses the shuffle. */
object HllMax extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {

  override def zero: Array[Byte] = Array.emptyByteArray

  private def mx(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val r = a.clone()
    var i = 0
    while (i < r.length && i < b.length) {
      if (b(i) > r(i)) r(i) = b(i)
      i += 1
    }
    r
  }

  override def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] = mx(b, v)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mx(a, b)
  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}
