package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Memory-bounded companion to [[DistinctLongCount]]: the same
  * `Aggregator[Long, _, Long]` interface, but the buffer is a fixed
  * 2^p-byte HyperLogLog register array instead of an unbounded
  * `Set[Long]` — one hot key at 100 TB costs 4 KiB of state (p=12),
  * not an executor OOM. Standard HLL (Flajolet et al. 2007): register
  * j = max leading-zero rank of hashes routed to j; estimate =
  * alpha·m²/Σ2^-reg with linear counting below 2.5m. Relative error
  * ≈ 1.04/√m ≈ 1.6 % at p=12. The exact set-buffer path remains the
  * oracle-checked form; this is the declared scale path for
  * cardinalities where an exact set no longer fits.
  *
  * Reference shape: `bean/ProductStats.java:82-90` sizes a `Set<Long>`
  * at window close — same contract, sketch-bounded buffer.
  */
class HllDistinctLongCount(p: Int = 12) extends Aggregator[Long, Array[Byte], Long] {
  require(p >= 7 && p <= 16, s"precision $p out of range [7,16]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  /** splitmix64 finalizer — a full-avalanche 64-bit mix (public
    * domain), so sequential ids spread uniformly over registers. */
  private def hash(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def reduce(b: Array[Byte], a: Long): Array[Byte] = {
    val h = hash(a)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = (if (w == 0) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rho > b(idx)) b(idx) = rho
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (y(i) > x(i)) x(i) = y(i)
      i += 1
    }
    x
  }

  override def finish(b: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -b(i).toDouble)
      if (b(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
