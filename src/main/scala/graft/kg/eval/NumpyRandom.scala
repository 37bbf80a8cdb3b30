package graft.kg.eval

/** Bit-exact replica of numpy's legacy `RandomState` draw paths (public
  * algorithms: MT19937, Matsumoto & Nishimura 1998, plus randomkit's masked
  * rejection sampling and 53-bit double construction) — enough to replay
  * the reference's seeded bootstrap loops verbatim:
  *
  *  - `randint(0, n)` / `choice(n, size, replace=True)` → [[interval]]
  *    (rk_interval: smallest covering bitmask, draw-and-reject);
  *  - `uniform` / `random_sample` → [[nextDouble]] (rk_double:
  *    (a·2²⁶ + b) / 2⁵³ from two 32-bit words).
  *
  * Verified against numpy draw-for-draw and by replaying the PUBLISHED
  * bootstrap confidence intervals exactly (ConfidenceSweepSpec).
  */
final class NumpyRandom(seed: Long) {

  private val mt = new Array[Int](624)
  private var idx = 624

  {
    mt(0) = (seed & 0xFFFFFFFFL).toInt
    var i = 1
    while (i < 624) {
      val prev = mt(i - 1) & 0xFFFFFFFFL
      mt(i) = ((1812433253L * (prev ^ (prev >>> 30)) + i) & 0xFFFFFFFFL).toInt
      i += 1
    }
  }

  private def generate(): Unit = {
    var i = 0
    while (i < 624) {
      val y = (mt(i) & 0x80000000) | (mt((i + 1) % 624) & 0x7fffffff)
      var next = mt((i + 397) % 624) ^ (y >>> 1)
      if ((y & 1) == 1) next ^= 0x9908b0df
      mt(i) = next
      i += 1
    }
    idx = 0
  }

  /** One 32-bit word, as an unsigned value in a Long. */
  def nextU32(): Long = {
    if (idx >= 624) generate()
    var y = mt(idx); idx += 1
    y ^= (y >>> 11)
    y ^= (y << 7) & 0x9d2c5680
    y ^= (y << 15) & 0xefc60000
    y ^= (y >>> 18)
    y & 0xFFFFFFFFL
  }

  /** rk_interval: uniform on [0, max] via covering-mask rejection — the
    * path behind legacy randint/choice. */
  def interval(max: Long): Long = {
    var mask = max
    mask |= mask >> 1; mask |= mask >> 2; mask |= mask >> 4
    mask |= mask >> 8; mask |= mask >> 16; mask |= mask >> 32
    var v = nextU32() & mask
    while (v > max) v = nextU32() & mask
    v
  }

  /** rk_double: 53-bit uniform in [0, 1). */
  def nextDouble(): Double = {
    val a = nextU32() >>> 5
    val b = nextU32() >>> 6
    (a * 67108864.0 + b) / 9007199254740992.0
  }

  /** uniform(lo, hi). */
  def uniform(lo: Double, hi: Double): Double = lo + (hi - lo) * nextDouble()

  /** choice(n, size, replace=True) without weights = size randint draws. */
  def choice(n: Int, size: Int): Array[Int] =
    Array.fill(size)(interval(n - 1L).toInt)
}
