package graft.corpus

/** Deterministic counter-based PRNG (SplitMix64 finalizer).
  *
  * The reference seeds every stochastic step explicitly
  * (`init_train.R:31`, `az_ml_models.R:290-291`); the engine goes further and
  * derives ALL randomness from pure hashes of (seed, counter) so that any row
  * of the synthetic corpus is reproducible independently of partitioning,
  * task order, or JVM — a requirement for N-vs-4N parallelism determinism.
  * No `Math.random`/`Date.now` anywhere.
  */
object Rng {
  /** SplitMix64 finalizer — a well-known public-domain bijective mixer. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash of (seed, counter, stream) — independent streams per use-site. */
  def hash(seed: Long, i: Long, stream: Long = 0L): Long =
    mix(mix(mix(seed) ^ i) ^ (stream * 0x2545f4914f6cdd1dL))

  /** Uniform double in [0, 1) from a hash value. */
  def double01(h: Long): Double = (h >>> 11) * (1.0 / (1L << 53))

  /** Uniform int in [0, n) from a hash value. */
  def int(h: Long, n: Int): Int = {
    require(n > 0)
    (((h >>> 1) % n).toInt + n) % n
  }

  /** Zipf-ish skewed index in [0, n): index k drawn with prob ~ 1/(k+1).
    * Inverse-CDF on the harmonic distribution; exact enough to create the
    * hot-key skew the salting path needs, cheap enough for per-row calls.
    */
  def zipf(h: Long, n: Int): Int = {
    val u = double01(h)
    // CDF(k) = H(k+1)/H(n); approximate H with log for O(1) inversion.
    val hn = math.log(n.toDouble) + 0.5772156649
    val k = math.exp(u * hn) - 1.0
    math.min(n - 1, math.max(0, k.toInt))
  }
}
