package graft.core

/** Token-bucket rate limiter guarding metric creation (reference:
  * rurouni/utils.py:55-104; wired at rurouni/cache.py:119-121 with
  * capacity = fill rate = MAX_CREATES_PER_MINUTE/60). The clock is
  * injectable so tests are deterministic.
  */
final class TokenBucket(val capacity: Double, val fillRate: Double,
                        clock: () => Double = () => System.nanoTime() / 1e9) {
  private var tokens: Double = capacity
  private var timestamp: Double = clock()

  private def refill(): Unit =
    if (tokens < capacity) {
      val now = clock()
      tokens = math.min(capacity, tokens + fillRate * (now - timestamp))
      timestamp = now
    }

  /** Take `n` tokens; false (and no tokens taken) when not enough. */
  def consume(n: Double): Boolean = synchronized {
    refill()
    if (n <= tokens) { tokens -= n; true } else false
  }

  def available: Double = synchronized { refill(); tokens }
}
