package graft.core

/** Minimal open-addressing long -> long hash map (linear probing, power-of-2
  * capacity, grow at 0.7 load). Exists because the driver-side union-find
  * over collected near-dup pair graphs ([[graft.operators.Dedup]]) does tens
  * of millions of get/put operations — `java.util.HashMap[Long, Long]`
  * autoboxes every one of them, and the boxing dominated the union-find
  * stage (~12.7 s at the 100x corpus before this class). No deletion —
  * union-find only inserts and repoints.
  *
  * Keys may be any long except [[LongLongMap.Empty]] (Long.MinValue), which
  * marks free slots — document ids and minhash roots are non-negative, so
  * the sentinel is unreachable in practice and `put` rejects it loudly.
  */
final class LongLongMap(initialCapacity: Int = 1 << 16) {
  import LongLongMap.Empty

  private var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1)
  private var keys = Array.fill[Long](cap)(Empty)
  private var vals = new Array[Long](cap)
  private var n = 0

  def size: Int = n

  private def idx(k: Long): Int = {
    // finalizer from splitmix64 — doc ids are often sequential, and a weak
    // mix would cluster linear probes
    var z = k + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & (cap - 1)).toInt
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1
    keys = Array.fill[Long](cap)(Empty)
    vals = new Array[Long](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ok(i) != Empty) put(ok(i), ov(i))
      i += 1
    }
  }

  def put(k: Long, v: Long): Unit = {
    require(k != Empty, "LongLongMap: key = Long.MinValue is the free-slot sentinel")
    if (n * 10L >= cap * 7L) grow()
    var i = idx(k)
    while (keys(i) != Empty && keys(i) != k) i = (i + 1) & (cap - 1)
    if (keys(i) == Empty) { keys(i) = k; n += 1 }
    vals(i) = v
  }

  def putIfAbsent(k: Long, v: Long): Unit = {
    require(k != Empty, "LongLongMap: key = Long.MinValue is the free-slot sentinel")
    if (n * 10L >= cap * 7L) grow()
    var i = idx(k)
    while (keys(i) != Empty && keys(i) != k) i = (i + 1) & (cap - 1)
    if (keys(i) == Empty) { keys(i) = k; vals(i) = v; n += 1 }
  }

  /** Repoint an EXISTING key — no insertion, no growth, so it is safe to
    * call while iterating with [[foreachEntry]] (union-find's path
    * compression repoints existing nodes during the final label sweep).
    */
  def update(k: Long, v: Long): Unit = {
    var i = idx(k)
    while (keys(i) != k) {
      if (keys(i) == Empty)
        throw new NoSuchElementException(s"LongLongMap: update of missing key $k")
      i = (i + 1) & (cap - 1)
    }
    vals(i) = v
  }

  /** Value for `k`; the map must contain it (union-find always seeds a node
    * before finding it).
    */
  def apply(k: Long): Long = {
    var i = idx(k)
    while (keys(i) != k) {
      if (keys(i) == Empty)
        throw new NoSuchElementException(s"LongLongMap: missing key $k")
      i = (i + 1) & (cap - 1)
    }
    vals(i)
  }

  def contains(k: Long): Boolean = {
    var i = idx(k)
    while (keys(i) != Empty) {
      if (keys(i) == k) return true
      i = (i + 1) & (cap - 1)
    }
    false
  }

  /** Visit every (key, value) pair. */
  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      if (keys(i) != Empty) f(keys(i), vals(i))
      i += 1
    }
  }
}

object LongLongMap {
  val Empty: Long = Long.MinValue
}
