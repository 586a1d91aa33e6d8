package graft.engine

/** Primitive-array collections for the single-task local graph paths
  * (Dedup.localCc, Graph.localPagerank/localTriangles): at the adaptive
  * thresholds (5-10M edges) boxed tuples/maps would multiply the working
  * set several-fold past the "one executor's working set" budget the
  * thresholds are justified by — these keep it at true 16 B/edge +
  * ~24 B/node. */
object Primitives {

  /** Minimal open-addressing Long→Long hash map on primitive arrays.
    * Linear probing, power-of-two capacity, grow-by-doubling at 60% load,
    * no deletion, not thread-safe. Doubles ride along bit-exactly via
    * doubleToRawLongBits/longBitsToDouble at the caller. */
  final class LongLongMap(initialCapacity: Int = 64) {
    private var cap = Integer.highestOneBit(
      math.max(16, initialCapacity - 1) << 1)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var occ = new Array[Boolean](cap)
    private var n = 0

    def size: Int = n

    private def slot(k: Long): Int = {
      // 64→32-bit mix then fibonacci scramble — avalanche enough for ids
      var h = (k ^ (k >>> 32)).toInt * 0x9E3779B9
      h ^= (h >>> 16)
      h &= (cap - 1)
      while (occ(h) && keys(h) != k) h = (h + 1) & (cap - 1)
      h
    }

    def contains(k: Long): Boolean = occ(slot(k))

    def getOrElse(k: Long, dflt: Long): Long = {
      val i = slot(k); if (occ(i)) vals(i) else dflt
    }

    /** Unchecked read — caller must know the key is present. */
    def apply(k: Long): Long = vals(slot(k))

    def update(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!occ(i)) {
        occ(i) = true; keys(i) = k; n += 1
        if (n * 5 >= cap * 3) grow()
      }
      vals(slot(k)) = v
    }

    def addTo(k: Long, delta: Long): Unit =
      update(k, getOrElse(k, 0L) + delta)

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val oo = occ
      cap <<= 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      occ = new Array[Boolean](cap)
      n = 0
      var i = 0
      while (i < ok.length) {
        if (oo(i)) update(ok(i), ov(i))
        i += 1
      }
    }

    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) { if (occ(i)) f(keys(i), vals(i)); i += 1 }
    }

    /** Entry iterator (boxes only at emission — output-sized, not
      * edge-sized). */
    def iterator: Iterator[(Long, Long)] = (0 until cap).iterator
      .filter(occ(_)).map(i => (keys(i), vals(i)))
  }

  /** In-place quicksort of two parallel long arrays by (a, then b) —
    * gives grouped runs for adjacency iteration and binary-searchable
    * membership without boxing an index permutation. */
  def sortPairs(a: Array[Long], b: Array[Long]): Unit = {
    def swap(i: Int, j: Int): Unit = {
      val ta = a(i); a(i) = a(j); a(j) = ta
      val tb = b(i); b(i) = b(j); b(j) = tb
    }
    def lt(i: Int, pa: Long, pb: Long): Boolean =
      a(i) < pa || (a(i) == pa && b(i) < pb)
    def gt(i: Int, pa: Long, pb: Long): Boolean =
      a(i) > pa || (a(i) == pa && b(i) > pb)
    def sort(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (lo < hi) {
        // median-of-three pivot guards the sorted-input worst case
        val mid = lo + ((hi - lo) >>> 1)
        if (lt(mid, a(lo), b(lo))) swap(lo, mid)
        if (lt(hi, a(lo), b(lo))) swap(lo, hi)
        if (lt(hi, a(mid), b(mid))) swap(mid, hi)
        val pa = a(mid); val pb = b(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (lt(i, pa, pb)) i += 1
          while (gt(j, pa, pb)) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        // recurse into the smaller side, loop on the larger (O(log n) stack)
        if (j - lo < hi - i) { sort(lo, j); lo = i }
        else { sort(i, hi); hi = j }
      }
    }
    if (a.length > 1) sort(0, a.length - 1)
  }

  /** Binary search for the pair (ka, kb) in parallel arrays sorted by
    * `sortPairs`. */
  def containsPair(a: Array[Long], b: Array[Long], ka: Long, kb: Long): Boolean = {
    var lo = 0; var hi = a.length - 1
    while (lo <= hi) {
      val mid = lo + ((hi - lo) >>> 1)
      if (a(mid) < ka || (a(mid) == ka && b(mid) < kb)) lo = mid + 1
      else if (a(mid) > ka || (a(mid) == ka && b(mid) > kb)) hi = mid - 1
      else return true
    }
    false
  }
}
