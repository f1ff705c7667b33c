package graft.operators

/** Primitive open-addressed long→long union-find for the per-partition
  * star-contraction passes ([[Dedup.componentsFromPairs]], bfsLayers).
  *
  * Semantics are exactly the java.util.HashMap variant it replaces:
  * min-VALUE rooting (the smaller root becomes the parent — the same
  * invariant the pointer-jumping fixed point relies on, so the emitted
  * stars and the final labels are bit-identical), full path compression
  * on every root() walk, and a (root, member) star iterator over every
  * key ever seen (self-stars included). The difference is purely
  * physical: keys and parent pointers live in flat long arrays (linear
  * probing, load ≤ 0.75, power-of-two capacity), so the per-edge cost
  * is a handful of array reads instead of 4-10 boxed HashMap
  * operations — on a dup-dense corpus the contraction pass streams the
  * full quadratic survivor edge set through this map, and boxing was
  * both the dominant CPU cost and a run-to-run variance source (young
  * gen allocation ∝ edges).
  *
  * Parents are stored BY KEY (not by slot), so growth never
  * invalidates anything: root() re-hashes each hop, union() links by
  * value. Not thread-safe; one instance per partition iterator.
  */
private[operators] final class LongUnionFind(initialCapacity: Int = 1 << 16) {
  private var cap = {
    val c = Integer.highestOneBit(math.max(initialCapacity, 16))
    if (c < math.max(initialCapacity, 16)) c << 1 else c
  }
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var par = new Array[Long](cap)
  private var occ = new Array[Boolean](cap)
  private var n = 0

  /** probe slot for k: its entry if present, else the insertion slot */
  private def slot(k: Long): Int = {
    var h = k * -7046029254386353131L // Stafford mix13 multiplier
    h ^= (h >>> 32)
    var i = h.toInt & mask
    while (occ(i) && keys(i) != k) i = (i + 1) & mask
    i
  }

  private def grow(): Unit = {
    val ok = keys; val op = par; val oo = occ
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); par = new Array[Long](cap)
    occ = new Array[Boolean](cap)
    var i = 0
    while (i < ok.length) {
      if (oo(i)) {
        val s = slot(ok(i))
        keys(s) = ok(i); par(s) = op(i); occ(s) = true
      }
      i += 1
    }
  }

  /** insert k as its own root if absent */
  private def ensure(k: Long): Unit = {
    if ((n + 1) * 4 > cap * 3) grow()
    val i = slot(k)
    if (!occ(i)) { keys(i) = k; par(i) = k; occ(i) = true; n += 1 }
  }

  /** root of x (must be present), with full path compression */
  private def root(x: Long): Long = {
    var r = x
    var i = slot(r)
    while (par(i) != r) { r = par(i); i = slot(r) }
    var c = x
    var j = slot(c)
    while (par(j) != c) { val nx = par(j); par(j) = r; c = nx; j = slot(c) }
    r
  }

  def union(a: Long, b: Long): Unit = {
    ensure(a); ensure(b)
    val ra = root(a); val rb = root(b)
    if (ra < rb) par(slot(rb)) = ra
    else if (rb < ra) par(slot(ra)) = rb
  }

  /** (root, member) for every key ever seen — the star edge set. Path
    * compression during iteration only rewrites parent VALUES of
    * existing entries, never the key layout, so iteration is stable.
    */
  def stars: Iterator[(Long, Long)] = new Iterator[(Long, Long)] {
    private var i = 0
    private def advance(): Unit = { while (i < cap && !occ(i)) i += 1 }
    advance()
    def hasNext: Boolean = i < cap
    def next(): (Long, Long) = {
      val k = keys(i); i += 1; advance(); (root(k), k)
    }
  }
}
