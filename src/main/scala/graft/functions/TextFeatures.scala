package graft.functions

import scala.collection.mutable

/** Text-similarity kernels for the hybrid rerank path (SURVEY §2 O14/O16).
  *
  * Capability parity, not bit parity (SURVEY §7.3): the reference delegates
  * to sklearn's `HashingVectorizer(ngram_range=(1,6), analyzer='char',
  * n_features=64)` (/root/reference/minivectordb/vector_database.py:9,388-393)
  * and `thefuzz.fuzz.partial_ratio`
  * (/root/reference/minivectordb/vector_database.py:410-411). Both are
  * reimplemented from their published algorithms: signed feature hashing
  * (Weinberger et al., 2009) and difflib's Ratcliff/Obershelp matching.
  *
  * These run as Scala UDFs over SMALL DataFrames only — rerank operates on a
  * top-k result (≤ k rows) plus one query string, never on the full corpus —
  * so the non-codegen path is not a scale concern.
  */
object TextFeatures {

  val NumFeatures = 64
  val MinGram = 1
  val MaxGram = 6

  /** Char n-gram (1–6) signed feature hashing into 64 dims, L2-normalized —
    * sklearn `HashingVectorizer` semantics (lowercase, char analyzer, signed
    * alternating hash, norm='l2'). Hash is MurmurHash3 (Scala stdlib seed-0
    * string hash; sklearn uses murmurhash3_32 over utf-8 — same family,
    * different byte walk, equivalent capability).
    */
  def charNgramHash(text: String): Array[Float] = {
    val v = new Array[Double](NumFeatures)
    if (text != null) {
      val t = text.toLowerCase
      var n = MinGram
      while (n <= MaxGram) {
        var i = 0
        val last = t.length - n
        while (i <= last) {
          val h = scala.util.hashing.MurmurHash3.stringHash(t.substring(i, i + n), 0)
          val bucket = ((h % NumFeatures) + NumFeatures) % NumFeatures
          v(bucket) += (if (h >= 0) 1.0 else -1.0)
          i += 1
        }
        n += 1
      }
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val out = new Array[Float](NumFeatures)
    if (norm > 0) {
      var i = 0
      while (i < NumFeatures) { out(i) = (v(i) / norm).toFloat; i += 1 }
    }
    out
  }

  /** Cosine similarity of two hash-feature vectors (reference
    * `_calculate_text_hash_scores`, vector_database.py:395-408). Inputs are
    * already L2-normalized, so this is a dot product.
    */
  def hashCosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** `thefuzz.fuzz.partial_ratio` ∈ [0, 100]: best SequenceMatcher ratio of
    * the shorter string against every same-length alignment window of the
    * longer, windows anchored at the matching blocks
    * (vector_database.py:410-411). Empty input ⇒ 0, as in thefuzz.
    */
  def partialRatio(s1: String, s2: String): Int = {
    if (s1 == null || s2 == null || s1.isEmpty || s2.isEmpty) return 0
    val (shorter, longer) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    var best = 0.0
    val blocks = matchingBlocks(shorter, longer)
    var bi = 0
    while (bi < blocks.length) {
      val (i, j, _) = blocks(bi)
      val start = math.max(0, j - i)
      val end = math.min(longer.length, start + shorter.length)
      val r = ratio(shorter, longer.substring(start, end))
      if (r > 0.995) return 100
      if (r > best) best = r
      bi += 1
    }
    math.round(100 * best).toInt
  }

  /** Ratcliff/Obershelp similarity (difflib `SequenceMatcher.ratio`):
    * 2·M / (|a|+|b|) where M = total size of matching blocks.
    */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = matchingBlocks(a, b).map(_._3).sum
    2.0 * m / (a.length + b.length)
  }

  /** difflib-style matching blocks: recursive longest-common-substring
    * divide and conquer over a char→positions index of `b`. Autojunk
    * ("popular" chars in b ≥ 200 chars) is applied as in difflib; the junk
    * adjacency extension is omitted (only observable on long, repetitive
    * inputs — rerank operates on sentences).
    */
  private[functions] def matchingBlocks(a: String, b: String): Array[(Int, Int, Int)] = {
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < b.length) {
      b2j.getOrElseUpdate(b(j), mutable.ArrayBuffer.empty[Int]) += j
      j += 1
    }
    if (b.length >= 200) {
      val thresh = b.length / 100 + 1
      val popular = b2j.collect { case (c, js) if js.length > thresh => c }
      popular.foreach(b2j.remove)
    }

    def findLongest(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestSize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val next = mutable.HashMap.empty[Int, Int]
        b2j.get(a(i)).foreach { positions =>
          var p = 0
          while (p < positions.length) {
            val jj = positions(p)
            if (jj >= blo && jj < bhi) {
              val k = j2len.getOrElse(jj - 1, 0) + 1
              next(jj) = k
              if (k > bestSize) { besti = i - k + 1; bestj = jj - k + 1; bestSize = k }
            }
            p += 1
          }
        }
        j2len = next
        i += 1
      }
      (besti, bestj, bestSize)
    }

    val out = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val queue = mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val m @ (i, bj, size) = findLongest(alo, ahi, blo, bhi)
      if (size > 0) {
        out += m
        if (alo < i && blo < bj) queue.push((alo, i, blo, bj))
        if (i + size < ahi && bj + size < bhi) queue.push((i + size, ahi, bj + size, bhi))
      }
    }
    (out.sortBy(t => (t._1, t._2)) += ((a.length, b.length, 0))).toArray
  }
}
