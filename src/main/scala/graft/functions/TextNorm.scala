package graft.functions

import java.text.Normalizer

/** Pure-JVM text normalization kernels shared by the Catalyst expression
  * ([[graft.plans.NormalizeDiacritics]]), plain UDF registration, and tests.
  *
  * Mirrors the reference's `normalize_czech` (reference
  * `pspcz_analyzer/utils/text.py:6-14`): NFD-decompose, drop combining
  * marks, lowercase — so "Dvořák" ≡ "dvorak" in search predicates.
  */
object TextNorm {

  /** Strip diacritics only (no case fold). Null-safe. */
  def stripDiacritics(s: String): String =
    if (s == null) null
    else {
      val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
      // fast path: no combining marks present
      var hasMark = false
      var i = 0
      while (i < decomposed.length && !hasMark) {
        val t = Character.getType(decomposed.charAt(i))
        hasMark = t == Character.NON_SPACING_MARK ||
          t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK
        i += 1
      }
      if (!hasMark) decomposed
      else decomposed.replaceAll("\\p{M}", "")
    }

  /** Reference-parity search normalization: strip accents + lowercase. */
  def normalizeSearch(s: String): String =
    if (s == null) null else stripDiacritics(s).toLowerCase(java.util.Locale.ROOT)

  /** Python difflib.SequenceMatcher.ratio() — exact port (without the
    * "autojunk" heuristic, which never triggers on short name strings).
    * Used by the fuzzy submitter-name join (reference
    * `services/amendments/submitter_resolver.py:16-91`).
    * ratio = 2*M / (len(a)+len(b)) where M = total matched chars over the
    * recursive longest-matching-block decomposition.
    */
  def sequenceMatcherRatio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val la = a.length; val lb = b.length
    if (la + lb == 0) return 1.0

    // b2j: char -> positions in b
    val b2j = new java.util.HashMap[Char, java.util.ArrayList[Int]]()
    var i = 0
    while (i < lb) {
      val c = b.charAt(i)
      var l = b2j.get(c)
      if (l == null) { l = new java.util.ArrayList[Int](); b2j.put(c, l) }
      l.add(i)
      i += 1
    }

    // find longest match in a[alo,ahi) x b[blo,bhi) — difflib algorithm
    def longestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = new java.util.HashMap[Int, Int]()
      var ia = alo
      while (ia < ahi) {
        val newj2len = new java.util.HashMap[Int, Int]()
        val positions = b2j.get(a.charAt(ia))
        if (positions != null) {
          val it = positions.iterator()
          var break = false
          while (it.hasNext && !break) {
            val jb = it.next()
            if (jb >= blo) {
              if (jb >= bhi) break = true
              else {
                val k = j2len.getOrDefault(jb - 1, 0) + 1
                newj2len.put(jb, k)
                if (k > bestsize) { besti = ia - k + 1; bestj = jb - k + 1; bestsize = k }
              }
            }
          }
        }
        j2len = newj2len
        ia += 1
      }
      (besti, bestj, bestsize)
    }

    // sum of matching-block sizes via explicit queue (difflib get_matching_blocks)
    var matches = 0
    val queue = scala.collection.mutable.Stack[(Int, Int, Int, Int)]((0, la, 0, lb))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val (bi, bj, bs) = longestMatch(alo, ahi, blo, bhi)
      if (bs > 0) {
        matches += bs
        queue.push((alo, bi, blo, bj))
        queue.push((bi + bs, ahi, bj + bs, bhi))
      }
    }
    2.0 * matches / (la + lb)
  }
}
