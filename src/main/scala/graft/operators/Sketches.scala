package graft.operators

/** Pure-JVM sketch kernels for MinHash and SimHash.
  *
  * Why not Column higher-order functions: Spark evaluates HOFs
  * (`transform`/`aggregate`) as interpreted CodegenFallback expressions,
  * and nesting the shingle pipeline inside a 128-lambda `transform`
  * re-materializes the shingle array once per lambda — measured 771.9 s
  * for 505 docs in round 1. A single JVM pass per document computes the
  * same sketch in ~60 µs: hash each shingle window once, then derive all
  * 128 signature slots with universal hashing (`a_i*h + b_i` running
  * minima). The Spark surface stays a `Column` (Scala UDF) so the
  * operators remain declarative and composable.
  *
  * Reference semantics: near-duplicate detection over documents — the
  * LLM-training-data extension of the reference pipeline (see PAPERS.md
  * for the published MinHash/SimHash background).
  */
object Sketches {

  /** Sketch of one document: MinHash signature, LSH band hashes, and
    * the distinct hashed shingle set (for exact Jaccard verification). */
  final case class MinHashSketch(sig: Array[Long], bands: Array[Long], shingles: Array[Long])

  /** splitmix64 finalizer — stateless 64-bit avalanche mix. */
  @inline private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over a char window, avalanched. */
  @inline private def hashChars(s: CharSequence, off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    mix64(h)
  }

  /** One-pass, regex-free form of [[graft.functions.Text.normalizeText]]
    * (lowercase, strip ASCII punctuation, collapse whitespace runs to a
    * single space, trim). Whitespace is the Java-regex `\s` set exactly
    * (NOT `Character.isWhitespace`, which also matches U+2000-200A etc.
    * and would diverge from the Column/regex form). Case folding is
    * per-char; byte-identical to the Column form on printable ASCII
    * (property-tested in TextSpec) — exotic one-to-many case mappings
    * (e.g. U+0130) can differ, so non-ASCII corpora should stick to the
    * Column form on both sides of any cross-engine comparison. */
  def normalize(text: String): String = {
    if (text == null) return ""
    val sb = new java.lang.StringBuilder(text.length)
    var pendingSpace = false
    var i = 0
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      val isPunct = (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
        (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) pendingSpace = true
      else if (!isPunct) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Distinct hashed character k-shingles of the normalized text. Each
    * window is hashed exactly once (the round-1 fix). Short texts
    * (< k chars) hash as a single whole-string shingle, matching
    * `Text.shingles`. */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val norm = normalize(text)
    if (norm.length < k) return Array(hashChars(norm, 0, norm.length))
    val n = norm.length - k + 1
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val h = hashChars(norm, i, k)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  /** POSITIONAL k-gram hashes of the normalized text — the exact
    * sequence [[winnow]] rolls its min-window over, exposed so the
    * selection step is externally checkable: the q56b oracle restates
    * `hashChars` in SQL and recomputes every (pos, hash) from the raw
    * corpus, and the q56 oracle then replays the rolling-min pick over
    * them. (Rightmost-min tie-breaking is invisible at that level:
    * tied positions share the hash VALUE, so the distinct fingerprint
    * set per document is exactly the distinct per-window minima.)
    * Short texts (< k chars) yield the single whole-string hash,
    * matching [[winnow]] and [[shingleHashes]]. */
  def gramHashes(text: String, k: Int): Array[Long] = {
    val norm = normalize(text)
    if (norm.length < k) return Array(hashChars(norm, 0, norm.length))
    val n = norm.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hashChars(norm, i, k); i += 1 }
    hs
  }

  /** Universal-hash coefficient tables (a_i odd multiplier, b_i offset),
    * deterministic per slot index. */
  def coefficients(numHashes: Int): (Array[Long], Array[Long]) = (
    Array.tabulate(numHashes)(i => mix64(0xa5a5a5a500000000L + i) | 1L),
    Array.tabulate(numHashes)(i => mix64(0x5a5a5a5a00000000L - i)))

  /** MinHash signature: slot_i = min_j (a_i * h_j + b_i) in the 2^64
    * ring — one pass over the shingle hashes, all minima maintained
    * simultaneously. Empty shingle sets yield Long.MaxValue slots. */
  def signature(shingles: Array[Long], as: Array[Long], bs: Array[Long]): Array[Long] = {
    val numHashes = as.length
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val h = shingles(j)
      var i = 0
      while (i < numHashes) {
        val v = as(i) * h + bs(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** LSH band hashes: fold each r-slot row of the signature into one
    * 64-bit bucket key, salted by band index. `bands` must divide the
    * signature length: a remainder would silently drop trailing slots
    * from every band, and bands > length gives r=0 — every band hash
    * degenerates to the constant mix64(b) and candidate generation
    * becomes the full O(n²) cross product. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    require(bands >= 1 && sig.length % bands == 0,
      s"bands ($bands) must be >= 1 and divide the signature length (${sig.length})")
    val r = sig.length / bands
    val bh = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(b.toLong)
      var i = b * r
      val end = (b + 1) * r
      while (i < end) { h = mix64(h ^ sig(i)); i += 1 }
      bh(b) = h
      b += 1
    }
    bh
  }

  /** Full sketch for one document. */
  def sketch(text: String, k: Int, bands: Int,
             as: Array[Long], bs: Array[Long]): MinHashSketch = {
    val sh = shingleHashes(text, k)
    val sig = signature(sh, as, bs)
    MinHashSketch(sig, bandHashes(sig, bands), sh)
  }

  /** Distinct word n-grams of the normalized text, one JVM pass —
    * string-identical to `Text.wordNgrams` (and the DuckDB oracle) on
    * ASCII input, ~50× cheaper than the interpreted HOF evaluation.
    * Texts with fewer than n words yield the whole normalized string. */
  def wordNgrams(text: String, n: Int): Array[String] = {
    val norm = normalize(text)
    val ws = norm.split(' ')
    if (ws.length < n) return Array(norm)
    val seen = new java.util.LinkedHashSet[String]((ws.length - n + 1) * 2)
    var i = 0
    while (i + n <= ws.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](0))
  }

  /** Deterministic ±1 hyperplane component matrix for sign-LSH:
    * tables × planes × dim, from the seeded avalanche mix. Signatures
    * pack one bit per plane into a Long, so planes is capped at 64 —
    * `1L << p` silently wraps past that and planes ≥ 65 would alias
    * earlier bits (every bucket collides with its alias partner). */
  def signMatrix(tables: Int, planes: Int, dim: Int,
                 seed: Long = 42L): Array[Array[Array[Float]]] = {
    require(tables >= 1 && planes >= 1 && planes <= 64 && dim >= 1,
      s"signMatrix needs tables >= 1, 1 <= planes <= 64, dim >= 1; " +
        s"got tables=$tables planes=$planes dim=$dim")
    Array.tabulate(tables, planes, dim) { (t, p, d) =>
      if ((mix64(seed + t * 7919L * 1000003L + p * 100003L + d) & 1L) == 0L) 1.0f else -1.0f
    }
  }

  /** Sign-LSH signatures of one vector under every table of the matrix —
    * one JVM pass (the HOF form evaluates planes × dim interpreted
    * lambdas per row per table). NULL vectors yield null (the row goes
    * unbucketed, like the Column form it replaces); a dimension mismatch
    * with the matrix is an error, not a silent truncation. */
  def hyperplaneSignatures(vec: scala.collection.Seq[Float],
                           m: Array[Array[Array[Float]]]): Array[Long] = {
    if (vec == null) return null
    val out = new Array[Long](m.length)
    var t = 0
    while (t < m.length) {
      val table = m(t)
      var sig = 0L
      var p = 0
      while (p < table.length) {
        val plane = table(p)
        require(vec.length == plane.length,
          s"sign-LSH dim mismatch: vector has ${vec.length} dims, matrix ${plane.length}")
        var s = 0.0
        var d = 0
        while (d < plane.length) { s += plane(d) * vec(d); d += 1 }
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  /** One-pass IVF cell probe: cosine of `vec` against every centroid
    * row, returning the `nprobe` best cell ids ordered descending by
    * (cosine, cell id) — exactly Spark's `greatest(struct(sim, cell))` /
    * `array_sort` tie order, including NaN-greatest double semantics.
    * The accumulation is float-multiply-first then double-sum, matching
    * [[graft.expressions.FloatVectorCosine]] bit for bit, so cell
    * assignments are identical to the per-centroid codegen'd chain this
    * replaces. The chain form built `nlist` literal cosine calls into
    * the plan — a 4096-branch expression tree at realistic `nlist`,
    * evaluated once for the best cell and again for the probe list; one
    * kernel call computes all similarities in a single pass per row.
    * NULL vectors yield null (the row goes unprobed); a dimension
    * mismatch with the centroid matrix is an error, not a silent
    * truncation. A NULL ELEMENT inside a vector unboxes to 0.0f here
    * (Scala primitive Seq), where the expression chain nulled the
    * similarity — embeddings with null components are a data error;
    * filter them upstream rather than relying on either behavior. */
  def nearestCells(vec: scala.collection.Seq[Float],
                   centroids: Array[Array[Float]], nprobe: Int): Array[Int] = {
    if (vec == null) return null
    val nlist = centroids.length
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      val cen = centroids(c)
      require(vec.length == cen.length,
        s"IVF dim mismatch: vector has ${vec.length} dims, centroid ${cen.length}")
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < cen.length) {
        val xi = vec(d); val yi = cen(d)
        dot += (xi * yi).toDouble
        na += (xi * xi).toDouble
        nb += (yi * yi).toDouble
        d += 1
      }
      sims(c) = dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var j = 0
    while (j < k) {
      var best = -1
      var i = 0
      while (i < nlist) {
        // Double.compare orders NaN above all values, like Spark
        if (!taken(i) && (best < 0 || java.lang.Double.compare(sims(i), sims(best)) >= 0))
          best = i
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    out
  }

  /** Winnowing document fingerprints (the MOSS scheme, Schleimer et al.
    * SIGMOD 2003): hash every character k-gram of the normalized text,
    * then slide a window of `w` consecutive k-gram hashes and record
    * each window's minimum (rightmost occurrence on ties), deduplicating
    * consecutive picks. Guarantees: any shared substring of length
    * ≥ w + k − 1 yields at least one shared fingerprint, and an edit
    * only perturbs fingerprints within w + k − 1 characters of it (the
    * locality property — whole-doc digests lose both). One JVM pass;
    * k-gram hashes reuse [[shingleHashes]]' FNV-1a window hashing.
    * Texts shorter than k fingerprint as their single whole-string
    * shingle hash. */
  def winnow(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")
    val norm = normalize(text)
    if (norm.length < k) return Array(hashChars(norm, 0, norm.length))
    val n = norm.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hashChars(norm, i, k); i += 1 }
    if (n <= w) return Array(hs.min)
    val out = new Array[Long](n - w + 1)
    var m = 0
    var lastPick = -1
    var start = 0
    while (start <= n - w) {
      // rightmost minimum of hs[start, start+w)
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hs(j) <= hs(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastPick) {
        out(m) = hs(minIdx); m += 1; lastPick = minIdx
      }
      start += 1
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** Share of the most frequent word n-gram among all n-gram
    * occurrences of the normalized text (duplicates counted — the
    * repetition signal, NOT the deduplicated Jaccard form). One JVM
    * pass; the doc-local count map is bounded by the doc's own n-gram
    * count. Returns null when the text has fewer than `n` words (no
    * n-gram exists), so callers can drop those docs explicitly. */
  def topNgramShare(text: String, n: Int): java.lang.Double = {
    val norm = normalize(text)
    if (norm.isEmpty) return null
    val ws = norm.split(" ")
    if (ws.length < n) return null
    val total = ws.length - n + 1
    val counts = new java.util.HashMap[String, Int](total * 2)
    var max = 0
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / total
  }

  /** Integer permille (`(1000*num) div den`, 0 when `den`=0) — the
    * cross-engine-exact form every repetition fraction ships in. */
  @inline private def pmill(num: Long, den: Long): Long =
    if (den == 0L) 0L else 1000L * num / den

  /** Gopher repetition statistics (Rae et al. 2021 Table A1, the
    * public Gopher/Dolma repetition-rule recipe) for one document, as
    * 13 exact integer PERMILLE values — fractions of integer counts
    * emitted as `(1000*num) div den`, so the numbers are identical on
    * any engine and never ride a float ulp:
    *
    *   [0] dup_para_pm       duplicate paragraph occurrences (beyond
    *                         first, exact trimmed string) / paragraphs
    *   [1] dup_line_pm       same over lines
    *   [2] dup_para_char_pm  chars of those duplicate occurrences /
    *                         total paragraph chars
    *   [3] dup_line_char_pm  same over lines
    *   [4..6] top2/3/4_pm    chars covered by occurrences of the MOST
    *                         FREQUENT word n-gram (n=2,3,4; count ≥ 2,
    *                         ties to the lexicographically smallest
    *                         gram; overlapping occurrences count each
    *                         position once) / total word chars
    *   [7..12] dup5..10_pm   chars covered by ALL word n-grams that
    *                         occur ≥ 2 times (n=5..10; positions
    *                         counted once — the paper's "taking care
    *                         not to count characters that occur in
    *                         overlapping n-grams more than once") /
    *                         total word chars
    *
    * Paragraphs split on `\n\n`, lines on `\n`, both trimmed with
    * blanks dropped; words are the [[normalize]] tokens (lowercase,
    * punctuation stripped), so n-grams cross line boundaries the way
    * the paper's word-sequence statistics do. Word chars exclude the
    * separating spaces. One JVM pass per n — the doc-local maps are
    * bounded by the doc's own gram count; nothing leaves the row. */
  def repetitionStats(text: String): Array[Long] = {
    if (text == null) return null
    def dupHalf(elems: Array[String]): (Long, Long) = {
      val seen = new java.util.HashSet[String]()
      var d = 0L; var dc = 0L; var tc = 0L
      var i = 0
      while (i < elems.length) {
        val e = elems(i)
        tc += e.length
        if (!seen.add(e)) { d += 1; dc += e.length }
        i += 1
      }
      (pmill(d, elems.length), pmill(dc, tc))
    }
    val lines = text.split("\n", -1).map(_.trim).filter(_.nonEmpty)
    val paras = text.split("\n\n", -1).map(_.trim).filter(_.nonEmpty)
    val (dlPm, dlcPm) = dupHalf(lines)
    val (dpPm, dpcPm) = dupHalf(paras)
    val norm = normalize(text)
    val ws: Array[String] = if (norm.isEmpty) Array.empty else norm.split(" ")
    var wchars = 0L
    locally { var i = 0; while (i < ws.length) { wchars += ws(i).length; i += 1 } }
    val out = new Array[Long](13)
    out(0) = dpPm; out(1) = dlPm; out(2) = dpcPm; out(3) = dlcPm
    val cover = new Array[Boolean](ws.length)
    val sb = new java.lang.StringBuilder
    def gramAt(i: Int, n: Int): String = {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ws(i + j))
        j += 1
      }
      sb.toString
    }
    def coveredChars(): Long = {
      var s = 0L; var i = 0
      while (i < ws.length) { if (cover(i)) s += ws(i).length; i += 1 }
      s
    }
    var n = 2
    while (n <= 10) {
      val total = ws.length - n + 1
      val slot = n + 2 // top2->4, top3->5, top4->6, dup5->7 .. dup10->12
      if (total >= 2) {
        val counts = new java.util.HashMap[String, Int](total * 2)
        var i = 0
        while (i < total) { counts.merge(gramAt(i, n), 1, (a, b) => a + b); i += 1 }
        java.util.Arrays.fill(cover, false)
        if (n <= 4) {
          // most frequent gram (count ≥ 2), lexicographically smallest on ties
          var best: String = null; var bc = 1
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > bc || (e.getValue == bc && best != null &&
                e.getKey.compareTo(best) < 0)) { bc = e.getValue; best = e.getKey }
          }
          if (best != null) {
            var i2 = 0
            while (i2 < total) {
              if (gramAt(i2, n) == best) {
                var j = 0; while (j < n) { cover(i2 + j) = true; j += 1 }
              }
              i2 += 1
            }
          }
        } else {
          var i2 = 0
          while (i2 < total) {
            if (counts.get(gramAt(i2, n)) >= 2) {
              var j = 0; while (j < n) { cover(i2 + j) = true; j += 1 }
            }
            i2 += 1
          }
        }
        out(slot) = pmill(coveredChars(), wchars)
      }
      n += 1
    }
    out
  }

  /** True for exactly the Java-regex `\s` set — the tokenizer split of
    * [[graft.functions.Text.tokens]] (NOT `Character.isWhitespace`,
    * which also matches U+2028/U+1680 etc. and would diverge). */
  @inline private[operators] def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** DISTINCT mix64-FNV hashes of the lowercase whitespace tokens of
    * `text` — the [[simhash]] token kernel with the per-token hash
    * exposed (one pass, same `\s` set and case fold), so consumers
    * ([[Classifier]] hashed features, oracle cross-checks) share the
    * exact hash the SimHash oracle already restates in SQL. */
  def tokenHashes(text: String): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = Array.newBuilder[Long]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isRegexWs(text.charAt(i))) i += 1
      val start = i
      var h = 0xcbf29ce484222325L
      while (i < n && !isRegexWs(text.charAt(i))) {
        h ^= Character.toLowerCase(text.charAt(i)).toLong
        h *= 0x100000001b3L
        i += 1
      }
      if (i > start) {
        val th = mix64(h)
        if (seen.add(th)) out += th
      }
    }
    out.result()
  }

  /** 64-bit SimHash over lowercase whitespace tokens: per-bit majority
    * vote of token hashes, computed in one pass (each token hashed once,
    * all 64 bit-counters updated from that hash). Matches the
    * tokenization of [[graft.functions.Text.tokens]] — the same `\s`
    * whitespace set, so Unicode spaces split identically in both forms. */
  def simhash(text: String): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isRegexWs(text.charAt(i))) i += 1
      val start = i
      var h = 0xcbf29ce484222325L
      while (i < n && !isRegexWs(text.charAt(i))) {
        h ^= Character.toLowerCase(text.charAt(i)).toLong
        h *= 0x100000001b3L
        i += 1
      }
      if (i > start) {
        val th = mix64(h)
        var b = 0
        while (b < 64) {
          if (((th >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
