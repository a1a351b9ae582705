package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels for training-data pipelines: tokenization, quality
  * scoring, language id, fingerprinting, MinHash/SimHash signatures. All
  * static so `StaticInvoke` keeps them inside whole-stage codegen.
  *
  * Everything is deterministic: hashes are splitmix64-based with explicit
  * seeds, so results are reproducible across the cluster and across runs. */
object TextOps {

  import GeoOps.splitmix64

  // ------------------------------------------------------------- tokens

  /** Single-space token count: spaces+1 — the SQL-portable definition used
    * by the DuckDB oracle (len(t)-len(replace(t,' ',''))+1). */
  def tokenCountSimple(s: UTF8String): Int = {
    val str = s.toString
    var n = 1; var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') n += 1; i += 1 }
    n
  }

  /** Whitespace-run token count (empty string -> 0). */
  def tokenCountWs(s: UTF8String): Int = {
    val str = s.toString
    var n = 0; var i = 0; var inTok = false
    while (i < str.length) {
      val ws = Character.isWhitespace(str.charAt(i))
      if (!ws && !inTok) n += 1
      inTok = !ws
      i += 1
    }
    n
  }

  /** BPE-ish subword count: letter runs, digit runs, punctuation runs each
    * count once per ~4 chars (GPT2-style pre-tokenizer approximation). */
  def tokenCountBpe(s: UTF8String): Int = {
    val str = s.toString
    var n = 0; var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (Character.isWhitespace(c)) { i += 1 }
      else {
        val letter = Character.isLetter(c)
        val digit = Character.isDigit(c)
        var j = i
        while (j < str.length && {
          val cj = str.charAt(j)
          if (letter) Character.isLetter(cj)
          else if (digit) Character.isDigit(cj)
          else !Character.isLetterOrDigit(cj) && !Character.isWhitespace(cj)
        }) j += 1
        val run = j - i
        n += (if (letter) (run + 3) / 4 else run)
        i = j
      }
    }
    n
  }

  // ------------------------------------------------------------- quality

  /** Quality stats struct: (n_chars, n_words, avg_word_len, space_ratio,
    * digit_ratio, punct_ratio, upper_ratio, stopword_ratio). */
  def qualityStats(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    var spaces = 0; var digits = 0; var punct = 0; var upper = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == ' ') spaces += 1
      else if (Character.isDigit(c)) digits += 1
      else if (Character.isUpperCase(c)) upper += 1
      else if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) punct += 1
      i += 1
    }
    val words = tokenCountWs(s)
    var stop = 0
    var w = 0
    val it = str.split(' ')
    while (w < it.length) {
      if (Stopwords.contains(it(w))) stop += 1
      w += 1
    }
    val nd = math.max(1, n).toDouble
    val wd = math.max(1, words).toDouble
    new GenericInternalRow(Array[Any](
      n, words, (n - spaces) / wd, spaces / nd, digits / nd, punct / nd,
      upper / nd, stop / wd))
  }

  private val Stopwords: Set[String] = Set(
    "a", "an", "the", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Composite quality score in [0,1]: length sweet spot, word shape,
    * stopword presence — a deterministic heuristic gate. */
  def qualityScore(s: UTF8String): Double = {
    val st = qualityStats(s)
    val nChars = st.getInt(0)
    val avgWord = st.getDouble(2)
    val stopRatio = st.getDouble(7)
    val lenScore = math.min(1.0, nChars / 200.0) * (if (nChars > 20000) 0.5 else 1.0)
    val wordScore = if (avgWord >= 2 && avgWord <= 12) 1.0 else 0.5
    val stopScore = math.min(1.0, stopRatio * 4)
    (lenScore + wordScore + stopScore) / 3.0
  }

  // ------------------------------------------------------------- lang id

  private val LangMarkers: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "pas", "pour", "que", "dans"),
    "es" -> Set("el", "la", "los", "las", "es", "una", "no", "para", "que", "con"),
    "it" -> Set("il", "la", "che", "e", "di", "non", "una", "per", "sono", "con"))

  /** N-gram/stopword heuristic language id; CJK by codepoint range; returns
    * the best marker-hit language or "und". */
  def langId(s: UTF8String): UTF8String = {
    val str = s.toString
    var cjk = 0; var total = 0
    var i = 0
    while (i < str.length && i < 2000) {
      val c = str.charAt(i)
      if (Character.isLetter(c)) {
        total += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
          b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL)
          cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 2 > total) return UTF8String.fromString("zh")
    val words = str.toLowerCase.split("[^\\p{L}]+")
    var best = "und"; var bestHits = 0
    LangMarkers.foreach { case (lang, markers) =>
      var hits = 0
      var w = 0
      while (w < words.length && w < 500) {
        if (markers.contains(words(w))) hits += 1
        w += 1
      }
      if (hits > bestHits) { best = lang; bestHits = hits }
    }
    UTF8String.fromString(best)
  }

  // ------------------------------------------------------------- hashing

  private def hashToken(s: String, from: Int, until: Int, seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) {
      h = splitmix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    h
  }

  /** Word-level shingles hashed to longs. */
  private def wordShingles(str: String, n: Int): Array[Long] = {
    val words = str.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) {
      if (words.isEmpty) return Array.empty
      return Array(hashToken(words.mkString(" "), 0, words.mkString(" ").length, 7L))
    }
    val out = new Array[Long](words.length - n + 1)
    var i = 0
    while (i + n <= words.length) {
      var h = 7L
      var j = i
      while (j < i + n) {
        val w = words(j)
        h = splitmix64(h ^ hashToken(w, 0, w.length, 13L))
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash signature: k minimums over seeded rehashes of n-word shingles
    * (the standard shingle->minhash construction for near-dup detection). */
  def minHash(s: UTF8String, n: Int, k: Int): ArrayData = {
    val shingles = wordShingles(s.toString, n)
    val sig = new Array[Long](k)
    var p = 0
    while (p < k) {
      var min = Long.MaxValue
      var i = 0
      while (i < shingles.length) {
        val h = splitmix64(shingles(i) ^ (0x5bd1e995L * (p + 1)))
        if (h < min) min = h
        i += 1
      }
      sig(p) = min
      p += 1
    }
    GeoStruct.longArray(sig)
  }

  /** LSH band keys from a minhash signature: hash each band of `rows`
    * signature entries; near-dups collide in >=1 band. */
  def lshBands(sig: ArrayData, rows: Int): ArrayData = {
    val k = sig.numElements()
    val bands = k / rows
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x2545f4914f6cdd1dL ^ b
      var r = 0
      while (r < rows) {
        h = splitmix64(h ^ sig.getLong(b * rows + r))
        r += 1
      }
      out(b) = (b.toLong << 56) ^ (h >>> 8)
      b += 1
    }
    GeoStruct.longArray(out)
  }

  /** 64-bit SimHash over word unigrams. */
  def simHash(s: UTF8String): Long = {
    val words = s.toString.split("\\s+")
    val acc = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val h = hashToken(words(i), 0, words(i).length, 31L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---------------------------------------------------------- scrubbing

  // patterns chosen to mean the same thing in java.util.regex and RE2
  // (DuckDB), so the scrub is oracle-checkable: no backtracking features,
  // no \S-class differences
  private val UrlRe = java.util.regex.Pattern.compile("https?://[^ ]+")
  private val EmailRe =
    java.util.regex.Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")

  /** URL redaction (training-corpus PII/link scrub). */
  def scrubUrls(s: UTF8String): UTF8String =
    UTF8String.fromString(UrlRe.matcher(s.toString).replaceAll("<URL>"))

  /** Email redaction. */
  def scrubEmails(s: UTF8String): UTF8String =
    UTF8String.fromString(EmailRe.matcher(s.toString).replaceAll("<EMAIL>"))

  /** True iff s[0, end) is an RFC 3986 scheme: a letter then
    * letters/digits/'+'/'-'/'.'. Rejecting anything else keeps free text
    * that merely EMBEDS a URL ("read more at https://…") out of the
    * canonical-key space — such strings return null, not a mangled key. */
  private def validScheme(s: String, end: Int): Boolean = {
    if (end <= 0) return false
    if (!Character.isLetter(s.charAt(0))) return false
    var i = 1
    while (i < end) {
      val c = s.charAt(i)
      if (!Character.isLetterOrDigit(c) && c != '+' && c != '-' && c != '.')
        return false
      i += 1
    }
    true
  }

  /** Host of a URL, lowercased: the authority after `scheme://`, userinfo
    * (through the LAST '@' in the authority) and port stripped. Null when
    * there is no `://`, the scheme is not RFC 3986-shaped, or the host is
    * empty — the host-level grouping key for domain mixing / per-site
    * dedup (q146). Pure string surgery with pinned semantics (no
    * java.net.URI — its parsing is lenient and version-dependent). */
  def urlHost(url: UTF8String): UTF8String = {
    val s = url.toString
    val sep = s.indexOf("://")
    if (sep <= 0 || !validScheme(s, sep)) return null
    var end = sep + 3
    while (end < s.length && "/?#".indexOf(s.charAt(end)) < 0) end += 1
    var auth = s.substring(sep + 3, end)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    val colon = auth.indexOf(':')
    val host = if (colon >= 0) auth.substring(0, colon) else auth
    if (host.isEmpty) null
    else UTF8String.fromString(host.toLowerCase(java.util.Locale.ROOT))
  }

  /** URL canonicalization with PINNED semantics (q146): lowercase the
    * scheme and host (userinfo, port, path, query preserved verbatim),
    * strip the fragment, strip the default port (`:80` for http, `:443`
    * for https — after scheme lowering), and strip ONE trailing '/'
    * (after fragment removal) — but ONLY when the URL carries no query: a
    * final '/' after '?' is part of the query VALUE, not a path
    * separator, and stripping it would collapse distinct URLs. Null when
    * there is no `://`, the scheme is not RFC 3986-shaped (free text that
    * merely embeds a URL is NOT a URL), or the host is empty. The
    * canonical key for exact URL dedup across crawl variants. */
  def urlNormalize(url: UTF8String): UTF8String = {
    var s = url.toString
    val sep = s.indexOf("://")
    if (sep <= 0 || !validScheme(s, sep)) return null
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    if (sep + 3 > s.length) return null
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    var authEnd = sep + 3
    while (authEnd < s.length && "/?#".indexOf(s.charAt(authEnd)) < 0) authEnd += 1
    val auth = s.substring(sep + 3, authEnd)
    val path = s.substring(authEnd)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val colon = hostPort.indexOf(':')
    val host = (if (colon >= 0) hostPort.substring(0, colon) else hostPort)
      .toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return null
    var port = if (colon >= 0) hostPort.substring(colon) else ""
    if ((scheme == "http" && port == ":80") ||
        (scheme == "https" && port == ":443")) port = ""
    var out = scheme + "://" + userinfo + host + port + path
    if (out.endsWith("/") && path.indexOf('?') < 0)
      out = out.substring(0, out.length - 1)
    UTF8String.fromString(out)
  }

  /** Duplicate word-n-gram fraction (the Gopher-style repetition quality
    * filter): 1 - distinct/total over the text's n-gram multiset; 0 for
    * empty/short texts (single-shingle fallback has one distinct gram). */
  def repetitionRatio(s: UTF8String, n: Int): Double = {
    val grams = wordShingles(s.toString, n)
    if (grams.isEmpty) return 0.0
    val distinct = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < grams.length) { distinct.add(grams(i)); i += 1 }
    1.0 - distinct.size.toDouble / grams.length
  }

  /** Exact n-word-gram Jaccard similarity of two texts. */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = wordShingles(a.toString, n).toSet
    val sb = wordShingles(b.toString, n).toSet
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Winnowing-style document fingerprint: min rolling k-gram hash per
    * window, xor-folded to one long. */
  def fingerprint(s: UTF8String, k: Int, window: Int): Long = {
    val str = s.toString
    if (str.length < k) return hashToken(str, 0, str.length, 17L)
    val nGrams = str.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) { hashes(i) = hashToken(str, i, i + k, 17L); i += 1 }
    var out = 0L
    var w = 0
    val effWindow = math.max(1, window)
    while (w < nGrams) {
      var min = Long.MaxValue
      var j = w
      val end = math.min(nGrams, w + effWindow)
      while (j < end) { if (hashes(j) < min) min = hashes(j); j += 1 }
      out ^= splitmix64(min)
      w += effWindow
    }
    out
  }
}
