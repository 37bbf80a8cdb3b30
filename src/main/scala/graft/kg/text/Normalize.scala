package graft.kg.text

import java.text.Normalizer
import java.util.Locale
import scala.collection.mutable

/** Pure text normalization utilities.
  *
  * Semantics re-expressed from the reference's deterministic text layer
  * (Legal-Knowledge-Graphs `extractor.py:749-846` — whitespace-collapse with
  * index mapping, quote→span alignment, Turkish-aware case folding,
  * tokenization and keyword sets). Everything here is pure, deterministic and
  * serializable so it can run inside Spark tasks without driver state.
  */
object Normalize {

  /** Collapse whitespace runs to a single space, returning the normalized
    * string and a map from normalized index → original index.
    * Mirrors `_normalize_with_mapping` (extractor.py:749-770).
    */
  def normalizeWithMapping(raw: String): (String, Array[Int]) = {
    val sb = new java.lang.StringBuilder(raw.length)
    val map = new mutable.ArrayBuilder.ofInt
    map.sizeHint(raw.length)
    var inWs = false
    var i = 0
    while (i < raw.length) {
      val ch = raw.charAt(i)
      if (Character.isWhitespace(ch)) {
        if (!inWs) { sb.append(' '); map += i; inWs = true }
      } else {
        sb.append(ch); map += i; inWs = false
      }
      i += 1
    }
    (sb.toString, map.result())
  }

  private val TrLowerFrom = "İIŞÇÖÜĞ"
  private val TrLowerTo   = "iışçöüğ"

  /** Turkish-aware lowercase: İ→i, I→ı plus standard lowering
    * (extractor.py:776-781). */
  def turkishLower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val j = TrLowerFrom.indexOf(c.toInt)
      sb.append(if (j >= 0) TrLowerTo.charAt(j) else c)
      i += 1
    }
    sb.toString.toLowerCase(Locale.ROOT)
  }

  /** NFC normalize + Turkish lower + collapse whitespace (extractor.py:784-789). */
  def turkishNormalize(s: String): String = {
    val nfc = Normalizer.normalize(s, Normalizer.Form.NFC)
    turkishLower(nfc).replaceAll("\\s+", " ").trim
  }

  /** True iff every char is < 0x80 — the fast-path guard that lets the
    * scanners below skip the full-string `toLowerCase` copy (ASCII lowering
    * is context-free, so per-char lowering is bit-identical; non-ASCII text
    * keeps the locale-correct full-string path). */
  private def isAscii(text: String): Boolean = {
    var i = 0
    val n = text.length
    while (i < n) { if (text.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  @inline private def asciiWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Lowered [start, end) slice of an all-ASCII string, copying once. */
  private def lowerSlice(text: String, start: Int, end: Int): String = {
    val out = new Array[Char](end - start)
    var i = start
    while (i < end) {
      val c = text.charAt(i)
      out(i - start) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(out)
  }

  /** Per-thread token intern. Tokens are drawn from a small recurring
    * vocabulary, so the scanners return ONE canonical String per distinct
    * token instead of a fresh substring per occurrence — token Strings were
    * the extractor's top allocation site, and the canonical copies carry a
    * cached hashCode for all the keyword-set operations downstream.
    * Open-addressing over a power-of-two table keyed by the LOWERED char
    * region; the table doubles until `MaxCap`, after which new tokens fall
    * back to plain allocation (pathological vocabularies stay bounded). */
  private final class TokenIntern {
    private var cap = 1 << 12
    private var mask = cap - 1
    private var keys = new Array[String](cap)
    private var size = 0
    private val MaxCap = 1 << 17

    // matches String.hashCode over the lowered region
    private def hash(text: String, start: Int, end: Int, preLowered: Boolean): Int = {
      var h = 0
      var i = start
      while (i < end) {
        val c0 = text.charAt(i)
        val c = if (!preLowered && c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        h = h * 31 + c
        i += 1
      }
      h
    }

    private def regionEq(k: String, text: String, start: Int, end: Int, preLowered: Boolean): Boolean = {
      if (k.length != end - start) return false
      var i = 0
      val n = k.length
      while (i < n) {
        val c0 = text.charAt(start + i)
        val c = if (!preLowered && c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if (c != k.charAt(i)) return false
        i += 1
      }
      true
    }

    private def grow(): Unit = {
      val old = keys
      cap <<= 1
      mask = cap - 1
      keys = new Array[String](cap)
      var i = 0
      while (i < old.length) {
        val k = old(i)
        if (k != null) {
          var slot = k.hashCode & mask
          while (keys(slot) != null) slot = (slot + 1) & mask
          keys(slot) = k
        }
        i += 1
      }
    }

    /** Canonical lowered String for text[start, end). `preLowered` = the
      * region is already lowercase (legacy non-ASCII path). */
    def get(text: String, start: Int, end: Int, preLowered: Boolean): String = {
      val h = hash(text, start, end, preLowered)
      var slot = h & mask
      var k = keys(slot)
      while (k != null) {
        if (k.hashCode == h && regionEq(k, text, start, end, preLowered)) return k
        slot = (slot + 1) & mask
        k = keys(slot)
      }
      val fresh =
        if (preLowered) text.substring(start, end) else lowerSlice(text, start, end)
      if (size < (cap - (cap >> 2))) { // load factor <= 0.75
        keys(slot) = fresh
        size += 1
      } else if (cap < MaxCap) {
        grow()
        var s2 = h & mask
        while (keys(s2) != null) s2 = (s2 + 1) & mask
        keys(s2) = fresh
        size += 1
      } // else: table full — hand out the fresh copy uninterned
      fresh
    }
  }

  private val Interned = ThreadLocal.withInitial[TokenIntern](() => new TokenIntern)

  /** Unicode-aware word tokenization over case-folded text
    * (extractor.py:1110-1116). Hand-rolled scanner equivalent to
    * `(?U)\\w+` on the lowered text — tokenization is the engine's hottest
    * scalar (scoring, clustering, repair, autofill all build keyword sets),
    * and the regex version allocated a Match per token. ASCII input (the
    * overwhelming case) skips the full-string lowercase copy. */
  def tokenize(text: String): List[String] = {
    if (text == null || text.isEmpty) return Nil
    val tin = Interned.get()
    val out = scala.collection.mutable.ListBuffer.empty[String]
    if (isAscii(text)) {
      var i = 0
      val n = text.length
      while (i < n) {
        if (asciiWordChar(text.charAt(i))) {
          val start = i
          while (i < n && asciiWordChar(text.charAt(i))) i += 1
          out += tin.get(text, start, i, preLowered = false)
        } else i += 1
      }
    } else {
      val low = text.toLowerCase(Locale.ROOT)
      var i = 0
      val n = low.length
      while (i < n) {
        val c = low.charAt(i)
        if (Character.isLetterOrDigit(c) || c == '_') {
          val start = i
          while (i < n && {
            val ch = low.charAt(i); Character.isLetterOrDigit(ch) || ch == '_'
          }) i += 1
          out += tin.get(low, start, i, preLowered = true)
        } else i += 1
      }
    }
    out.toList
  }

  /** |a ∩ b| without allocating the intersection, counting at most `cap`
    * hits — the clustering/autofill/repair scorers only ever compare or cap
    * the overlap size, and `intersect` allocated a set per scored pair in
    * the extraction inner loop. Iterates the smaller side. */
  def overlap(a: Set[String], b: Set[String], cap: Int = Int.MaxValue): Int = {
    val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
    var n = 0
    val it = small.iterator
    while (n < cap && it.hasNext) if (large.contains(it.next())) n += 1
    n
  }

  /** EN + TR + FR function-word stopword set (extractor.py:1069-1083). */
  val Stopwords: Set[String] = Set(
    "the", "a", "an", "and", "or", "to", "of", "in", "on", "for", "by", "with", "without",
    "is", "was", "were", "are", "be", "been", "being", "as", "at", "from", "that", "this",
    "it", "its", "their", "his", "her", "they", "them", "he", "she", "we", "our", "you",
    "not", "no", "yes", "shall", "may", "must", "can", "could", "would", "should",
    "bir", "ile", "için", "icin", "olan", "olarak", "dair", "daha", "sonra", "önce",
    "kadar", "gibi", "tarafından", "tarafindan", "göre", "gore", "ise", "veya",
    "ancak", "fakat", "ama", "ayrıca", "ayrica", "dolayı", "dolayi", "ilgili",
    "üzerine", "uzerine", "hakkında", "hakkinda", "karşı", "karsi", "bakımından",
    "bakimindan", "suretiyle", "niteliğinde", "niteligi", "kapsamında", "kapsaminda",
    "dans", "pour", "avec", "sur", "par", "une", "des", "les", "aux", "est",
    "que", "qui", "sont", "été", "pas", "ont", "cette", "ces", "mais", "aussi"
  )

  /** Tokens of length ≥ 4 minus stopwords (extractor.py:1119-1121).
    * Single-pass direct set build: no intermediate token list, no cons
    * cells, and sub-minimum tokens are skipped BEFORE the substring copy
    * (this is the engine's hottest set constructor). */
  def keywordSet(text: String): Set[String] = tokenSet(text, 4, Stopwords)

  /** Tokens of length ≥ `minLen` minus `stops`, built in one pass. */
  def tokenSet(text: String, minLen: Int, stops: Set[String] = Set.empty): Set[String] = {
    if (text == null || text.isEmpty) return Set.empty
    val tin = Interned.get()
    val out = Set.newBuilder[String]
    if (isAscii(text)) {
      var i = 0
      val n = text.length
      while (i < n) {
        if (asciiWordChar(text.charAt(i))) {
          val start = i
          while (i < n && asciiWordChar(text.charAt(i))) i += 1
          if (i - start >= minLen) {
            val t = tin.get(text, start, i, preLowered = false)
            if (!stops.contains(t)) out += t
          }
        } else i += 1
      }
    } else {
      val low = text.toLowerCase(Locale.ROOT)
      var i = 0
      val n = low.length
      while (i < n) {
        val c = low.charAt(i)
        if (Character.isLetterOrDigit(c) || c == '_') {
          val start = i
          while (i < n && {
            val ch = low.charAt(i); Character.isLetterOrDigit(ch) || ch == '_'
          }) i += 1
          if (i - start >= minLen) {
            val t = tin.get(low, start, i, preLowered = true)
            if (!stops.contains(t)) out += t
          }
        } else i += 1
      }
    }
    out.result()
  }

  /** ASCII word tokens `[a-zA-Z0-9_]+` on the lowered text — the repair
    * engine's tokenizer (repair_orphans.py:152-154), which is narrower than
    * the extractor's unicode `\w+`. Note the lowered-text semantics: chars
    * that LOWER to ASCII word chars (e.g. 'İ' in some mappings) count, so
    * the fast path requires an all-ASCII input. */
  def asciiTokenize(text: String): List[String] = {
    if (text == null || text.isEmpty) return Nil
    val tin = Interned.get()
    val out = scala.collection.mutable.ListBuffer.empty[String]
    if (isAscii(text)) {
      var i = 0
      val n = text.length
      while (i < n) {
        if (asciiWordChar(text.charAt(i))) {
          val start = i
          while (i < n && asciiWordChar(text.charAt(i))) i += 1
          out += tin.get(text, start, i, preLowered = false)
        } else i += 1
      }
    } else {
      val low = text.toLowerCase(Locale.ROOT)
      var i = 0
      val n = low.length
      def wordCh(c: Char): Boolean =
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      while (i < n) {
        if (wordCh(low.charAt(i))) {
          val start = i
          while (i < n && wordCh(low.charAt(i))) i += 1
          out += tin.get(low, start, i, preLowered = true)
        } else i += 1
      }
    }
    out.toList
  }

  /** ASCII tokens ≥ `minLen` minus `stops`, single-pass set build (the
    * repair engine's keyword_set shape, repair_orphans.py:157-160). */
  def asciiKeywordSet(text: String, minLen: Int, stops: Set[String]): Set[String] = {
    if (text == null || text.isEmpty) return Set.empty
    val tin = Interned.get()
    val out = Set.newBuilder[String]
    if (isAscii(text)) {
      var i = 0
      val n = text.length
      while (i < n) {
        if (asciiWordChar(text.charAt(i))) {
          val start = i
          while (i < n && asciiWordChar(text.charAt(i))) i += 1
          if (i - start >= minLen) {
            val t = tin.get(text, start, i, preLowered = false)
            if (!stops.contains(t)) out += t
          }
        } else i += 1
      }
      out.result()
    } else {
      asciiTokenize(text).iterator
        .filter(t => t.length >= minLen && !stops.contains(t)).toSet
    }
  }

  /** Case-insensitive (optionally Turkish-folded) substring test (extractor.py:1124-1129). */
  def containsPhrase(haystack: String, phrase: String, turkish: Boolean = false): Boolean = {
    if (haystack == null || haystack.isEmpty || phrase == null || phrase.isEmpty) false
    else if (turkish) turkishLower(haystack).contains(turkishLower(phrase))
    else haystack.toLowerCase(Locale.ROOT).contains(phrase.toLowerCase(Locale.ROOT))
  }

  private val NegativeCues = List("without ", "no ", "not ", "denied", "refused", "failed to")

  /** Negation-cue heuristic for requirement satisfaction (extractor.py:1306-1309). */
  def looksNegative(text: String): Boolean = {
    val t = if (text == null) "" else text.toLowerCase(Locale.ROOT)
    NegativeCues.exists(t.contains)
  }

  /** Find (start, end) offsets of a quoted snippet inside a document after
    * whitespace normalization; exact then case-insensitive
    * (extractor.py:792-846 `align_quote_to_span`).
    */
  def alignQuote(docText: String, quote: String): Option[(Int, Int)] = {
    if (quote == null) return None
    val q = quote.trim
    if (q.isEmpty) return None
    val (normDoc, docMap) = normalizeWithMapping(docText)
    val (normQ, _) = normalizeWithMapping(q)
    var pos = normDoc.indexOf(normQ)
    if (pos == -1)
      pos = normDoc.toLowerCase(Locale.ROOT).indexOf(normQ.toLowerCase(Locale.ROOT))
    if (pos == -1) return None
    val start = docMap(pos)
    val end = docMap(pos + normQ.length - 1) + 1
    if (start < 0 || end <= start || end > docText.length) None else Some((start, end))
  }

  /** Turkish fallback for quote alignment (extractor.py:792-817). */
  def alignQuoteTurkish(docText: String, quote: String): Option[(Int, Int)] = {
    if (quote == null) return None
    val q = quote.trim
    if (q.isEmpty) return None
    alignQuote(docText, q).orElse {
      val (normDoc, docMap) = normalizeWithMapping(docText)
      val (normQ, _) = normalizeWithMapping(q)
      val pos = turkishLower(normDoc).indexOf(turkishLower(normQ))
      if (pos == -1) None
      else {
        val start = docMap(pos)
        val end = docMap(pos + normQ.length - 1) + 1
        if (start < 0 || end <= start || end > docText.length) None else Some((start, end))
      }
    }
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  // one digest instance + output buffer per thread: getInstance allocates
  // provider wiring on every call, digests run once per node/edge/anchor
  // (digest() resets the instance, so reuse is safe), and digesting into the
  // reusable buffer + emitting exactly the requested hex width avoids the
  // digest byte[] plus the full-hex-then-take String copies
  private val Sha256 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))
  private val Sha1 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-1"))
  private val DigestBuf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](32))

  private def digestHexN(md: java.security.MessageDigest, s: String, hexChars: Int): String = {
    md.update(s.getBytes("UTF-8"))
    val buf = DigestBuf.get()
    val len = md.digest(buf, 0, buf.length)
    val n = math.min(hexChars, len * 2)
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      val b = buf(i >> 1) & 0xff
      out(i) = if ((i & 1) == 0) HexChars(b >>> 4) else HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** sha256 hex digest (full). */
  def sha256Hex(s: String): String = digestHexN(Sha256.get(), s, 64)

  /** Document id: "sha256:" + first 12 hex chars (extractor.py:4488). */
  def docId(text: String): String = "sha256:" + digestHexN(Sha256.get(), text, 12)

  /** Anchor text hash: first 16 hex chars of sha256 (extractor.py:1686-1689). */
  def textHash16(s: String): String = digestHexN(Sha256.get(), s, 16)

  /** sha1 hex digest, used for deterministic edge-id tags (extractor.py:4778). */
  def sha1Hex8(s: String): String = digestHexN(Sha1.get(), s, 8)
}
