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

  /** Unicode-aware word tokenization over case-folded text
    * (extractor.py:1110-1116). Hand-rolled scanner equivalent to
    * `(?U)\\w+` on the lowered text — tokenization is the engine's hottest
    * scalar (scoring, clustering, repair, autofill all build keyword sets),
    * and the regex version allocated a Match per token. */
  def tokenize(text: String): List[String] = {
    if (text == null || text.isEmpty) return Nil
    val low = text.toLowerCase(Locale.ROOT)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    val n = low.length
    while (i < n) {
      val c = low.charAt(i)
      if (Character.isLetterOrDigit(c) || c == '_') {
        val start = i
        while (i < n && {
          val ch = low.charAt(i); Character.isLetterOrDigit(ch) || ch == '_'
        }) i += 1
        out += low.substring(start, i)
      } else i += 1
    }
    out.toList
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

  /** Tokens of length ≥ 4 minus stopwords (extractor.py:1119-1121). */
  def keywordSet(text: String): Set[String] =
    tokenize(text).iterator.filter(t => t.length >= 4 && !Stopwords.contains(t)).toSet

  /** ASCII word tokens `[a-zA-Z0-9_]+` on the lowered text — the repair
    * engine's tokenizer (repair_orphans.py:152-154), which is narrower than
    * the extractor's unicode `\w+`. */
  def asciiTokenize(text: String): List[String] = {
    if (text == null || text.isEmpty) return Nil
    val low = text.toLowerCase(Locale.ROOT)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    val n = low.length
    def isAscii(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
    while (i < n) {
      if (isAscii(low.charAt(i))) {
        val start = i
        while (i < n && isAscii(low.charAt(i))) i += 1
        out += low.substring(start, i)
      } else i += 1
    }
    out.toList
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

  /** sha256 hex digest (full). */
  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    toHex(md.digest(s.getBytes("UTF-8")))
  }

  /** Document id: "sha256:" + first 12 hex chars (extractor.py:4488). */
  def docId(text: String): String = "sha256:" + sha256Hex(text).take(12)

  /** Anchor text hash: first 16 hex chars of sha256 (extractor.py:1686-1689). */
  def textHash16(s: String): String = sha256Hex(s).take(16)

  /** sha1 hex digest, used for deterministic edge-id tags (extractor.py:4778). */
  def sha1Hex8(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    toHex(md.digest(s.getBytes("UTF-8"))).take(8)
  }
}
