package graft.functions

/** Scalar text kernels mirroring the reference's text-normalization surface
  * (simplify/tokenize/levenshtein/similarity — see
  * /root/reference/mllib/src/main/scala/text/Word.scala:34-55 and
  * /root/reference/geo/src/main/scala/TextTools.scala:4-113 for the
  * *capabilities*; the implementations here are original).
  *
  * All functions are pure JVM kernels, usable inside UDFs and
  * `mapPartitions`. Keep them allocation-light: they run in the inner loop
  * of the fuzzy join's scoring stage.
  */
object TextKernels extends Serializable {

  /** One matched token with its source-character span.
    *
    * @param start inclusive char offset in the original string
    * @param end   exclusive char offset in the original string
    * @param acro  original token was a 2-3 char all-caps acronym
    */
  case class Tok(tok: String, pos: Int, start: Int, end: Int, acro: Boolean)

  /** Accent folding + lowercasing + ligature expansion. The reference folds
    * via a custom char table; we use NFD + combining-mark strip which covers
    * the same Latin range, plus the ligatures the table special-cases. */
  def simplify(s: String): String = {
    if (s == null) return null
    val expanded = s
      .replace("œ", "oe").replace("Œ", "OE")
      .replace("æ", "ae").replace("Æ", "AE")
      .replace("ß", "ss")
    val norm = java.text.Normalizer.normalize(expanded, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(Character.toLowerCase(c))
      i += 1
    }
    sb.toString
  }

  private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** Tokenize on non-letter/digit boundaries, keeping char offsets and
    * flagging acronyms (2-3 char all-uppercase in the ORIGINAL text —
    * the signal the reference's AcronymFilter keys on). Tokens are
    * simplified (case/accent-folded). */
  def tokenizeWithOffsets(s: String): Seq[Tok] = {
    if (s == null) return Seq.empty
    val out = Seq.newBuilder[Tok]
    var i = 0
    var pos = 0
    while (i < s.length) {
      while (i < s.length && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && isWordChar(s.charAt(i))) i += 1
      if (i > start) {
        val raw = s.substring(start, i)
        val acro = raw.length >= 2 && raw.length <= 3 &&
          raw.forall(c => Character.isUpperCase(c))
        out += Tok(simplify(raw), pos, start, i, acro)
        pos += 1
      }
    }
    out.result()
  }

  def tokenize(s: String): Seq[String] = tokenizeWithOffsets(s).map(_.tok)

  // The reference's hand char table folds a few characters DIFFERENTLY
  // from Unicode NFD (œ→e not oe, æ→a not ae, ñ/ð→o not n/d), turns
  // hyphens and apostrophes into spaces, and elides French articles
  // (l'/d' before the apostrophe). Grouping each fold family as
  // "<target><members…>" keeps the table declarative.
  private val refFold: Map[Char, String] = {
    val families = Seq("aàáâãäåæ", "eèéêëœ", "iìíîï",
      "oðñòóôõöø", "uùúûü", "cç")
    families.flatMap(f => f.drop(1).map(_ -> f.take(1))).toMap ++
      Map('-' -> " ", '\'' -> " ")
  }

  /** Opt-in REFERENCE-PARITY variant of [[simplify]] for callers porting
    * French-text fixtures byte-for-byte (see FIXTURES.md §12): reproduces
    * the reference char table's divergences from the NFD fold —
    * `œ→e`, `æ→a`, `ñ→o`, `ð→o`, hyphen/apostrophe → space, and `l'`/`d'`
    * article elision ("l'hôpital" → "  hopital", so the article never
    * becomes a token). [[simplify]] (NFD + ligature expansion) remains
    * the default everywhere: it covers the full Latin range instead of a
    * fixed list and keeps `œ→oe`/`æ→ae` (the linguistically standard
    * expansion). Capability per reference
    * mllib/src/main/scala/text/Word.scala:34-55; implementation original. */
  def simplifyRefParity(s: String): String = {
    if (s == null) return null
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val out = new StringBuilder(lower.length)
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      val elides = (c == 'l' || c == 'd') &&
        i + 1 < lower.length && lower.charAt(i + 1) == '\''
      if (elides) out.append(' ')
      else out.append(refFold.getOrElse(c, c.toString))
      i += 1
    }
    out.toString
  }

  /** 64-bit polynomial rolling hash (h₀=7, h·31+c with natural Long
    * overflow). Chosen over murmur/xxhash because the SAME value is
    * computable in plain SQL on any engine with 128-bit integers
    * (DuckDB: list_reduce over UHUGEINT mod 2⁶⁴) — which is what lets the
    * signature-based dedup operators be oracle-gated, not just rows-only.
    *
    * CONTRACT: iterates UTF-16 code units (`charAt`), while a SQL replay
    * via `unicode(c)` iterates code points — the two agree only for BMP
    * text (no surrogate pairs). All current oracle-gated inputs are ASCII;
    * if non-BMP corpora (emoji etc.) ever need the gate, the SQL side must
    * expand code points > 0xFFFF into their UTF-16 surrogate pairs.
    *
    * NOTE: raw polyHash64 has NO avalanche — a k-char ASCII token only
    * reaches bits up to ~log₂(31ᵏ·c), so short tokens leave the high bits
    * zero. Any use that samples individual BITS of the hash (SimHash) or
    * folds it modulo a constant (MinHash slots, TF bucketing) MUST use
    * [[polyHash64Mixed]] instead; raw polyHash64 is only safe as an
    * equality fingerprint. */
  def polyHash64(s: String): Long = {
    var h = 7L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }

  /** splitmix64-style avalanche finalizer (Steele et al., JDK
    * `SplittableRandom`; public domain constants). Every step is
    * xor / unsigned-shift / odd-constant multiply mod 2⁶⁴ — exactly as
    * SQL-replayable as the polynomial itself (DuckDB: `xor`, `>>`, `*`
    * on UHUGEINT). After mixing, every output bit depends on every input
    * bit (~50 % flip probability), so bit-sampling uses are sound. */
  def mix64(x: Long): Long = {
    var h = x
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Avalanched 64-bit string hash: `mix64(polyHash64(s))`. The variant
    * every bit-sampling / modular-folding consumer (SimHash, MinHash,
    * ArrayHasher's oracle path) must use. Same BMP-only SQL-replay
    * contract as [[polyHash64]]. */
  def polyHash64Mixed(s: String): Long = mix64(polyHash64(s))

  /** Bounded Levenshtein distance: returns early with `bound + 1` once the
    * distance provably exceeds `bound` (banded DP, O(len · bound)). */
  def boundedLevenshtein(a: String, b: String, bound: Int): Int = {
    if (a == b) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    if (t.length - s.length > bound) return bound + 1
    var prev = Array.tabulate(s.length + 1)(identity)
    var cur = new Array[Int](s.length + 1)
    var j = 1
    while (j <= t.length) {
      cur(0) = j
      var rowMin = cur(0)
      var i = 1
      while (i <= s.length) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        if (cur(i) < rowMin) rowMin = cur(i)
        i += 1
      }
      if (rowMin > bound) return bound + 1
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    math.min(prev(s.length), bound + 1)
  }

  /** SymSpell-style deletion neighborhood: all strings obtainable by
    * deleting up to `maxDeletes` chars. Joining both sides on these
    * variants yields every pair within edit distance `maxDeletes` for
    * deletions/insertions and serves as a candidate filter for
    * substitutions (verified afterwards with boundedLevenshtein).
    * Includes the string itself. Public algorithm (SymSpell, Wolf Garbe). */
  def deletionVariants(s: String, maxDeletes: Int): Seq[String] = {
    if (maxDeletes <= 0 || s.length <= 1) return Seq(s)
    val seen = collection.mutable.LinkedHashSet[String](s)
    var frontier = List(s)
    var d = 0
    while (d < maxDeletes) {
      frontier = frontier.flatMap { w =>
        if (w.length <= 1) Nil
        else (0 until w.length).map(i => w.substring(0, i) + w.substring(i + 1))
      }.filter(seen.add)
      d += 1
    }
    seen.toSeq
  }

  private val urlRe = "(?i)\\bhttps?://\\S+|\\bwww\\.\\S+".r
  private val mentionRe = "(?<=^|\\s)@[A-Za-z0-9_]+".r
  private val positiveEmoticons = Set(":)", ":-)", ":D", ":-D", ";)", "=)", "<3")
  private val negativeEmoticons = Set(":(", ":-(", ":'(", "=(", "D:")

  /** Replace URLs with blanks of the same length, preserving every other
    * character offset (reference Word.replaceUrlsByBlank capability,
    * text/Word.scala:75-90). */
  def scrubUrlsPreserveOffsets(s: String): String = {
    if (s == null) return null
    urlRe.replaceAllIn(s, m => " " * (m.end - m.start))
  }

  /** Tweet normalization (reference text/TweetCleaner.scala capability):
    * emoticons -> sentiment tokens, @mentions -> a mention token, URLs ->
    * a link token. Replacement tokens are parameters in the reference;
    * defaults here mirror its intent. */
  def cleanTweet(s: String,
                 positiveToken: String = "_positive_",
                 negativeToken: String = "_negative_",
                 mentionToken: String = "_mention_",
                 linkToken: String = "_link_"): String = {
    if (s == null) return null
    val noUrl = urlRe.replaceAllIn(s, java.util.regex.Matcher.quoteReplacement(linkToken))
    val noMention = mentionRe.replaceAllIn(noUrl, java.util.regex.Matcher.quoteReplacement(mentionToken))
    noMention.split(" ").map { w =>
      if (positiveEmoticons.contains(w)) positiveToken
      else if (negativeEmoticons.contains(w)) negativeToken
      else w
    }.mkString(" ")
  }

  /** URL canonicalization for crawl/corpus dedup (the form every web
    * pipeline dedups on): lowercase scheme+host, strip default ports
    * (80/443) and trailing host dots, drop the fragment, drop tracking
    * params (utm_*, fbclid, gclid) and empty params, sort survivors by
    * (key, value), empty path → "/". Returns null for null/unparseable
    * input — the quarantine contract. Deterministic pure-JVM string work
    * (java.net.URI), so constructed-fixture oracles are closed-form. */
  def canonicalizeUrl(s: String): String = {
    if (s == null) return null
    val uri =
      try new java.net.URI(s.trim)
      catch { case _: java.net.URISyntaxException => return null }
    val scheme = Option(uri.getScheme).map(_.toLowerCase).getOrElse(return null)
    if (scheme != "http" && scheme != "https") return null
    val host0 = Option(uri.getHost).map(_.toLowerCase).getOrElse(return null)
    val host = host0.stripSuffix(".")
    val port = uri.getPort match {
      case -1 => ""
      case 80 if scheme == "http" => ""
      case 443 if scheme == "https" => ""
      case p => s":$p"
    }
    val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val tracking = Set("fbclid", "gclid")
    val params = Option(uri.getRawQuery).map(_.split("&").toSeq).getOrElse(Nil)
      .filter(_.nonEmpty)
      .map { kv => val i = kv.indexOf('='); if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1)) }
      .filterNot { case (k, _) => k.toLowerCase.startsWith("utm_") || tracking(k.toLowerCase) }
      .sortBy { case (k, v) => (k, v) }
      .map { case (k, v) => if (v.isEmpty) k else s"$k=$v" }
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$scheme://$host$port$path$query"
  }

  /** Positional text similarity in [0,1]: fraction of query tokens found in
    * the candidate (exact or within lev distance 1 for tokens >= 4 chars),
    * mirroring the capability of the reference's TextTools.textSimilarity. */
  def tokenSetSimilarity(query: String, candidate: String): Double = {
    val q = tokenize(query)
    if (q.isEmpty) return 0.0
    val c = tokenize(candidate).toSet
    val hits = q.count { t =>
      c.contains(t) || (t.length >= 4 && c.exists(ct =>
        math.abs(ct.length - t.length) <= 1 && boundedLevenshtein(t, ct, 1) <= 1))
    }
    hits.toDouble / q.size
  }
}
