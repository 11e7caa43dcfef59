package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for caption/document processing — all
  * built from codegen'd Catalyst built-ins (no UDFs in the hot path), per
  * SURVEY.md §2.8/§2.12 policy ("expressions first").
  */
object Text {

  /** Whitespace tokenization; empty tokens removed. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > lit(0))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Typed single-pass twin of [[tokenCount]]: counts maximal runs of
    * non-whitespace chars (the exact `\s` class of split("\\s+")) without
    * materializing the token array — µs/row vs the interpreted
    * split+filter HOF pair, the same `*Fast` policy as
    * [[graft.operators.Dedup.fastTokens]] (spec-asserted equal, including
    * the null → null convention of size-over-null-array).
    */
  val tokenCountFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) null.asInstanceOf[java.lang.Integer]
      else {
        var n = 0
        var i = 0
        val len = text.length
        while (i < len) {
          val c = text.charAt(i)
          if (c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r') {
            i += 1
          } else {
            n += 1
            var j = i + 1
            while (j < len && {
              val d = text.charAt(j)
              !(d == ' ' || d == '\t' || d == '\n' || d == '' || d == '\f' || d == '\r')
            }) j += 1
            i = j
          }
        }
        java.lang.Integer.valueOf(n)
      }
    }

  /** Single-pass counting kernel for the token-stats family: ONE tokenizer
    * scan yields (n tokens, non-whitespace codepoints, summed token char
    * lengths, stopword occurrences, punctuation codepoints) — the raw
    * integer inputs of [[tokenCount]]/[[bpeTokenCount]]/[[meanTokenLen]]/
    * [[stopwordRatio]]/[[punctRatio]], which previously ran five separate
    * interpreted HOF/regex passes per row. Every RATIO stays an expression
    * over these counts, so the double arithmetic is the expressions' own —
    * the kernel only counts (KernelTwinSpec asserts each derived column
    * equal to its expression twin). Char counts are codepoint counts
    * (UTF8String numChars semantics); the \s class is the exact six ASCII
    * chars of Java regex \s. Null text returns a null struct — the
    * expression forms' null algebra then applies unchanged.
    */
  def tokenStatsFast(stopwords: Seq[String])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val stopSet = stopwords.toSet
    udf { (text: String) =>
      if (text == null) null
      else {
        var n = 0            // tokens
        var nwsChars = 0     // non-whitespace codepoints
        var lenSum = 0L      // summed per-token codepoint lengths
        var sw = 0           // stopword token occurrences
        var punct = 0        // non-[a-zA-Z0-9\s] codepoints
        val len = text.length
        var i = 0
        var tokStart = -1
        var tokChars = 0
        def endToken(end: Int): Unit = {
          if (tokStart >= 0) {
            n += 1
            lenSum += tokChars
            if (stopSet.contains(text.substring(tokStart, end))) sw += 1
            tokStart = -1
            tokChars = 0
          }
        }
        while (i < len) {
          val cp = text.codePointAt(i)
          val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
            cp == '\f' || cp == '\r'
          if (isWs) endToken(i)
          else {
            if (tokStart < 0) tokStart = i
            tokChars += 1
            nwsChars += 1
            val alnum = cp < 128 && ((cp >= 'a' && cp <= 'z') ||
              (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9'))
            if (!alnum) punct += 1
          }
          i += Character.charCount(cp)
        }
        endToken(len)
        (n, nwsChars, lenSum, sw, punct)
      }: (Int, Int, Long, Int, Int)
    }
  }

  /** BPE-ish subword-count proxy: words + extra units for long words and
    * digit/punctuation boundaries — a deterministic stand-in for a real
    * tokenizer's token count (the container has no tokenizer libs).
    */
  def bpeTokenCount(text: Column): Column = {
    val words = tokenCount(text)
    val chars = length(regexp_replace(text, "\\s+", ""))
    // every word costs >=1 unit; characters beyond 6 per word add ~1 unit/4
    // chars. floor() is explicit so integer-division semantics can't differ
    // between engines.
    val extra = greatest(lit(0.0), floor((chars - words * lit(6)) / lit(4.0)))
    (words + extra).cast("long")
  }

  /** Occurrence count of a literal substring (portable replace-counting). */
  def countOccurrences(text: Column, sub: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(sub), ""))) / sub.length).cast("long")

  /** Ratio of stopword tokens to all tokens (quality signal). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val sw = filter(toks, t => t.isin(stopwords.map(lit(_).cast("string")): _*))
    when(size(toks) > 0, size(sw).cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Fraction of tokens that repeat an earlier token — the word-level
    * repetition signal of Gopher-style quality filtering (Rae et al. 2021
    * §A.1.1: repetitious documents are low-quality). Pure per-row array
    * algebra: zero shuffle at any corpus size.
    */
  def dupWordFrac(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** The single most frequent bigram's share of all bigrams (Gopher's
    * top-2-gram fraction). Computed without a shuffle: bigrams are built
    * with `transform` over the token array, sorted, and the longest
    * equal-adjacent run found by one `aggregate` fold — per-document work
    * only, so the operator scales embarrassingly at 10^12 documents where
    * an explode + groupBy formulation would shuffle every bigram.
    */
  def topBigramFrac(text: Column): Column = {
    val toks = tokens(text)
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    val sorted = array_sort(bigrams)
    val best = aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev") <=> x, acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    when(size(bigrams) > 0, best.cast("double") / size(bigrams))
      .otherwise(lit(0.0))
  }

  /** Heuristic quality score in [0,1]: rewards moderate length, low
    * punctuation, mid-range stopword ratio (reference analog: the
    * low-information feature filters `train_functions.R:15-26`).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / lit(8.0), lit(1.0))
    val punct = punctRatio(text)
    val swr = stopwordRatio(text, stopwords)
    val swScore = lit(1.0) - abs(swr - lit(0.35)) / lit(0.65)
    round(greatest(lit(0.0), least(lit(1.0),
      lenScore * lit(0.4) + (lit(1.0) - punct) * lit(0.3) + swScore * lit(0.3))), 6)
  }

  /** n-gram heuristic language id over a small language-profile table:
    * score = count of language-characteristic function words present.
    * Deterministic, pure column expressions.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(lower(text))
    langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers.map(lit(_).cast("string")): _*)))
    }
  }

  /** Predicted language: argmax marker count, 'und' if all zero.
    * Ties break alphabetically (deterministic).
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.tail.foldLeft(struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("s"), struct(sc.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  // alphabetical lang order (the tie-break order of langId's fold) and a
  // marker -> lang bitmask table ("la" belongs to es AND fr — a marker may
  // score several languages, exactly as four independent filters do)
  private val langsSorted: Array[String] = langMarkers.keys.toArray.sorted
  private val markerMask: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    langsSorted.zipWithIndex.foreach { case (lang, i) =>
      langMarkers(lang).foreach(w => m.put(w, Integer.valueOf(
        (if (m.containsKey(w)) m.get(w) else 0) | (1 << i))))
    }
    m
  }
  private val maxMarkerLen: Int = langMarkers.values.flatten.map(_.length).max

  /** Typed single-pass twin of [[langId]] — same semantics (spec-asserted
    * equal on generated and edge-case docs): one scan of the string, no
    * token-array materialization, no interpreted array-HOF lambdas. The
    * column form is ~4 filter() higher-order functions per row, which stay
    * outside whole-stage codegen; this is the hot-path form for
    * corpus-scale language id (same `*Fast` pattern as
    * [[graft.operators.Dedup.minhashSignatureFast]]).
    */
  val langIdFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) "und"
      else {
        val counts = new Array[Int](langsSorted.length)
        val n = text.length
        val buf = new Array[Char](maxMarkerLen)
        var i = 0
        while (i < n) {
          val c = text.charAt(i)
          // the \s class of split("\\s+"): exactly these six ASCII chars
          if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
            i += 1
          } else {
            var j = i + 1
            while (j < n && {
              val d = text.charAt(j)
              !(d == ' ' || d == '\t' || d == '\n' || d == '\u000B' || d == '\f' || d == '\r')
            }) j += 1
            val len = j - i
            if (len <= maxMarkerLen) {
              var k = 0
              while (k < len) { buf(k) = Character.toLowerCase(text.charAt(i + k)); k += 1 }
              // missing key -> 0 (no marker bits), explicitly: Scala unboxes
              // HashMap[String, Int].get's null to 0 anyway, but silently
              val mask = markerMask.getOrDefault(new String(buf, 0, len), 0)
              if (mask != 0) {
                var b = 0
                val mv = mask
                while (b < counts.length) {
                  if ((mv & (1 << b)) != 0) counts(b) += 1
                  b += 1
                }
              }
            }
            i = j
          }
        }
        var best = -1
        var bestScore = 0
        var b = 0
        while (b < counts.length) {
          if (counts(b) > bestScore) { bestScore = counts(b); best = b }
          b += 1
        }
        if (best < 0) "und" else langsSorted(best)
      }
    }

  /** Deterministic 64-bit document fingerprint: rotate-xor rolling hash over
    * the token sequence (order-sensitive, whitespace-normalized) — exact-dup
    * detection key that is stable across partitionings. Uses shift/xor only,
    * so it is ANSI-mode safe (no overflow-checked arithmetic).
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
        .bitwiseXOR(xxhash64(t)))

  /** Hamming distance between two 64-bit hashes (phash etc.). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
