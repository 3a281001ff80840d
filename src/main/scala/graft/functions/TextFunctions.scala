package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the LLM-data-pipeline surface (BASELINE
  * north star): token counting, quality scoring, language-ID heuristic,
  * document fingerprinting. All built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so they stay inside
  * whole-stage codegen and push through Catalyst untouched.
  *
  * Tokenization is a literal single-space split so the DuckDB oracle
  * (`string_split(text, ' ')`) computes the identical value.
  */
object TextFunctions {

  def tokens(text: Column): Column = split(text, " ", -1)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of non-overlapping occurrences of literal `needle`. */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) /
      needle.length).cast("int")

  /** Ratio of characters outside [a-zA-Z0-9 ] — punctuation/symbol load. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") /
        length(text).cast("double"))

  /** Stopword-token ratio against a fixed lexicon (pad-and-count, so a
    * word matches only at token boundaries). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val hits = stopwords
      .map(w => occurrences(padded, s" $w "))
      .reduce(_ + _)
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(hits.cast("double") / tokenCount(text).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs and
    * stopword presence, penalizes punctuation load. Deterministic,
    * oracle-replicable arithmetic (doubles only). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val sw = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val punct = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
    round((lenScore + sw + punct) / 3.0, 6)
  }

  /** Gopher document-quality rules (Rae et al. 2021, appendix A1.1) as
    * a struct of per-rule pass flags plus the composite `keep`. Every
    * threshold compare is EXACT INTEGER arithmetic (`5·alpha ≥ 4·n`
    * instead of `alpha/n ≥ 0.8`), so the flags replay bit-for-bit on
    * any engine with no float-division drift — and the whole struct is
    * scan-stage codegen'd expression work, zero shuffles.
    *
    * Rules: word count in [50, 100 000]; mean word length in [3, 10]
    * chars; '#' and '…'-symbol-to-word ratios < 0.1; ≥ 80% of words
    * contain an alphabetic character; ≥ 2 distinct stopwords present
    * (the "stop word" ersatz of Gopher's); < 90% of lines bullet-led;
    * < 30% of lines ellipsis-terminated. */
  def gopherFlags(text: Column, stopwords: Seq[String]): Column = {
    val words = tokenCount(text)
    val chars = length(translate(text, " ", ""))
    val alphaWords = size(filter(tokens(text), w => w.rlike("[A-Za-z]")))
    val padded = concat(lit(" "), text, lit(" "))
    val stops = stopwords
      .map(w => when(occurrences(padded, s" $w ") > 0, 1).otherwise(0))
      .reduce(_ + _)
    val lines = split(text, "\n", -1)
    val nLines = size(lines)
    val bulletLines = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* ")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val wcOk = words >= 50 && words <= 100000
    val mwlOk = chars >= words * 3 && chars <= words * 10
    val hashOk = occurrences(text, "#") * 10 < words
    val dotsOk = occurrences(text, "...") * 10 < words
    val alphaOk = alphaWords * 5 >= words * 4
    val stopOk = stops >= 2
    val bulletOk = bulletLines * 10 <= nLines * 9
    val lineDotsOk = ellipsisLines * 10 <= nLines * 3
    struct(
      wcOk.cast("int").as("wc_ok"),
      mwlOk.cast("int").as("mwl_ok"),
      hashOk.cast("int").as("hash_ok"),
      dotsOk.cast("int").as("dots_ok"),
      alphaOk.cast("int").as("alpha_ok"),
      stopOk.cast("int").as("stop_ok"),
      bulletOk.cast("int").as("bullet_ok"),
      lineDotsOk.cast("int").as("line_dots_ok"),
      (wcOk && mwlOk && hashOk && dotsOk && alphaOk && stopOk &&
        bulletOk && lineDotsOk).cast("int").as("keep"))
  }

  /** C4 cleaning rules (Raffel et al. 2020, §2.2 "Colossal Clean
    * Crawled Corpus") as a struct of line-level retention plus
    * page-level pass flags. Line rules (a line survives iff ALL hold):
    * ends in a terminal punctuation mark (`. ! ? "`), has ≥ 5
    * whitespace words, and does not mention "javascript"
    * (case-insensitive). Page rules (the page is kept iff ALL hold):
    * the retained lines contain ≥ 3 sentence terminators, no banned
    * phrase (C4 uses "lorem ipsum") appears anywhere, no `{` appears
    * (code page heuristic), and no blocklist word occurs at token
    * boundaries. Returns `struct<n_lines, n_kept, n_sentences,
    * no_badword, no_phrase, no_brace, keep, clean_md5>` where
    * `clean_md5` fingerprints the retained-line text — the actual
    * cleaning output — so a checker can verify the line filter
    * byte-for-byte without shipping the cleaned corpus.
    *
    * Pure row-local scan-stage expression work (split / filter /
    * occurrence counts), zero shuffles, no UDF: the filter composition
    * is a `WHERE keep = 1` that Catalyst pushes into the scan. */
  def c4Flags(text: Column, badwords: Seq[String],
              banPhrases: Seq[String]): Column = {
    val lines = split(text, "\n", -1)
    val kept = filter(lines, l =>
      l.substr(length(l), lit(1)).isin(".", "!", "?", "\"") &&
        size(split(l, " ", -1)) >= 5 &&
        !lower(l).contains("javascript"))
    val cleaned = concat_ws("\n", kept)
    val nSent = (occurrences(cleaned, ".") + occurrences(cleaned, "!") +
      occurrences(cleaned, "?")).cast("int")
    val padded = concat(lit(" "), lower(text), lit(" "))
    val badHits = badwords.map(w => occurrences(padded, s" $w "))
      .reduce(_ + _)
    val phraseHit = banPhrases.map(p => lower(text).contains(p))
      .reduce(_ || _)
    val noBad = badHits === 0
    val noPhrase = !phraseHit
    val noBrace = !text.contains("{")
    struct(
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      nSent.as("n_sentences"),
      noBad.cast("int").as("no_badword"),
      noPhrase.cast("int").as("no_phrase"),
      noBrace.cast("int").as("no_brace"),
      (nSent >= 3 && noBad && noPhrase && noBrace).cast("int").as("keep"),
      md5(cleaned).as("clean_md5"))
  }

  /** Token n-grams of a document as an array (duplicates KEPT — this is
    * the occurrence sequence, unlike Dedup.shingles' distinct set). */
  private def ngramSeq(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Repeated-n-gram ratio: fraction of a doc's n-gram OCCURRENCES that
    * are repeats of an earlier occurrence (1 − distinct/total). The
    * repetition signal of published LLM corpus-quality filters (Gopher's
    * "duplicate n-gram fraction" family): boilerplate, keyword stuffing,
    * and decode-loop text score high; prose scores near 0. Pure row-local
    * expression arithmetic — evaluated in the scan stage, no shuffle, no
    * UDF; cost is O(shingles·log) per row regardless of corpus size. */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val sh = ngramSeq(text, n)
    when(size(sh) <= 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(sh)).cast("double") /
        size(sh).cast("double"))
  }

  /** Top-token ratio: share of the document's tokens taken by its single
    * most frequent token — the "most common word" concentration filter
    * (a doc that is 40% one token is a list/log, not prose). Row-local
    * higher-order-function arithmetic: O(distinct·total) per row, which
    * is bounded by document length, never by corpus size. */
  def topTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    val maxOcc = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
    when(size(toks) <= 0, lit(0.0))
      .otherwise(maxOcc.cast("double") / size(toks).cast("double"))
  }

  /** PII patterns for [[scrubPii]], applied in order. Written in the
    * common Java-regex/RE2 subset (classes, +, bounded repeats, \b) so
    * the DuckDB oracle runs the IDENTICAL patterns — the SQL is
    * generated from this list, one source of truth. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\+\\d{7,15}", "<PHONE>"))

  /** Redact emails / IPv4 addresses / international phone numbers with
    * typed placeholder tokens — the standard pre-training scrub pass.
    * A chain of codegen'd `regexp_replace` calls evaluated in the scan
    * stage: no shuffle, no UDF, cost linear in text size. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-language stopword lexicons for the n-gram/stopword language-ID
    * heuristic. Short public lists; scoring = total occurrences of
    * boundary-padded stopwords. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "que", "y"),
    "zh" -> Seq("de", "shi", "bu", "le"))

  /** Language-ID heuristic: argmax of per-language stopword-hit counts,
    * first-listed language wins ties, "und" (undetermined) when no
    * lexicon hits at all. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langLexicons.map { case (lang, words) =>
      lang -> words.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set. Detects token-permuted duplicates that exact text
    * equality misses. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), " ", -1)))))

  /** GPT-2-style pre-tokenizer pattern: contraction suffixes, letter
    * runs, digit runs, punctuation runs (each optionally absorbing one
    * leading space), residual whitespace runs. Deliberately
    * RE2-compatible — no lookarounds — so the DuckDB oracle evaluates
    * the identical pattern (Java regex and RE2 agree on every construct
    * used here). */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token count: number of pre-tokenizer matches — the standard
    * cheap proxy for LLM token budgets (real BPE merges only split
    * WITHIN these pieces, so this lower-bounds and tracks the true
    * count). Codegen'd regexp, no UDF. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Polynomial rolling hash of the full character stream (base-31 mod
    * 1e9+7, Rabin–Karp step function): an order-SENSITIVE complement to
    * [[fingerprint]] — equal iff the exact character sequence is equal,
    * cheap to maintain incrementally over a stream of chunks since
    * hash(a ++ b) = hash(a)·31^len(b) + hash(b) (mod p). Built as a
    * single `aggregate` fold over the char array — one pass, codegen'd.
    * The modulus is < 2^30 so `acc·31 + c` stays far below 2^63: no
    * overflow under Spark's ANSI mode, and the DuckDB oracle computes
    * the identical fold with `list_reduce`. */
  def rollingHash(text: Column): Column = {
    val p = 1000000007L
    aggregate(split(text, "", -1), lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), lit(p)))
  }

  /** Fixed-size token chunking with overlap — the context-prep op for
    * embedding/RAG/training pipelines: chunk i (1-based) starts at
    * token 1 + (i−1)·(chunkTokens − overlap) and spans up to
    * `chunkTokens` tokens, so consecutive chunks share `overlap` tokens
    * and every token is covered (a short doc yields one chunk of
    * itself). Returns array<struct<idx, start, n_tokens, chunk>> —
    * row-local, scan-stage, no shuffle; explode downstream to one row
    * per chunk. Start positions are 1-based like the span operators. */
  def chunks(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap ($overlap) must be in [0, chunkTokens ($chunkTokens))")
    val step = chunkTokens - overlap
    val t = tokens(text)
    transform(
      sequence(lit(1), greatest(size(t) - overlap, lit(1)), lit(step)),
      (s, i) => struct(
        (i + 1).as("idx"),
        s.cast("long").as("start"),
        least(lit(chunkTokens), size(t) - s + 1).cast("long").as("n_tokens"),
        concat_ws(" ", slice(t, s, lit(chunkTokens))).as("chunk")))
  }

  /** Content-defined chunking (the FastCDC/Rabin idea at token grain):
    * a chunk boundary falls after token i whenever the md5₃₂ of the
    * `window`-token context ending at i is ≡ 0 mod `divisor` — so
    * boundaries depend only on LOCAL content, and an insertion early
    * in a document re-chunks only its neighborhood instead of shifting
    * every downstream chunk the way fixed-size chunking does. That
    * locality is what makes chunk-hash dedup robust to edits (the
    * byte-dedup literature's motivation, applied at token grain).
    * Expected chunk length ≈ `divisor` tokens; the document tail is
    * always a final chunk. Returns array<struct<start, n_tokens,
    * chunk>> (1-based starts) — row-local, scan-stage, no shuffle;
    * posexplode downstream for (idx, chunk) rows. */
  def contentChunks(text: Column, window: Int, divisor: Int): Column = {
    require(window >= 1, s"window must be >= 1: $window")
    require(divisor >= 2, s"divisor must be >= 2: $divisor")
    val t = tokens(text)
    def h(i: Column) = conv(substring(
      md5(concat_ws(" ", slice(t, i - (window - 1), lit(window)))),
      1, 8), 16, 10).cast("long")
    // Spark's sequence(4, 2) counts DOWN — a doc shorter than the
    // window must yield an empty candidate list, not a reversed one
    val idxs = when(size(t) >= window, sequence(lit(window), size(t)))
      .otherwise(array().cast("array<int>"))
    val cuts = filter(idxs, i => pmod(h(i), lit(divisor.toLong)) === 0)
    // cuts ascend; appending the doc end and dropping a duplicate
    // keeps ascension — ends of chunk i and start of chunk i+1 derive
    // by position, so starts/ends stay aligned for zip_with
    val ends = array_distinct(concat(cuts, array(size(t))))
    val starts = concat(array(lit(1)),
      transform(slice(ends, lit(1), size(ends) - 1), e => e + 1))
    zip_with(starts, ends, (s, e) => struct(
      s.cast("long").as("start"),
      (e - s + 1).cast("long").as("n_tokens"),
      concat_ws(" ", slice(t, s, e - s + 1)).as("chunk")))
  }

  /** Gear-hash content-defined chunking — the O(tokens)-hashing sibling
    * of [[contentChunks]]. That operator md5s every w-token WINDOW
    * string (per token, one md5 over ~w tokens of text — the measured
    * 5.4 s floor of its gate at sf0.1); here each TOKEN is
    * fingerprinted (first 4 md5 hex digits → a 16-bit "gear" value,
    * the gear table of FastCDC-style chunkers) and the window hash is
    * the exact integer
    *
    *   H_i = Σ_{k=0..w-1} gear(t_{i-k}) · 2^k
    *
    * — integer adds replace string hashing in the hot loop. A boundary
    * falls after position i when H_i ≡ 0 (mod divisor); expected chunk
    * length ≈ w·divisor/… same tuning story as [[contentChunks]], and
    * the same edit-locality: an edit perturbs only the windows that
    * contain it, so chunk identities away from the edit are stable —
    * the property that makes chunk-grain dedup incremental.
    *
    * Exactness bound: gears are 16-bit (4 md5 hex digits) and the last
    * w of them live PACKED in one Long (w ≤ 4 ⇒ 16·w ≤ 64 bits), so
    * the fold's per-token work is pure Long bit-ops — no per-token
    * array allocation, which dominates interpreted higher-order-
    * function cost. H < 2^(16+w): exact in a Long and in the oracle's
    * BIGINT arithmetic (no modular wrap to replicate). Output schema
    * matches [[contentChunks]]: array of (start, n_tokens, chunk).
    *
    * Two formulations measured and rejected at sf0.1: per-position
    * element_at into a gear-array column (Catalyst project-collapsing
    * inlines the whole array expression into every element_at —
    * O(n²) token hashes, 128 s) and a ring-buffer-array fold (correct,
    * but one array rebuild per token — 4.0 s, barely beating the
    * 5.2 s md5-per-window operator it exists to undercut). */
  def gearChunks(text: Column, window: Int, divisor: Int): Column = {
    require(window >= 1 && window <= 4,
      s"window must be in [1,4] (last-w gears pack one Long): $window")
    require(divisor >= 2, s"divisor must be >= 2: $divisor")
    val t = tokens(text)
    // ONE sequential fold over the token array carrying (position,
    // packed last-w gears, rolling H, boundary list):
    //   H_i = 2·H_{i−1} + g_i − g_{i−w}·2^w
    // with g_{i−w} = the packed word's top 16 bits (zero-initialized,
    // so positions < w roll garbage-free and are excluded by the
    // i ≥ w boundary condition).
    def gear(tok: Column) =
      conv(substring(md5(tok), 1, 4), 16, 10).cast("long")
    val packMask =
      if (16 * window == 64) lit(-1L) else lit((1L << (16 * window)) - 1)
    val init = struct(
      lit(0).as("i"), lit(0L).as("rp"), lit(0L).as("h"),
      array().cast("array<int>").as("cuts"))
    val cuts = aggregate(t, init,
      (st, tok) => {
        val g = gear(tok)
        val i2 = st.getField("i") + 1
        val oldest = shiftrightunsigned(
          st.getField("rp"), 16 * (window - 1))
        val h2 = st.getField("h") * 2 + g - oldest * lit(1L << window)
        val rp2 = shiftleft(st.getField("rp"), 16)
          .bitwiseOR(g).bitwiseAND(packMask)
        val cuts2 = when(
          i2 >= window && pmod(h2, lit(divisor.toLong)) === 0,
          concat(st.getField("cuts"), array(i2)))
          .otherwise(st.getField("cuts"))
        struct(i2.as("i"), rp2.as("rp"), h2.as("h"), cuts2.as("cuts"))
      },
      st => st.getField("cuts"))
    val ends = array_distinct(concat(cuts, array(size(t))))
    val starts = concat(array(lit(1)),
      transform(slice(ends, lit(1), size(ends) - 1), e => e + 1))
    zip_with(starts, ends, (s, e) => struct(
      s.cast("long").as("start"),
      (e - s + 1).cast("long").as("n_tokens"),
      concat_ws(" ", slice(t, s, e - s + 1)).as("chunk")))
  }

  /** Unicode NFC canonicalization ([[NfcNormalize]] — native codegen):
    * run before any byte-level hash/dedup so composed and decomposed
    * spellings of the same text collapse. */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(NfcNormalize(expression(text)))
  }

  /** Jaro-Winkler similarity in [0,1] ([[JaroWinkler]] — native
    * codegen, DuckDB-compatible semantics): the fuzzy-entity-match
    * scorer for blocked candidate pairs. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(JaroWinkler(expression(a), expression(b)))
  }
}
