package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY §2.8 E5):
  * tokenization, token/char statistics, stopword & quality scoring,
  * marker-based language ID, and content fingerprints.
  *
  * The reference has no text operators (it is a hospital-ETL,
  * reference etl_app/etl_script.py); these generalize the engine to
  * the `documents` substrate (TESTDATA.md).
  *
  * Design rules for 100 TB:
  *  - everything is a pure Catalyst expression over built-in
  *    higher-order functions — codegen-friendly, no UDFs, fully
  *    parallel per-row with zero shuffles;
  *  - cross-engine determinism (the DuckDB oracle must reproduce
  *    results bit-for-bit) comes from md5-derived integer hashing
  *    ([[TextOps.md5Int32]]) and explicit left-folds, never from
  *    engine-internal hash functions.
  */
object TextOps {

  /** Functional let-binding for Catalyst expressions: evaluate `c`
    * ONCE, reference it many times in `body`. Needed because
    * CollapseProject inlines a projected column into the expressions
    * that reference it — including into higher-order-function lambda
    * BODIES, where it then re-evaluates per element (a tokenizer
    * inlined into a per-shingle lambda re-splits the document for
    * every shingle — measured 20×+ slowdowns). `transform` binds its
    * lambda argument to a materialized value, so wrapping the
    * expensive expression in a 1-element array and transforming over
    * it is a let.
    */
  def let1(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  /** Whitespace tokenizer (the "BPE-ish regex" baseline: split on runs
    * of whitespace after trim). Empty text → single empty token; the
    * callers filter if needed.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Deterministic 32-bit-range hash shared with the DuckDB oracle:
    * first 8 hex chars of md5 as an unsigned int in [0, 2^32).
    * Both engines implement md5 identically, so this is the one
    * portable "random" function available to MinHash/SimHash.
    */
  def md5Int32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Token count per document. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex tokenizer: lowercase, then alternate runs of
    * alphanumerics and single non-space punctuation — the classic
    * pre-tokenization split a byte-pair encoder refines. Regex kept
    * to a portable subset (character classes + alternation) so the
    * DuckDB oracle's RE2 and Spark's Java regex agree.
    */
  def tokensBpe(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Fraction of tokens found in `stopwords` (frequency, not distinct
    * overlap — 'the the the' counts three times).
    */
  def stopwordRatio(tk: Column, stopwords: Seq[String]): Column =
    size(filter(tk, t => t.isin(stopwords: _*))).cast("double") /
      size(tk).cast("double")

  /** Punctuation density: punctuation chars / total chars (explicit
    * char class, portable between Java regex and RE2).
    */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast("double") / length(text).cast("double")

  /** Quality score in [0,1]: half stopword-density (fluent text has
    * function words), half length saturation (very short docs score
    * low). A deliberately simple, deterministic heuristic — the point
    * is the operator shape (scalar expression, no shuffle), not the
    * linguistics.
    */
  def qualityScore(tk: Column, stopwords: Seq[String]): Column =
    stopwordRatio(tk, stopwords) * lit(0.5) +
      least(size(tk).cast("double") / lit(100.0), lit(1.0)) * lit(0.5)

  /** Marker-token language ID: count occurrences of per-language
    * marker words, pick the argmax with a fixed tie order
    * (en ≥ de ≥ fr). N-gram-profile LID reduces to the same shape
    * (per-row score + argmax); markers keep the oracle exact.
    */
  val enMarkers = Seq("the", "a", "of", "and", "is", "to")
  val deMarkers = Seq("der", "die", "das", "und", "ist", "zu")
  val frMarkers = Seq("le", "la", "les", "et", "est", "de")

  private def markerCount(tk: Column, markers: Seq[String]): Column =
    size(filter(tk, t => t.isin(markers: _*)))

  def langIdGuess(tk: Column): Column = {
    val en = markerCount(tk, enMarkers)
    val de = markerCount(tk, deMarkers)
    val fr = markerCount(tk, frMarkers)
    when(en >= de && en >= fr, "en").when(de >= fr, "de").otherwise("fr")
  }

  /** Content fingerprint: md5 digest of the normalized text. Two docs
    * with equal fingerprints are byte-identical after normalization —
    * the exact-dedup key at any scale (fingerprints shuffle, documents
    * don't).
    */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** 32-bit SimHash over a precomputed token-hash array `hs`
    * (from [[md5Int32]] per token). Bit b of the result is set iff
    * the +1/-1 vote of all token hashes at bit b is positive.
    * Near-duplicate docs differ in few bits (compare via hamming
    * distance = bit_count(xor)); unlike MinHash it needs no
    * signature join, one long per doc.
    *
    * Native codegen'd Expression ([[graft.functions.SimHash32]]) —
    * the lambda formulation runs 32 interpreted per-bit folds over
    * the token array per row; the native loop is one pass.
    */
  def simhash32(hsCol: String): Column = simhash32(col(hsCol))

  def simhash32(hs: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.SimHash32(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(hs)))

  /** Unicode NFC canonical composition ([[graft.functions
    * .NfcNormalize]] — Spark has no built-in): run FIRST in a
    * text-cleaning chain so fingerprints, tokens, and joins see one
    * codepoint sequence per text.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text)))

  /** Duplicated-window fraction: 1 − distinct/total over an n-gram
    * (shingle) array — the "duplicate n-gram fraction" family of
    * repetition filters used to drop boilerplate/looping text from
    * LLM training corpora (Gopher-style quality signals). Pure
    * per-row HOF arithmetic — zero shuffles at any corpus size.
    * Docs with no windows (shorter than n tokens) score 0.0:
    * nothing is repeated.
    */
  def dupWindowFrac(sh: Column): Column =
    let1(sh) { s =>
      when(size(s) <= 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(s)).cast("double") / size(s).cast("double"))
    }

  /** Type-token ratio: distinct tokens / total tokens — the classic
    * lexical-diversity score (low TTR ⇒ repetitive vocabulary).
    * Empty docs → null (0/0), which callers coalesce as needed.
    */
  def typeTokenRatio(tk: Column): Column =
    let1(tk) { t =>
      size(array_distinct(t)).cast("double") / size(t).cast("double")
    }

  /** Fixed-size sliding chunks over a token array — context-window
    * preparation: starts 1, 1+stride, … ≤ n; each chunk is `chunkLen`
    * tokens (the tail may run short). stride < chunkLen gives
    * overlapping chunks (the usual continuity trick). Returns
    * `array<struct<chunk_text, n_chunk_tokens>>` for the caller to
    * posexplode — per-row fan-out only, no shuffle; token array
    * let-bound so the tokenizer runs once per document, not per
    * chunk.
    */
  def chunks(tk: Column, chunkLen: Int, stride: Int): Column =
    let1(tk) { t =>
      transform(sequence(lit(1), greatest(size(t), lit(1)), lit(stride)), st =>
        struct(
          array_join(slice(t, st, lit(chunkLen)), " ").as("chunk_text"),
          size(slice(t, st, lit(chunkLen))).cast("long").as("n_chunk_tokens")))
    }

  // ---- PII scrubbing (training-data redaction pass) -----------------------
  // Patterns stay in the portable regex subset (char classes,
  // bounded repetition) so Spark's Java regex and the oracle's RE2
  // match the same spans.

  /** Email pattern (pragmatic, not RFC 5322 — redaction favors
    * recall).
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z]{2,}"

  /** US-style short phone pattern NNN-NNNN. */
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** Redact emails then phones with typed placeholders. Email first:
    * a phone-like digit run inside an email local part must vanish
    * with the email, not get double-redacted.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Occurrences of `re` in `text` (audit counter for the redaction
    * report).
    */
  def piiCount(text: Column, re: String): Column =
    regexp_count(text, lit(re)).cast("long")

  /** Vocabulary coverage by MIN-FREQUENCY cutoff: for each candidate
    * cutoff, the surviving type count, the token occurrences those
    * types cover, and the coverage fraction — the table a tokenizer's
    * min_count / vocab-floor decision is read from. Cutoffs (not
    * top-N ranks) keep it rank-free: one corpus pass to word counts
    * (map-side combined), one conditional aggregation over the
    * vocabulary-sized frame, NO window anywhere — nothing serializes
    * through a single task at any corpus size. Integer sums only; the
    * coverage division is one exact-rounded double op.
    */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, textCol: String,
      cutoffs: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(cutoffs.nonEmpty)
    val freq = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val aggs =
      sum(col("n")).as("tot") +:
        cutoffs.flatMap { c =>
          Seq(
            sum(when(col("n") >= c, 1L).otherwise(0L)).as(s"types_$c"),
            sum(when(col("n") >= c, col("n")).otherwise(0L)).as(s"occ_$c"))
        }
    freq.agg(aggs.head, aggs.tail: _*)
      .select(inline(array(cutoffs.map { c =>
        struct(
          lit(c.toLong).as("min_freq"),
          col(s"types_$c").as("n_types"),
          col(s"occ_$c").as("n_occ"),
          (col(s"occ_$c").cast("double") / col("tot").cast("double"))
            .as("occ_coverage"))
      }: _*)))
  }

  // ---- HTML main-content extraction (r16 VERDICT Missing #1) ---------------
  // Every web-corpus pipeline (C4, RefinedWeb, FineWeb) runs a
  // trafilatura-style markup strip + boilerplate drop BEFORE the
  // E5/E1/E2 stages above. The published heuristic family is
  // TEXT-DENSITY block filtering (Kohlschütter et al., "Boilerplate
  // Detection using Shallow Text Features", WSDM 2010): split the
  // page at block-level tag boundaries; a block whose characters are
  // mostly markup (nav link lists, footers, chrome) is boilerplate, a
  // block whose characters are mostly text is content. Everything
  // here is a per-row chain of regexp/HOF built-ins — zero shuffles,
  // scan-bound at 100 TB like the rest of E5, and every regex stays
  // inside the Java∩RE2 common dialect so the DuckDB oracle replays
  // the extraction bit-for-bit (no backreferences, no lookarounds).

  /** Tags that end a text block. Inline tags (a, b, i, em, span, …)
    * deliberately stay INSIDE blocks: their markup chars are what the
    * density test weighs against the block's text.
    */
  private[graft] val BlockTagAlt =
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "section|article|main|header|footer|nav|aside|blockquote|pre|" +
      "form|figure|figcaption|body|html|br|hr"

  private def stripTags(seg: Column): Column =
    regexp_replace(seg, "<[^>]*>", "")

  /** Main-content text of an HTML page:
    *  1. drop non-content subtrees outright (head, script, style,
    *     comments — their text is never content);
    *  2. split at block-level tag boundaries;
    *  3. keep a block iff its tag-stripped text is non-blank AND
    *     text chars make up more than half the block (the density
    *     test, integer arithmetic — no float thresholds to drift
    *     between engines);
    *  4. join kept blocks, decode the five core entities (&amp;
    *     LAST, per the HTML spec's double-escaping rule), collapse
    *     whitespace.
    */
  def htmlMainContent(html: Column): Column = {
    val pre = regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<(?:script|style)\\b[^>]*>.*?</(?:script|style)\\s*>", " "),
        "(?is)<head\\b[^>]*>.*?</head\\s*>", " "),
      "(?s)<!--.*?-->", " ")
    val blocks = split(pre, s"(?i)</?(?:$BlockTagAlt)\\b[^>]*>")
    val kept = filter(blocks, seg =>
      (length(trim(stripTags(seg))) > lit(0)) &&
        (length(stripTags(seg)) * lit(2) > length(seg)))
    val joined = array_join(transform(kept, seg => trim(stripTags(seg))), " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(joined) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** DuckDB replay of [[htmlMainContent]] over a column expression —
    * the same strip/split/density/decode chain in the oracle dialect
    * (string_split_regex + list lambdas; regexes identical).
    */
  def htmlMainContentDuck(htmlExpr: String): String = {
    val pre = "regexp_replace(regexp_replace(regexp_replace(" + htmlExpr +
      """, '(?is)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>', ' ', 'g')""" +
      """, '(?is)<head\b[^>]*>.*?</head\s*>', ' ', 'g')""" +
      """, '(?s)<!--.*?-->', ' ', 'g')"""
    def strip(e: String) = s"regexp_replace($e, '<[^>]*>', '', 'g')"
    val blocks = s"string_split_regex($pre, '(?i)</?(?:$BlockTagAlt)\\b[^>]*>')"
    val kept = s"list_filter($blocks, seg -> length(trim(${strip("seg")})) > 0 " +
      s"AND 2 * length(${strip("seg")}) > length(seg))"
    val joined = s"array_to_string(list_transform($kept, seg -> trim(${strip("seg")})), ' ')"
    val decoded = Seq(
      // SQL-literal spellings: '' is ONE escaped single quote
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(joined) { case (c, (ent, ch)) => s"replace($c, '$ent', '$ch')" }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** Deterministic synthetic page: realistic chrome (head, scripts,
    * nav/footer link lists, a comment) around two content blocks — an
    * entity-bearing tagline and the document body. The chrome blocks
    * all fail the density test; extraction must recover exactly the
    * decoded tagline + body (law-tested, and the e5_html_extract
    * oracle replays the whole wrap+extract chain in DuckDB).
    */
  def htmlWrap(docId: Column, text: Column): Column = concat(
    lit("<html><head><title>d"), docId,
    lit("</title><style>body{margin:0;font:14px sans}</style>" +
      "<script>var page=\"d\"+"), docId, lit(";track(page);</script></head><body>" +
      "<nav><a href=\"/\">home</a> <a href=\"/tags\">tags</a> " +
      "<a href=\"/about\">about</a> <a href=\"/feed\">feed</a></nav>" +
      "<header><img src=\"/logo.png\"/><a href=\"/login\">login</a></header>" +
      "<!-- rendered page shell -->" +
      "<div id=\"main\"><p>doc &quot;d"), docId,
    lit("&quot; &amp; its body:</p><p>"), text,
    lit("</p></div><footer><a href=\"/c\">c</a> <a href=\"/d\">d</a> " +
      "<a href=\"/e\">e</a> <a href=\"/f\">f</a></footer></body></html>"))

  // ---- Within-document repeated-line removal (RefinedWeb-style) -----------
  // Web pages carry repeated boilerplate LINES (nav bars, cookie
  // banners, footers) that survive tag stripping; the standard
  // cleaning rule (RefinedWeb §"line-wise filtering", C4's dedup
  // ancestor) keeps the FIRST occurrence of each exact line and drops
  // the rest. Pure per-row array work — zero shuffles at any scale.

  /** Drop every repeated line (keep first occurrence, preserve
    * order). Returns struct(n_lines, n_dupes, clean) — the line
    * count, dropped count, and the rebuilt text. The split line
    * array and the kept subset are [[let1]]-bound: inlined, the page
    * expression re-evaluates once per line per reference (measured
    * 30×+ on wrapped pages — the tokenizer-inlining trap again).
    */
  def dedupLines(page: Column): Column =
    let1(split(page, "\n")) { ls =>
      let1(filter(
        transform(sequence(lit(1), size(ls)),
          i => struct(i.as("i"), element_at(ls, i).as("l"))),
        s => array_position(ls, s.getField("l")) === s.getField("i"))) { kept =>
        struct(
          size(ls).cast("long").as("n_lines"),
          (size(ls) - size(kept)).cast("long").as("n_dupes"),
          array_join(transform(kept, s => s.getField("l")), "\n").as("clean"))
      }
    }

  /** DuckDB replay of [[dedupLines]] over a page expression: same
    * first-occurrence test (list_position = own index).
    */
  def dedupLinesDuck(pageExpr: String): String = {
    val ls = s"string_split($pageExpr, chr(10))"
    val kept = s"list_filter(list_transform(range(1, len($ls) + 1), " +
      s"i -> {'i': i, 'l': ($ls)[i]}), s -> list_position($ls, s.l) = s.i)"
    s"{'n_lines': CAST(len($ls) AS BIGINT), " +
      s"'n_dupes': CAST(len($ls) - len($kept) AS BIGINT), " +
      s"'clean': array_to_string(list_transform($kept, s -> s.l), chr(10))}"
  }

  /** Deterministic multi-line page around a document (the corpus is
    * single-line, so the fixture SUPPLIES the line structure the way
    * [[htmlWrap]] supplies markup): tokens chunked into 8-token
    * content lines between repeated nav/footer boilerplate lines —
    * nav ×3, footer ×2, so dedup must drop exactly the repeats while
    * every content line (and the doc-unique header) survives.
    */
  def pageWrapLines(docId: Column, text: Column): Column = {
    val tks = tokens(text)
    val content = transform(
      sequence(lit(1), ((size(tks) + lit(7)) / lit(8)).cast("int")),
      i => array_join(slice(tks, (i - lit(1)) * lit(8) + lit(1), lit(8)), " "))
    val nav = lit("home | tags | about | feed")
    val hdr = concat(lit("doc "), docId.cast("string"), lit(" - reader view"))
    val ftr = lit("copyright example corp")
    array_join(
      concat(array(nav, hdr), content, array(nav, ftr, nav, ftr)), "\n")
  }

  /** DuckDB replay of [[pageWrapLines]]. */
  def pageWrapLinesDuck(docIdExpr: String, textExpr: String): String = {
    val tks = s"string_split_regex(trim($textExpr), '\\s+')"
    val content = s"list_transform(range(1, ((len($tks) + 7) // 8) + 1), " +
      s"i -> array_to_string(($tks)[CAST((i-1)*8+1 AS INT):CAST((i-1)*8+8 AS INT)], ' '))"
    "array_to_string(list_concat(list_concat(" +
      s"['home | tags | about | feed', concat('doc ', $docIdExpr, ' - reader view')], " +
      s"$content), ['home | tags | about | feed', 'copyright example corp', " +
      "'home | tags | about | feed', 'copyright example corp']), chr(10))"
  }

  /** DuckDB replay of [[htmlWrap]]. */
  def htmlWrapDuck(docIdExpr: String, textExpr: String): String =
    "concat('<html><head><title>d', " + docIdExpr + ", " +
      "'</title><style>body{margin:0;font:14px sans}</style>" +
      "<script>var page=\"d\"+', " + docIdExpr + ", ';track(page);</script></head><body>" +
      "<nav><a href=\"/\">home</a> <a href=\"/tags\">tags</a> " +
      "<a href=\"/about\">about</a> <a href=\"/feed\">feed</a></nav>" +
      "<header><img src=\"/logo.png\"/><a href=\"/login\">login</a></header>" +
      "<!-- rendered page shell -->" +
      "<div id=\"main\"><p>doc &quot;d', " + docIdExpr + ", " +
      "'&quot; &amp; its body:</p><p>', " + textExpr + ", " +
      "'</p></div><footer><a href=\"/c\">c</a> <a href=\"/d\">d</a> " +
      "<a href=\"/e\">e</a> <a href=\"/f\">f</a></footer></body></html>')"

  // ---- URL canonicalization (the crawl chain's FRONT stage) ----------------
  // Real web pipelines (CommonCrawl → C4/RefinedWeb/FineWeb) dedup by
  // canonicalized URL BEFORE any content pass — the cheapest dedup in
  // the whole chain (pure per-row string work + one keep-first
  // groupBy) removes the bulk of re-crawled pages without ever
  // touching their bytes (r17 VERDICT Missing #2). The rules are the
  // standard RFC 3986 syntax-based normalizations plus the
  // tracking-parameter strip every crawler applies:
  //   scheme + host lowercased; fragment dropped; default port
  //   (http:80 / https:443) dropped; tracking params (utm_*, gclid,
  //   fbclid, msclkid, ref) removed; remaining query params sorted;
  //   trailing slashes stripped (empty path → "/").
  // Everything stays in the portable regex subset (char classes +
  // alternation + anchors) so Java regex and DuckDB's RE2 agree, and
  // the whole chain is a zero-shuffle codegen'd projection.

  private[graft] val TrackingParamRe =
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)="
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Canonical form of an absolute http(s)-style URL — idempotent
    * (law-tested: canon ∘ canon = canon). Every reused sub-value is
    * [[let1]]-bound: inlined, `noFrag` (itself carrying the whole
    * input expression) would re-expand into all five extracts and
    * `hp`/`stripped`/`kept` into each of their references —
    * a multiplicative expression-tree blowup that showed up as
    * multi-second janino compiles per consuming plan, not as row
    * work (the tokenizer-inlining trap, at plan-compile time).
    */
  def canonicalizeUrl(url: Column): Column =
    let1(regexp_replace(url, "#.*$", "")) { noFrag =>
      let1(lower(regexp_extract(noFrag, SchemeRe, 1))) { scheme =>
        let1(lower(regexp_extract(noFrag, SchemeRe + "([^/?#]*)", 2))) { hp =>
          val host = when(scheme === "http", regexp_replace(hp, ":80$", ""))
            .when(scheme === "https", regexp_replace(hp, ":443$", ""))
            .otherwise(hp)
          val path = let1(regexp_replace(
            regexp_extract(noFrag, SchemeRe + "[^/?#]*([^?#]*)", 2), "/+$", "")) {
            stripped => when(length(stripped) === 0, lit("/")).otherwise(stripped)
          }
          val rawQ = regexp_extract(noFrag, "\\?([^#]*)", 1)
          let1(array_join(array_sort(filter(split(rawQ, "&"),
            p => length(p) > 0 && !p.rlike(TrackingParamRe))), "&")) { kept =>
            concat(scheme, lit("://"), host, path,
              when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
          }
        }
      }
    }

  /** DuckDB replay of [[canonicalizeUrl]] over a column expression —
    * the identical step chain in the oracle dialect.
    */
  def canonicalizeUrlDuck(urlExpr: String): String = {
    val noFrag = s"regexp_replace($urlExpr, '#.*$$', '')"
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    def nf(e: String) = e.replace("$URL", noFrag)
    val scheme = nf(s"lower(regexp_extract($$URL, '$schemeRe', 1))")
    val hp = nf(s"lower(regexp_extract($$URL, '$schemeRe([^/?#]*)', 2))")
    val host = s"CASE WHEN $scheme = 'http' THEN regexp_replace($hp, ':80$$', '') " +
      s"WHEN $scheme = 'https' THEN regexp_replace($hp, ':443$$', '') ELSE $hp END"
    val rawPath = nf(s"regexp_extract($$URL, '$schemeRe[^/?#]*([^?#]*)', 2)")
    val stripped = s"regexp_replace($rawPath, '/+$$', '')"
    val path = s"CASE WHEN length($stripped) = 0 THEN '/' ELSE $stripped END"
    val rawQ = nf(s"regexp_extract($$URL, '\\?([^#]*)', 1)")
    val kept = s"array_to_string(list_sort(list_filter(string_split($rawQ, '&'), " +
      s"p -> length(p) > 0 AND NOT regexp_matches(p, '$TrackingParamRe'))), '&')"
    s"concat($scheme, '://', $host, $path, " +
      s"CASE WHEN length($kept) > 0 THEN concat('?', $kept) ELSE '' END)"
  }

  /** Deterministic synthetic URL for a document: realistic crawl
    * variety keyed off the id — mixed-case schemes/hosts, default and
    * explicit ports, trailing slashes, unsorted queries carrying
    * tracking params, fragments. All variety derives from id mod 60,
    * so distinct raw URLs genuinely MERGE under canonicalization
    * (e.g. m=0's `http://…` and m=30's `Http://…` share a canonical
    * form) and the keep-first dedup has real groups at every SF.
    */
  def urlWrap(id: Column): Column = {
    val m = id % 60
    val scheme = when(m % 4 === 0, "http").when(m % 4 === 1, "HTTPS")
      .when(m % 4 === 2, "Http").otherwise("https")
    val host = when(m % 5 === 0, "Example.COM").when(m % 5 === 1, "www.example.com")
      .when(m % 5 === 2, "EXAMPLE.com").when(m % 5 === 3, "docs.Example.org")
      .otherwise("example.com")
    val port = when(m % 6 === 0, ":80").when(m % 6 === 1, ":443")
      .when(m % 6 === 2, ":8080").otherwise("")
    val path = concat(lit("/Docs/item"), (m % 10).cast("string"),
      when(m % 2 === 0, "/").otherwise(""))
    val query = when(m % 3 === 0,
      concat(lit("?utm_source=feed&z=9&a="), (m % 5).cast("string")))
      .when(m % 3 === 1,
        concat(lit("?b=2&utm_campaign=Spring&a="), (m % 5).cast("string")))
      .otherwise(concat(lit("?a="), (m % 5).cast("string"), lit("&gclid=g123&b=2")))
    val frag = when(m % 6 === 0,
      concat(lit("#sec"), (m % 7).cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  // ---- Outlink extraction + host graph (the crawl's OTHER product) --------
  // A crawl yields two corpora: the pages AND the link graph between
  // their hosts — the substrate for host-level quality signals
  // (Common Crawl publishes host-level centrality ranks; CCNet-family
  // pipelines weight sampling by them). Extraction is one
  // regexp_extract_all per page (absolute http(s) hrefs only —
  // relative chrome links are navigation, not endorsements), then the
  // canonicalizer collapses crawl noise before hosts aggregate.

  private[graft] val AbsHrefRe = "href=\"([A-Za-z][A-Za-z0-9+.-]*://[^\"]+)\""

  /** All absolute hrefs of a page, raw (order preserved). */
  def extractLinks(page: Column): Column =
    regexp_extract_all(page, lit(AbsHrefRe), lit(1))

  /** DuckDB replay of [[extractLinks]]. */
  def extractLinksDuck(pageExpr: String): String =
    s"regexp_extract_all($pageExpr, 'href=\"([A-Za-z][A-Za-z0-9+.-]*://[^\"]+)\"', 1)"

  /** The authority (host[:non-default-port]) of a canonical URL. */
  def urlHost(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)

  /** DuckDB replay of [[urlHost]]. */
  def urlHostDuck(canonExpr: String): String =
    s"regexp_extract($canonExpr, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)"

  /** Deterministic synthetic page with OUTLINKS: three absolute
    * anchors (mixed-case schemes/hosts, a default port, tracking
    * params, a fragment — everything the canonicalizer must collapse)
    * to hosts spread over h0..h22.example.net by three co-prime id
    * mixes, plus relative chrome links extraction must IGNORE.
    */
  def outlinkPage(docId: Column, text: Column): Column = {
    val k1 = (docId * 7 + 11) % 23
    val k2 = (docId * 13 + 5) % 23
    val k3 = (docId * 3 + 2) % 23
    val p = docId % 7
    concat(
      lit("<html><body><nav><a href=\"/\">home</a> <a href=\"/about\">about</a></nav><p>"),
      text,
      lit("</p><p>see <a href=\"HTTPS://H"), k1.cast("string"),
      lit(".Example.NET:443/r"), p.cast("string"),
      lit("/\">one</a>, <a href=\"http://h"), k2.cast("string"),
      lit(".example.net/s?utm_source=feed&q="), p.cast("string"),
      lit("\">two</a> and <a href=\"Http://h"), k3.cast("string"),
      lit(".Example.NET:8080/t#frag\">three</a></p></body></html>"))
  }

  /** DuckDB replay of [[outlinkPage]]. */
  def outlinkPageDuck(idExpr: String, textExpr: String): String = {
    val k1 = s"CAST((($idExpr) * 7 + 11) % 23 AS VARCHAR)"
    val k2 = s"CAST((($idExpr) * 13 + 5) % 23 AS VARCHAR)"
    val k3 = s"CAST((($idExpr) * 3 + 2) % 23 AS VARCHAR)"
    val p = s"CAST(($idExpr) % 7 AS VARCHAR)"
    "concat('<html><body><nav><a href=\"/\">home</a> " +
      "<a href=\"/about\">about</a></nav><p>', " + textExpr +
      ", '</p><p>see <a href=\"HTTPS://H', " + k1 +
      ", '.Example.NET:443/r', " + p +
      ", '/\">one</a>, <a href=\"http://h', " + k2 +
      ", '.example.net/s?utm_source=feed&q=', " + p +
      ", '\">two</a> and <a href=\"Http://h', " + k3 +
      ", '.Example.NET:8080/t#frag\">three</a></p></body></html>')"
  }

  /** DuckDB replay of [[urlWrap]]. */
  def urlWrapDuck(idExpr: String): String = {
    val m = s"(($idExpr) % 60)"
    val scheme = s"CASE WHEN $m % 4 = 0 THEN 'http' WHEN $m % 4 = 1 THEN 'HTTPS' " +
      s"WHEN $m % 4 = 2 THEN 'Http' ELSE 'https' END"
    val host = s"CASE WHEN $m % 5 = 0 THEN 'Example.COM' " +
      s"WHEN $m % 5 = 1 THEN 'www.example.com' WHEN $m % 5 = 2 THEN 'EXAMPLE.com' " +
      s"WHEN $m % 5 = 3 THEN 'docs.Example.org' ELSE 'example.com' END"
    val port = s"CASE WHEN $m % 6 = 0 THEN ':80' WHEN $m % 6 = 1 THEN ':443' " +
      s"WHEN $m % 6 = 2 THEN ':8080' ELSE '' END"
    val path = s"concat('/Docs/item', CAST($m % 10 AS VARCHAR), " +
      s"CASE WHEN $m % 2 = 0 THEN '/' ELSE '' END)"
    val query = s"CASE WHEN $m % 3 = 0 THEN concat('?utm_source=feed&z=9&a=', CAST($m % 5 AS VARCHAR)) " +
      s"WHEN $m % 3 = 1 THEN concat('?b=2&utm_campaign=Spring&a=', CAST($m % 5 AS VARCHAR)) " +
      s"ELSE concat('?a=', CAST($m % 5 AS VARCHAR), '&gclid=g123&b=2') END"
    val frag = s"CASE WHEN $m % 6 = 0 THEN concat('#sec', CAST($m % 7 AS VARCHAR)) ELSE '' END"
    s"concat($scheme, '://', $host, $port, $path, $query, $frag)"
  }
}
