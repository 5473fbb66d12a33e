package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.types._
import graft.config._
import graft.core._

/** Corpus-cleaning operators for training-data pipelines (extensions,
  * first-class per the build brief): PII redaction and repetition
  * metrics — the standard pre-training filters described in the Gopher
  * (Rae et al. 2021, §A.1.1) and RefinedWeb (Penedo et al. 2023, §3)
  * dataset papers.
  */
object TextCleaning {

  /** PII pattern table. Patterns are deliberately restricted to the
    * regex-dialect intersection of java.util.regex and RE2 (no lookahead,
    * no backreferences) so the DuckDB oracle can run the IDENTICAL
    * pattern — the generated oracle SQL chains regexp_replace(...,'g') in
    * the same declaration order. Order matters and is part of the
    * contract: SSN and card patterns must fire before the greedier phone
    * pattern eats their digits.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    // (type, pattern, mask token)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("url", "https?://[^\\s]+", "[URL]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("credit_card", "\\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\\b", "[CARD]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
    ("phone", "\\+?[0-9][0-9()\\-\\s.]{6,}[0-9]\\b", "[PHONE]")
  )

  def redact(text: Column, types: Seq[String], mode: String): Column = {
    val selected = piiPatterns.filter { case (t, _, _) => types.contains(t) }
    selected.foldLeft(text) { case (c, (_, pattern, token)) =>
      F.regexp_replace(c, pattern, if (mode == "remove") "" else token)
    }
  }

  /** Count of PII matches (before redaction), for audit columns. */
  def piiCount(text: Column, types: Seq[String]): Column =
    piiPatterns.filter { case (t, _, _) => types.contains(t) }
      .map { case (_, pattern, _) => F.regexp_count(text, F.lit(pattern)) }
      .reduce(_ + _).cast(LongType)
}

/** html.strip — reduce raw HTML to clean text: drop script/style blocks
  * and comments, strip tags (replaced by spaces so words never fuse),
  * decode the common entities, collapse whitespace. The standard first
  * step over web-scraped corpora (every HTML extraction pipeline —
  * trafilatura, jusText, RefinedWeb §3.1 — starts with exactly this
  * block/tag/entity layering; declared deliberately as a REGEX-level
  * strip, not a DOM parser: no JSoup-class jar exists offline, and the
  * oracle must be expressible).
  *
  * Pure codegen'd regexp_replace chain, dialect-restricted to
  * java.util.regex ∩ RE2 like text.redact, so the DuckDB oracle chains
  * the identical patterns. Zero shuffle.
  */
object HtmlStripOp extends Stage {
  val name = "html.strip"
  val kind = StageKind.Transform

  /** (pattern, replacement) chain — order is the contract: blocks before
    * tags (else `<script>` loses its body), entities after tags (so
    * `&lt;b&gt;` decodes to literal text, not a strippable tag). */
  val stripChain: Seq[(String, String)] = Seq(
    ("(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
    ("(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
    ("(?s)<!--.*?-->", " "),
    ("<[^>]+>", " "))

  val entityChain: Seq[(String, String)] = Seq(
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"))

  def strip(html: Column, decodeEntities: Boolean, collapse: Boolean): Column = {
    val tagless = stripChain.foldLeft(html) { case (c, (p, r)) => F.regexp_replace(c, p, r) }
    val decoded =
      if (decodeEntities) entityChain.foldLeft(tagless) { case (c, (p, r)) => F.regexp_replace(c, p, r) }
      else tagless
    if (collapse) F.trim(F.regexp_replace(decoded, "\\s+", " ")) else decoded
  }

  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.strOr("column", "text")
    val out = ctx.cfg.strOr("output_column", col)
    val df = ctx.primary
    df.withColumn(out, strip(df(col),
      ctx.cfg.boolOr("decode_entities", true),
      ctx.cfg.boolOr("collapse_whitespace", true)))
  }
}

/** text.redact — mask or strip PII spans (emails, URLs, SSNs, card
  * numbers, IPs, phone numbers) from a text column. Pure codegen'd
  * regexp_replace chain: per-row projection, no shuffle, pipelines inside
  * the scan's WholeStageCodegen span at any scale. `types` selects and
  * ORDERS nothing — the declaration order of the pattern table governs
  * chaining so overlapping patterns resolve deterministically.
  */
object RedactOp extends Stage {
  val name = "text.redact"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.strOr("column", "text")
    val out = ctx.cfg.strOr("output_column", col)
    val mode = ctx.cfg.strOr("mode", "mask") match {
      case ok @ ("mask" | "remove") => ok
      case other => throw new GraftConfigError(s"text.redact mode must be mask|remove, got '$other'")
    }
    val known = TextCleaning.piiPatterns.map(_._1)
    val types = ctx.cfg.strListOr("types", known.toVector)
    types.filterNot(known.contains).foreach(t =>
      throw new GraftConfigError(s"text.redact: unknown type '$t' (known: ${known.mkString(", ")})"))
    val df = ctx.primary
    // audit count references the PRE-redaction text, so it must be added
    // before out overwrites col (when they are the same column)
    val counted = ctx.cfg.strOpt("count_column") match {
      case Some(cc) => df.withColumn(cc, TextCleaning.piiCount(df(col), types))
      case None     => df
    }
    counted.withColumn(out, TextCleaning.redact(counted(col), types, mode))
  }
}

/** text.repetition — within-document repetition metrics, the Gopher-style
  * repetitious-text filters (duplicate lines, duplicate/top word n-grams).
  * Declared metric definitions (DuckDB oracle states the line metrics
  * identically; n-gram metrics are spec-pinned):
  *
  *   dup_line_frac       = (#lines − #distinct lines) / #lines
  *   dup_line_char_frac  = chars in line occurrences AFTER the first /
  *                         total chars across lines
  *   dup_ngram_frac      = (#ngrams − #distinct ngrams) / #ngrams
  *   top_ngram_char_frac = (most frequent n-gram's count × its length) /
  *                         total text chars
  *
  * Lines split on \n as-is; words = the shared lower/trim/\s+ tokenizer
  * (TextFns.tokens parity). Empty denominators → 0.0.
  *
  * Implementation note: one pass per row in a single UDF rather than
  * exploded arrays + re-aggregation — Catalyst higher-order array lambdas
  * evaluate interpreted per element (CodegenFallback), and an
  * explode/groupBy would shuffle 40+ rows per document; a hash-map pass
  * over the tokens is the scale-correct shape for a per-document metric.
  * Zero shuffle: still a pure projection.
  */
object RepetitionOp extends Stage {
  val name = "text.repetition"
  val kind = StageKind.Transform

  private val outType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("dup_ngram_frac", DoubleType, nullable = false),
    StructField("top_ngram_char_frac", DoubleType, nullable = false)))

  def metrics(text: String, n: Int): Row = {
    if (text == null) return Row(0.0, 0.0, 0.0, 0.0)
    // ---- line metrics
    val lines = text.split("\n", -1)
    val lineCounts = new java.util.HashMap[String, Int]()
    var totalLineChars = 0L
    var dupLineChars = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      totalLineChars += l.length
      val seen = lineCounts.merge(l, 1, Integer.sum)
      if (seen > 1) dupLineChars += l.length
      i += 1
    }
    val nLines = lines.length
    val dupLineFrac =
      if (nLines == 0) 0.0 else (nLines - lineCounts.size).toDouble / nLines
    val dupLineCharFrac =
      if (totalLineChars == 0) 0.0 else dupLineChars.toDouble / totalLineChars
    // ---- word n-gram metrics (tokenizer parity with TextFns.tokens:
    // lower, trim, split \s+)
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    var dupNgramFrac = 0.0
    var topNgramCharFrac = 0.0
    if (toks.length >= n) {
      val ngramCounts = new java.util.HashMap[String, Int]()
      val nNgrams = toks.length - n + 1
      var best: String = null
      var bestCount = 0
      var j = 0
      val sb = new java.lang.StringBuilder
      while (j < nNgrams) {
        sb.setLength(0)
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(j + k)); k += 1 }
        val g = sb.toString
        val c = ngramCounts.merge(g, 1, Integer.sum)
        // ties break to the FIRST n-gram reaching the count (deterministic)
        if (c > bestCount) { bestCount = c; best = g }
        j += 1
      }
      dupNgramFrac = (nNgrams - ngramCounts.size).toDouble / nNgrams
      val totalChars = text.length
      if (totalChars > 0 && best != null && bestCount > 1)
        topNgramCharFrac = math.min(1.0, bestCount.toDouble * best.length / totalChars)
    }
    // metrics stay UNROUNDED: each is one IEEE division of exact integer
    // counts, so an oracle computing the same ratio matches bit-for-bit
    // (rounding would instead have to reconcile half-even vs half-up)
    Row(dupLineFrac, dupLineCharFrac, dupNgramFrac, topNgramCharFrac)
  }

  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.strOr("column", "text")
    val n = ctx.cfg.longOr("ngram", 2L).toInt
    if (n < 1) throw new GraftConfigError("text.repetition ngram must be >= 1")
    val prefix = ctx.cfg.strOr("prefix", "")
    val df = ctx.primary
    // Java UDF API: the typed Scala path cannot express a Row-returning
    // struct UDF, and the untyped one is disallowed by default in Spark 4
    val fn = F.udf(new org.apache.spark.sql.api.java.UDF1[String, Row] {
      override def call(s: String): Row = metrics(s, n)
    }, outType)
    val withS = df.withColumn("_rep", fn(df(col)))
    outType.fields.foldLeft(withS) { (d, f) =>
      d.withColumn(prefix + f.name, F.col(s"_rep.${f.name}"))
    }.drop("_rep")
  }
}

/** dedup.lines — CROSS-document repeated-line removal: lines that occur
  * in >= `min_docs` distinct documents (or >= `min_count` total
  * occurrences with count_mode=rows) are dropped from every document.
  * This is the corpus-level boilerplate filter of RefinedWeb §3.2 /
  * CCNet — navigation bars, cookie banners, "subscribe" footers repeat
  * across pages and survive per-document filters like text.repetition
  * (which is within-doc only).
  *
  * Scale shape (the 100 TB lens): posexplode is narrow; the line-frequency
  * aggregate is one shuffle on the line value with map-side partial
  * counts; the removal join is LEFT ANTI against only the FREQUENT lines
  * (a tiny fraction of distinct lines — AQE broadcasts it when it fits);
  * reassembly is one shuffle on the doc id. No driver-side collection
  * anywhere. Lines shorter than `min_chars` (default 1) are exempt —
  * the empty line repeats across every multi-paragraph document and
  * must not be treated as boilerplate.
  *
  * `id_column` MUST be unique per document: duplicate ids would merge
  * their lines in the groupBy reassembly (interleaved by position) and
  * write the garbled result onto every duplicate row. Run dedup.exact
  * on the id first if uniqueness is not guaranteed.
  *
  * Documents whose every line is boilerplate come back as "" (the row
  * SURVIVES — pair with filter.apply length > 0 to drop husks, mirroring
  * the reference's filter-after-transform composition style).
  */
object DedupLinesOp extends Stage {
  val name = "dedup.lines"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val textCol = ctx.cfg.strOr("column", "text")
    val out = ctx.cfg.strOr("output_column", textCol)
    val id = ctx.cfg.strOr("id_column", "doc_id")
    if (!df.columns.contains(id))
      throw new GraftPlanError(
        s"dedup.lines: id_column '$id' not found (needed to reassemble documents); " +
        s"available: ${df.columns.mkString(", ")}")
    if (out == id)
      throw new GraftConfigError(s"dedup.lines: output_column cannot be the id column '$id'")
    val delim = ctx.cfg.strOr("delimiter", "\n")
    // default 1: the empty line repeats in every multi-paragraph doc and
    // must NOT count as boilerplate, or blank-line structure vanishes
    val minChars = ctx.cfg.longOr("min_chars", 1L).toInt
    val countMode = ctx.cfg.strOr("count_mode", "docs")
    val threshold = countMode match {
      case "docs" => ctx.cfg.longOr("min_docs", 2L)
      case "rows" => ctx.cfg.longOr("min_count", 2L)
      case other  => throw new GraftConfigError(s"dedup.lines count_mode must be docs|rows, got '$other'")
    }

    val lines = df.select(F.col(id),
      F.posexplode(F.split(F.col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("__pos", "__line")))
    val counted =
      if (countMode == "docs") lines.groupBy("__line").agg(F.count_distinct(F.col(id)).alias("__n"))
      else lines.groupBy("__line").agg(F.count(F.lit(1)).alias("__n"))
    val frequent = counted
      .filter(F.col("__n") >= threshold && F.length(F.col("__line")) >= minChars)
      .select("__line")
    val kept = lines.join(frequent, Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy(id).agg(
      F.concat_ws(delim,
        F.transform(F.array_sort(F.collect_list(F.struct(F.col("__pos"), F.col("__line")))),
          x => x.getField("__line"))).alias("__graft_clean"))

    val joined = df.join(rebuilt, Seq(id), "left")
      .withColumn("__graft_clean", F.coalesce(F.col("__graft_clean"), F.lit("")))
    if (out == textCol) joined.withColumn(textCol, F.col("__graft_clean")).drop("__graft_clean")
    else joined.drop(out).withColumnRenamed("__graft_clean", out) // overwrite, never duplicate
  }
}

/** url.normalize — canonicalize URLs for dedup keys and blocklist joins
  * (the C4/CCNet URL-dedup prelude): strip fragment, strip tracking
  * params (utm_*, fbclid, gclid), drop the scheme and leading www.,
  * drop one trailing slash, optionally lowercase. Composes with
  * dedup.exact on the output column for C4-style URL dedup.
  *
  * Pure codegen'd regexp_replace chain (zero shuffle); patterns live in
  * the java.util.regex ∩ RE2 intersection so the oracle chains the
  * IDENTICAL regexes — same discipline as text.redact/html.strip. The
  * three tracking-param rules handle the delimiter cases in order:
  * mid/tail '&p=v', leading '?p=v&' (next param is promoted), lone
  * '?p=v'.
  */
object UrlNormalizeOp extends Stage {
  val name = "url.normalize"
  val kind = StageKind.Transform

  /** (pattern, replacement) chain, applied in declaration order. The
    * (?i) inline flag is the case-insensitivity spelling both
    * java.util.regex and RE2 accept (lowercasing is the LAST step, so
    * the structural rules must match any case themselves). */
  val rules: Seq[(String, String)] = Seq(
    "#.*$"                                        -> "",   // fragment
    "(?i)&(utm_[a-z]+|fbclid|gclid)=[^&]*"        -> "",   // non-leading tracking param
    "(?i)\\?(utm_[a-z]+|fbclid|gclid)=[^&]*&"     -> "?",  // leading, more follow
    "(?i)\\?(utm_[a-z]+|fbclid|gclid)=[^&]*$"     -> "",   // leading, alone
    "(?i)^https?://"                              -> "",   // scheme
    "(?i)^www\\."                                 -> "",   // www prefix
    "/$"                                          -> ""    // trailing slash
  )

  def normalize(c: Column, lowercase: Boolean): Column = {
    val stripped = rules.foldLeft(F.trim(c)) { case (cur, (p, r)) =>
      F.regexp_replace(cur, p, r)
    }
    if (lowercase) F.lower(stripped) else stripped
  }

  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.str("column")
    val out = ctx.cfg.strOr("output_column", "url_norm")
    val lower = ctx.cfg.boolOr("lowercase", true)
    ctx.primary.withColumn(out, normalize(ctx.primary(col), lower))
  }
}

/** text.normalize — unicode canonicalization for corpus text: NFC/NFKC/
  * NFD/NFKD normalization (java.text.Normalizer), optional accent
  * stripping (NFD → drop \p{M} marks → re-normalize), optional ROOT-locale
  * lowercasing. The standard text-canonicalization step before hashing /
  * exact-dedup / n-gram shingling (CCNet normalizes before dedup hashing;
  * minor unicode variants otherwise defeat exact matching).
  *
  * Step order is part of the contract (normalize → strip accents →
  * lowercase) and matches the oracle's
  * lower(strip_accents(nfc_normalize(x))) composition — verified
  * character-for-character against DuckDB's ICU implementations on the
  * Latin-1/Latin-Extended range (ß æ œ ø are correctly NOT stripped by
  * either engine: they are distinct letters, not accented forms).
  * Scala UDF justified: no Catalyst unicode-normalization expression
  * exists; the UDF is a pure per-row map, zero shuffle.
  */
object TextNormalizeOp extends Stage {
  val name = "text.normalize"
  val kind = StageKind.Transform

  private val marks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: String, form: java.text.Normalizer.Form,
                stripAccents: Boolean, lowercase: Boolean): String = {
    if (s == null) return null
    var t = java.text.Normalizer.normalize(s, form)
    if (stripAccents) {
      val decomposed = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
      t = java.text.Normalizer.normalize(marks.matcher(decomposed).replaceAll(""), form)
    }
    if (lowercase) t = t.toLowerCase(java.util.Locale.ROOT)
    t
  }

  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.strOr("column", "text")
    val out = ctx.cfg.strOr("output_column", col)
    val form = ctx.cfg.strOr("form", "nfc").toUpperCase match {
      case f @ ("NFC" | "NFD" | "NFKC" | "NFKD") => java.text.Normalizer.Form.valueOf(f)
      case other => throw new GraftConfigError(s"text.normalize form must be nfc|nfd|nfkc|nfkd, got '$other'")
    }
    val stripAccents = ctx.cfg.boolOr("strip_accents", false)
    val lowercase = ctx.cfg.boolOr("lowercase", false)
    val fn = F.udf((s: String) => normalize(s, form, stripAccents, lowercase))
    ctx.primary.withColumn(out, fn(ctx.primary(col)))
  }
}

/** quality.gopher — the Gopher quality-filter rule set (Rae et al. 2021,
  * §A.1.1), the published rules production corpus pipelines start from:
  *
  *   word count in [min_words, max_words]        (50, 100000)
  *   mean word length in [min/max_mean_word_len] (3, 10)
  *   symbol-to-word ratio (# and ...) <=          max_symbol_ratio (0.1)
  *   bullet-started line fraction <=              max_bullet_frac (0.9)
  *   ellipsis-ended line fraction <=              max_ellipsis_frac (0.3)
  *   fraction of words with an alphabetic char >= min_alpha_frac (0.8)
  *   distinct Gopher stopwords present >=         min_stopwords (2)
  *                (the, be, to, of, and, that, have, with)
  *
  * Emits the metric columns plus a `keep` boolean; mode=filter drops
  * failing rows instead. One single-pass UDF per document (the
  * RepetitionOp pattern — no explode/shuffle, metrics are unrounded
  * integer-ratio doubles for bit-exact oracle parity); the threshold
  * comparisons stay codegen'd Column expressions. Word = \s+-split
  * non-empty token, both here and in the oracle's string_split_regex.
  */
object GopherQualityOp extends Stage {
  val name = "quality.gopher"
  val kind = StageKind.Transform

  val stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val outType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))

  /** Count non-overlapping occurrences of `sub` (replace-delta parity). */
  private def countSub(s: String, sub: String): Long = {
    var n = 0L; var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  def metrics(text: String): Row = {
    if (text == null) return Row(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0L)
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val nWords = words.length.toLong
    val wordChars = words.map(_.length.toLong).sum
    val meanLen = if (nWords == 0) 0.0 else wordChars.toDouble / nWords
    val symbols = countSub(text, "#") + countSub(text, "...")
    val symbolRatio = if (nWords == 0) 0.0 else symbols.toDouble / nWords
    val lines = text.split("\n", -1)
    val nLines = lines.length
    var bullets = 0L; var ellipsis = 0L
    lines.foreach { l =>
      val t = l.dropWhile(c => c == ' ' || c == '\t')
      if (t.nonEmpty && (t.charAt(0) == '-' || t.charAt(0) == '*' || t.charAt(0) == '•')) bullets += 1
      if (l.endsWith("...")) ellipsis += 1
    }
    val alphaWords = words.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val alphaFrac = if (nWords == 0) 0.0 else alphaWords.toDouble / nWords
    val lower = new java.util.HashSet[String]()
    words.foreach(w => lower.add(w.toLowerCase(java.util.Locale.ROOT)))
    val nStop = stopwords.count(lower.contains).toLong
    Row(nWords, meanLen, symbolRatio, bullets.toDouble / nLines, ellipsis.toDouble / nLines,
      alphaFrac, nStop)
  }

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val col = cfg.strOr("column", "text")
    val prefix = cfg.strOr("prefix", "")
    val mode = cfg.strOr("mode", "annotate") match {
      case ok @ ("annotate" | "filter") => ok
      case other => throw new GraftConfigError(s"quality.gopher mode must be annotate|filter, got '$other'")
    }
    val minWords = cfg.longOr("min_words", 50L)
    val maxWords = cfg.longOr("max_words", 100000L)
    val minMean = cfg.doubleOr("min_mean_word_len", 3.0)
    val maxMean = cfg.doubleOr("max_mean_word_len", 10.0)
    val maxSymbol = cfg.doubleOr("max_symbol_ratio", 0.1)
    val maxBullet = cfg.doubleOr("max_bullet_frac", 0.9)
    val maxEllipsis = cfg.doubleOr("max_ellipsis_frac", 0.3)
    val minAlpha = cfg.doubleOr("min_alpha_frac", 0.8)
    val minStop = cfg.longOr("min_stopwords", 2L)

    val fn = F.udf(new org.apache.spark.sql.api.java.UDF1[String, Row] {
      override def call(s: String): Row = metrics(s)
    }, outType)
    val df = ctx.primary
    val withM = outType.fields.foldLeft(df.withColumn("_gq", fn(df(col)))) { (d, f) =>
      d.withColumn(prefix + f.name, F.col(s"_gq.${f.name}"))
    }.drop("_gq")
    def c(n: String) = F.col(prefix + n)
    val keep = c("n_words").between(minWords, maxWords) &&
      c("mean_word_len").between(minMean, maxMean) &&
      c("symbol_ratio") <= maxSymbol &&
      c("bullet_frac") <= maxBullet &&
      c("ellipsis_frac") <= maxEllipsis &&
      c("alpha_frac") >= minAlpha &&
      c("n_stopwords") >= minStop
    if (mode == "filter") withM.filter(keep)
    else withM.withColumn(prefix + "keep", keep)
  }
}

/** filter.lines — line-level corpus filtering inside each document (the
  * C4 line rules, Raffel et al. 2020 §2.2): keep only lines with at
  * least `min_words` words, optionally only lines ending in terminal
  * punctuation (. ! ? "), and drop lines matching any `drop_patterns`
  * regex (the "javascript"/cookie-notice rule). Complements dedup.lines
  * (corpus-frequency) with per-line structural rules — no shuffle at
  * all, one single-pass UDF per document.
  *
  * Contract pinned for the oracle: word = \s+-split non-empty token of
  * the trimmed line; terminal check looks at the trimmed line's last
  * char; drop_patterns use find-anywhere semantics in the
  * java.util.regex ∩ RE2 dialect.
  */
object LineFilterOp extends Stage {
  val name = "filter.lines"
  val kind = StageKind.Transform

  private val terminal = Set('.', '!', '?', '"')

  def clean(text: String, minWords: Int, requireTerminal: Boolean,
            dropPatterns: Seq[java.util.regex.Pattern]): String = {
    if (text == null) return null
    text.split("\n", -1).filter { l =>
      val trimmed = l.trim
      val words = trimmed.split("\\s+").count(_.nonEmpty)
      words >= minWords &&
        (!requireTerminal || (trimmed.nonEmpty && terminal.contains(trimmed.last))) &&
        !dropPatterns.exists(_.matcher(l).find())
    }.mkString("\n")
  }

  def apply(ctx: StageContext): DataFrame = {
    val col = ctx.cfg.strOr("column", "text")
    val out = ctx.cfg.strOr("output_column", col)
    val minWords = ctx.cfg.longOr("min_words", 0L).toInt
    val requireTerminal = ctx.cfg.boolOr("require_terminal_punct", false)
    val patterns = ctx.cfg.strListOr("drop_patterns", Vector.empty)
      .map(java.util.regex.Pattern.compile)
    val fn = F.udf((s: String) => clean(s, minWords, requireTerminal, patterns))
    ctx.primary.withColumn(out, fn(ctx.primary(col)))
  }
}

/** quality.perplexity — unigram language-model perplexity scoring, the
  * CCNet-style quality signal (Wenzek et al. 2020 rank documents by LM
  * perplexity; low = fluent prose, high = gibberish/boilerplate). A full
  * KenLM doesn't ship in this image, so the model is the classic add-alpha
  * unigram LM: p(w) = (c(w) + a) / (N + a*V) with counts from the training
  * corpus (the optional SECOND input; defaults to the scored corpus
  * itself, OOV words get c = 0).
  *
  * Scale shape (the 100 TB lens): explode is narrow; the word-frequency
  * table is one shuffle with map-side partial aggregation (vocabulary-
  * sized result, then its grand totals are a 1-row cross-joined
  * broadcast); scoring is a key-key join on the word (AQE broadcasts the
  * vocab side when it fits) and one shuffle back on the doc id. No
  * driver-side collection, no per-query retraining loop.
  *
  * Cross-engine float discipline: the per-word log-prob is quantized to
  * BIGINT tenths-of-milli-nats BEFORE the per-document sum, so the
  * aggregate is order-independent and exact — a raw DOUBLE sum over
  * shuffled partitions would round differently per run and per engine.
  * The derived doubles (`avg_nll`, `perplexity`) are computed from that
  * exact integer, so both engines see bit-identical inputs.
  *
  * Outputs appended: `ppl_words` (scored token count), `avg_nll`
  * (mean negative log-likelihood, nats/word), `perplexity`
  * (exp(avg_nll)); docs with no tokens carry NULLs. mode=filter keeps
  * rows with perplexity <= max_perplexity (NULL-token docs drop, like a
  * real perplexity filter would).
  */
object PerplexityOp extends Stage {
  val name = "quality.perplexity"
  val kind = StageKind.Transform

  /** quantization: 1e4 steps/nat — coarse enough that a 1-2 ulp ln()
    * difference between JVM and C math libraries can't flip a bucket,
    * fine enough that per-word rounding error (<= 5e-5 nat) is invisible
    * in a per-doc mean. */
  private val Q = 10000.0

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val textCol = cfg.strOr("column", "text")
    val id = cfg.strOr("id_column", "doc_id")
    if (!df.columns.contains(id))
      throw new GraftPlanError(
        s"quality.perplexity: id_column '$id' not found (needed to attach scores); " +
        s"available: ${df.columns.mkString(", ")}")
    val alpha = cfg.doubleOr("smoothing", 0.5)
    if (alpha <= 0.0)
      throw new GraftConfigError(s"quality.perplexity smoothing must be > 0, got $alpha")
    val mode = cfg.strOr("mode", "annotate") match {
      case ok @ ("annotate" | "filter") => ok
      case other => throw new GraftConfigError(
        s"quality.perplexity mode must be annotate|filter, got '$other'")
    }
    val maxPpl = cfg.doubleOr("max_perplexity", 10000.0)
    val trainDf = if (ctx.inputs.size >= 2) ctx.input(1) else df
    if (!trainDf.columns.contains(textCol))
      throw new GraftPlanError(
        s"quality.perplexity: training input lacks text column '$textCol'")

    val words = df.select(F.col(id), F.explode(Shingles.tokens(F.col(textCol))).alias("__w"))
    val trainWords =
      if (trainDf eq df) words.select("__w")
      else trainDf.select(F.explode(Shingles.tokens(F.col(textCol))).alias("__w"))
    val freq = trainWords.groupBy("__w")
      .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    val stats = freq.agg(
      F.sum("__c").alias("__n"),
      F.count(F.lit(1)).cast("double").alias("__v"))

    val p = (F.coalesce(F.col("__c"), F.lit(0.0)) + F.lit(alpha)) /
      (F.col("__n") + F.lit(alpha) * F.col("__v"))
    val perDoc = words
      .join(freq, Seq("__w"), "left") // left: OOV vs a separate training corpus
      .crossJoin(F.broadcast(stats))
      .select(F.col(id), F.round(F.log(p) * Q, 0).cast("long").alias("__lpq"))
      .groupBy(id)
      .agg(F.count(F.lit(1)).alias("ppl_words"), F.sum("__lpq").alias("__slp"))

    // avg_nll stays UNROUNDED: it is a ratio of exact integers, so the
    // IEEE divisions are bit-identical across engines, while round()ing
    // would hit exact .5 decimal boundaries (quantized rationals land on
    // them often) where Spark's BigDecimal-round and DuckDB's decimal-
    // format-round disagree. perplexity = exp(...) differs by ~1 ulp
    // across libm implementations, so THAT one is rounded (3 digits —
    // boundary coincidence odds ~1e-10/doc).
    val nll = -(F.col("__slp").cast("double") / Q) / F.col("ppl_words")
    val out = df.join(perDoc, Seq(id), "left")
      .withColumn("avg_nll", nll)
      .withColumn("perplexity", F.round(F.exp(nll), 3))
      .drop("__slp")
    if (mode == "filter") out.filter(F.col("perplexity") <= maxPpl)
    else out
  }
}

/** chunk.text — split each document into token-budget chunks with
  * overlap: the retrieval/context-window preparation step (one row per
  * chunk), distinct from `chunk.apply` (row batching into arrays) and
  * `pack.sequences` (packing docs INTO fixed sequences for training).
  *
  * Tokens are whitespace words; chunks re-join with single spaces, so
  * text is whitespace-normalized but case/punctuation-preserved. Chunk
  * starts advance by `max_tokens - overlap` and stop once the remaining
  * tokens are covered (a start is generated while it is <= len - overlap
  * - 1, so no chunk is a pure suffix of its predecessor); documents
  * shorter than the budget yield exactly one chunk.
  *
  * Pure projection + explode — zero shuffle, order-free, the 100 TB
  * shape is "as fast as the scan".
  */
object ChunkTextOp extends Stage {
  val name = "chunk.text"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val cfg = ctx.cfg
    val df = ctx.primary
    val col = cfg.strOr("column", "text")
    val out = cfg.strOr("output_column", "chunk")
    val maxTokens = cfg.long("max_tokens").toInt
    if (maxTokens < 1)
      throw new GraftConfigError(s"chunk.text: max_tokens must be >= 1, got $maxTokens")
    val overlap = cfg.longOr("overlap", 0L).toInt
    if (overlap < 0 || overlap >= maxTokens)
      throw new GraftConfigError(
        s"chunk.text: overlap must be in [0, max_tokens), got $overlap of $maxTokens")
    val step = maxTokens - overlap

    val toks = F.split(F.trim(F.col(col)), "\\s+")
    val starts = F.sequence(F.lit(0),
      F.greatest(F.size(toks) - overlap - 1, F.lit(0)), F.lit(step))
    // null text → null array → posexplode emits nothing (no chunks)
    val chunks = F.when(F.col(col).isNotNull,
      F.transform(starts, s => F.slice(toks, s + 1, F.lit(maxTokens))))
    df.withColumn("__chunks", chunks)
      .select(df.columns.map(F.col) :+
        F.posexplode(F.col("__chunks")).as(Seq("chunk_id", "__c")): _*)
      .withColumn(out, F.concat_ws(" ", F.col("__c")))
      .withColumn("n_chunk_tokens", F.size(F.col("__c")).cast("long"))
      .withColumn("chunk_id", F.col("chunk_id").cast("long"))
      .drop("__c", "__chunks")
  }
}

/** text.sentences — sentence segmentation: split on a terminator
  * ([.!?] by default) followed by whitespace, keeping the terminator
  * with its sentence. `mode = explode` (default) emits one row per
  * sentence with a `sentence_id`; `array` appends the sentences as an
  * array column; `count` appends only `n_sentences`. The classic
  * preprocessing primitive ahead of sentence-level dedup
  * (`dedup.lines` on the exploded rows) and sentence-bounded chunking.
  *
  * Pattern discipline: RE2 has no lookbehind, so the split is
  * replace-then-split — `([.!?])\s+` → `$1<SOH>`, then split on the
  * control char — which both java.util.regex and RE2 execute
  * identically (the oracle runs the same two steps). Pure projection /
  * Generate, zero shuffle; null text yields no rows (explode) or null
  * (array/count).
  */
object SentencesOp extends Stage {
  val name = "text.sentences"
  val kind = StageKind.Transform

  def apply(ctx: StageContext): DataFrame = {
    val df = ctx.primary
    val cfg = ctx.cfg
    val col = cfg.strOr("column", "text")
    val terminators = cfg.strOr("terminators", ".!?")
    if (terminators.isEmpty)
      throw new GraftConfigError("text.sentences: terminators must be non-empty")
    // escape for a regex character class
    val cls = terminators.flatMap {
      case c @ ('\\' | ']' | '^' | '-' | '[') => s"\\$c"
      case c => c.toString
    }
    val sep = "\u0001" // SOH: never appears in text corpora
    val marked = F.regexp_replace(F.col(col), s"([$cls])\\s+", "$1" + sep)
    val arr = F.split(marked, sep)
    cfg.strOr("mode", "explode") match {
      case "explode" =>
        val out = cfg.strOr("output_column", "sentence")
        df.select(df.columns.map(F.col) :+
          F.posexplode(arr).as(Seq("sentence_id", out)): _*)
          .withColumn("sentence_id", F.col("sentence_id").cast("long"))
      case "array" =>
        df.withColumn(cfg.strOr("output_column", "sentences"), arr)
      case "count" =>
        df.withColumn(cfg.strOr("output_column", "n_sentences"),
          F.size(arr).cast("long"))
      case other => throw new GraftConfigError(
        s"text.sentences mode must be explode|array|count, got '$other'")
    }
  }
}
