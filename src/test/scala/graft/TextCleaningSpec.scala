package graft

import org.apache.spark.sql.{functions => F}
import graft.config.{Cfg, GraftConfigError}
import graft.core.{GraftPlanError, StageContext}
import graft.operators.{ChunkTextOp, DedupLinesOp, PerplexityOp, RedactOp, RepetitionOp, TextNormalizeOp, UrlNormalizeOp}

/** text.redact + text.repetition — corpus-cleaning extensions. */
class TextCleaningSpec extends SparkSpec {
  import spark.implicits._

  private def redact(text: String, cfg: (String, Any)*): String =
    RedactOp(StageContext.one(spark, Seq(Tuple1(text)).toDF("text"), Cfg.of(cfg: _*)))
      .select("text").as[String].head()

  test("each PII type masks with its token") {
    assert(redact("mail me at jo.doe+x@corp.example.org today") === "mail me at [EMAIL] today")
    assert(redact("see https://ex.com/a?b=1 for docs") === "see [URL] for docs")
    assert(redact("ssn is 123-45-6789 ok") === "ssn is [SSN] ok")
    assert(redact("card 4111 1111 1111 1111 on file") === "card [CARD] on file")
    assert(redact("host 192.168.10.1 up") === "host [IP] up")
    assert(redact("call +1 (415) 555-0137 now") === "call [PHONE] now")
  }

  test("declaration order protects structured digits from the phone pattern") {
    // SSN and card fire before the greedy phone pattern
    assert(redact("id 123-45-6789.") === "id [SSN].")
    assert(redact("pay 4111-1111-1111-1111 thanks") === "pay [CARD] thanks")
  }

  test("type selection, remove mode, audit count") {
    assert(redact("a@b.co and 10.0.0.1", "types" -> Seq("email")) === "[EMAIL] and 10.0.0.1")
    assert(redact("a@b.co!", "mode" -> "remove") === "!")
    val out = RedactOp(StageContext.one(spark,
      Seq(Tuple1("a@b.co or c@d.io at 10.0.0.1")).toDF("text"),
      Cfg.of("types" -> Seq("email", "ip"), "count_column" -> "n_pii")))
    assert(out.select("n_pii").as[Long].head() === 3L)
    intercept[GraftConfigError](redact("x", "types" -> Seq("dna")))
  }

  test("repetition metrics on a hand-computed fixture") {
    // lines: "a b a b" | "x" | "x" → 3 lines, 2 distinct, 9 chars, 1 dup char
    // tokens: a b a b x x → 2-grams: "a b","b a","a b","b x","x x" → 5, 4 distinct
    // top 2-gram "a b" ×2, len 3; text len 11
    val out = RepetitionOp(StageContext.one(spark,
      Seq(Tuple1("a b a b\nx\nx")).toDF("text"), Cfg.of()))
      .select("dup_line_frac", "dup_line_char_frac", "dup_ngram_frac", "top_ngram_char_frac")
      .head()
    assert(out.getDouble(0) === 1.0 / 3)
    assert(out.getDouble(1) === 1.0 / 9)
    assert(out.getDouble(2) === 1.0 / 5)
    assert(out.getDouble(3) === 6.0 / 11)
  }

  test("repetition edge cases: no repeats, single line, short text, ngram config") {
    val clean = RepetitionOp(StageContext.one(spark,
      Seq(Tuple1("one two three")).toDF("text"), Cfg.of()))
      .select("dup_line_frac", "dup_ngram_frac").head()
    assert(clean.getDouble(0) === 0.0)
    assert(clean.getDouble(1) === 0.0)
    // fewer tokens than n → ngram metrics 0
    val short = RepetitionOp(StageContext.one(spark,
      Seq(Tuple1("word")).toDF("text"), Cfg.of("ngram" -> 3)))
      .select("dup_ngram_frac", "top_ngram_char_frac").head()
    assert(short.getDouble(0) === 0.0 && short.getDouble(1) === 0.0)
    // trigram mode counts trigram repeats
    val tri = RepetitionOp(StageContext.one(spark,
      Seq(Tuple1("a b c a b c a b c")).toDF("text"), Cfg.of("ngram" -> 3)))
      .select("dup_ngram_frac").head()
    // 9 toks → 7 trigrams, distinct 3 → 4/7
    assert(tri.getDouble(0) === 4.0 / 7)
    // a top n-gram that occurs once contributes 0 (only REPEATED text counts)
    val once = RepetitionOp(StageContext.one(spark,
      Seq(Tuple1("p q r s")).toDF("text"), Cfg.of()))
      .select("top_ngram_char_frac").head()
    assert(once.getDouble(0) === 0.0)
  }

  test("html.strip: blocks, tags, comments, entities, whitespace") {
    def strip(s: String, cfg: (String, Any)*): String =
      graft.operators.HtmlStripOp(StageContext.one(spark, Seq(Tuple1(s)).toDF("text"),
        Cfg.of(cfg: _*))).select("text").as[String].head()
    assert(strip("<p>Hello <b>world</b></p>") === "Hello world")
    assert(strip("<script>var x = \"<p>\";</script>after") === "after")
    assert(strip("<STYLE type='a'>.x{color:red}</STYLE>ok") === "ok")
    assert(strip("a<!-- hidden\nmultiline -->b") === "a b")
    assert(strip("fish &amp; chips &lt;cheap&gt;") === "fish & chips <cheap>")
    assert(strip("&lt;script&gt;not code&lt;/script&gt;") === "<script>not code</script>")
    assert(strip("a   b\n\n c") === "a b c")
    assert(strip("x &amp; y", "decode_entities" -> false) === "x &amp; y")
    assert(strip("a  b", "collapse_whitespace" -> false) === "a  b")
    // tags become spaces so words never fuse
    assert(strip("one<br>two") === "one two")
  }

  test("prefix option namespaces the metric columns") {
    val out = RepetitionOp(StageContext.one(spark,
      Seq(Tuple1("x\nx")).toDF("text"), Cfg.of("prefix" -> "rep_")))
    assert(out.columns.contains("rep_dup_line_frac"))
    assert(out.select("rep_dup_line_frac").head().getDouble(0) === 0.5)
  }

  // ------------------------------------------------------------ dedup.lines

  private def cleanLines(docs: Seq[(Long, String)], cfg: (String, Any)*): Map[Long, String] =
    DedupLinesOp(StageContext.one(spark, docs.toDF("doc_id", "text"),
      Cfg.of((Seq[(String, Any)]("id_column" -> "doc_id") ++ cfg): _*)))
      .select("doc_id", "text").as[(Long, String)].collect().toMap

  test("dedup.lines removes lines shared across >= min_docs documents, keeps order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha\nfooter"),
      (2L, "COOKIE BANNER\nunique beta\nfooter"),
      (3L, "solo line\nunique gamma"))
    val out = cleanLines(docs)
    assert(out === Map(
      1L -> "unique alpha", 2L -> "unique beta", 3L -> "solo line\nunique gamma"))
  }

  test("dedup.lines: within-doc repeats are ONE doc (docs mode) but count in rows mode") {
    val docs = Seq((1L, "dup\ndup\nkeep"), (2L, "other"))
    // docs mode: 'dup' appears in 1 distinct doc -> kept
    assert(cleanLines(docs)(1L) === "dup\ndup\nkeep")
    // rows mode: 2 total occurrences -> removed
    assert(cleanLines(docs, "count_mode" -> "rows")(1L) === "keep")
  }

  test("dedup.lines: blank lines never count as boilerplate by default") {
    val docs = Seq((1L, "one\n\nalpha"), (2L, "two\n\nbeta"), (3L, "three\n\ngamma"))
    val out = cleanLines(docs)
    assert(out(1L) === "one\n\nalpha", "paragraph structure must survive")
    // output_column overwrites an existing column instead of duplicating it
    val df = Seq((1L, "a\nb", "old"), (2L, "a\nc", "old")).toDF("doc_id", "text", "clean")
    val res = DedupLinesOp(StageContext.one(spark, df, Cfg.of(
      "id_column" -> "doc_id", "output_column" -> "clean")))
    assert(res.columns.count(_ == "clean") === 1)
    intercept[GraftConfigError] {
      DedupLinesOp(StageContext.one(spark, df, Cfg.of(
        "id_column" -> "doc_id", "output_column" -> "doc_id")))
    }
  }

  test("dedup.lines: min_chars exempts short structural lines; empty docs survive as \"\"") {
    val docs = Seq((1L, "--\nbody one"), (2L, "--\nbody two"), (3L, "same\nsame2"), (4L, "same\nsame2"))
    val out = cleanLines(docs, "min_chars" -> 3)
    assert(out(1L) === "--\nbody one") // "--" shared but under min_chars
    assert(out(3L) === "" && out(4L) === "") // all lines boilerplate -> empty, row kept
  }

  test("dedup.lines: custom output column and missing id column error") {
    val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val out = DedupLinesOp(StageContext.one(spark, docs, Cfg.of(
      "id_column" -> "doc_id", "output_column" -> "clean")))
    assert(out.columns.toSeq === Seq("doc_id", "text", "clean"))
    val e = intercept[graft.core.GraftPlanError] {
      DedupLinesOp(StageContext.one(spark, docs, Cfg.of("id_column" -> "nope")))
    }
    assert(e.getMessage.contains("id_column"))
  }

  // ---------------------------------------------------------- url.normalize

  private def norm(url: String, cfg: (String, Any)*): String =
    UrlNormalizeOp(StageContext.one(spark, Seq(Tuple1(url)).toDF("url"),
      Cfg.of((Seq[(String, Any)]("column" -> "url") ++ cfg): _*)))
      .select("url_norm").as[String].head()

  test("url.normalize strips scheme, www, fragment, tracking params, trailing slash") {
    assert(norm("https://www.Example.com/Path/?utm_source=x&id=7&gclid=z#frag") ===
      "example.com/path/?id=7")
    assert(norm("HTTP://WWW.Site.org/a/") === "site.org/a")
    assert(norm("https://site.org/p?utm_medium=em") === "site.org/p")
    assert(norm("https://site.org/p?UTM_Campaign=A&x=1") === "site.org/p?x=1")
    assert(norm("site.org/p#x") === "site.org/p")
  }

  test("url.normalize: lowercase=false preserves case; non-tracking params survive") {
    assert(norm("https://Example.com/Path?id=1&q=Foo", "lowercase" -> false) ===
      "Example.com/Path?id=1&q=Foo")
  }

  // --------------------------------------------------------- text.normalize

  private def tnorm(s: String, cfg: (String, Any)*): String =
    TextNormalizeOp(StageContext.one(spark, Seq(Tuple1(s)).toDF("text"),
      Cfg.of(cfg: _*))).select("text").as[String].head()

  // ----------------------------------------------------------- filter.lines

  test("filter.lines: min words, terminal punctuation, drop patterns") {
    import graft.operators.LineFilterOp
    def fl(text: String, cfg: (String, Any)*): String =
      LineFilterOp(StageContext.one(spark, Seq(Tuple1(text)).toDF("text"),
        Cfg.of(cfg: _*))).select("text").as[String].head()
    val doc = "Good sentence stays here.\nno punct line\nSubscribe to win!\nshort.\n  ok end? "
    assert(fl(doc, "min_words" -> 3, "require_terminal_punct" -> true,
      "drop_patterns" -> Seq("(?i)subscribe")) === "Good sentence stays here.")
    // terminal check trims trailing whitespace; quote counts as terminal
    assert(fl("he said \"done\"\nnope", "require_terminal_punct" -> true) === "he said \"done\"")
    // min_words only
    assert(fl("a b c\nd e", "min_words" -> 3) === "a b c")
    // no rules = identity; null passes through
    assert(fl(doc) === doc)
    val n = LineFilterOp(StageContext.one(spark,
      Seq((1L, null: String)).toDF("id", "text"), Cfg.of()))
    assert(n.select("text").head().isNullAt(0))
  }

  // --------------------------------------------------------- quality.gopher

  test("quality.gopher metrics on a hand-computed fixture") {
    // words: "The cat and the hat ###" → 6 words, 18 chars → mean 3.0
    // symbols: 3 '#' → 3/6; stopwords present: the, and → 2
    val m = graft.operators.GopherQualityOp.metrics("The cat and the hat ###")
    assert(m.getLong(0) === 6L)
    assert(m.getDouble(1) === 3.0)
    assert(m.getDouble(2) === 3.0 / 6)
    assert(m.getDouble(5) === 5.0 / 6) // '###' has no letter
    assert(m.getLong(6) === 2L)
    // lines: bullet + ellipsis fractions
    val l = graft.operators.GopherQualityOp.metrics("  - point\nplain\nwait...")
    assert(l.getDouble(3) === 1.0 / 3)
    assert(l.getDouble(4) === 1.0 / 3)
    // ellipsis counts as one symbol ('...'), non-overlapping
    val e = graft.operators.GopherQualityOp.metrics("a......")
    assert(e.getDouble(2) === 2.0 / 1)
    // null/empty text → all-zero metrics
    assert(graft.operators.GopherQualityOp.metrics(null).getLong(0) === 0L)
    assert(graft.operators.GopherQualityOp.metrics("   ").getLong(0) === 0L)
  }

  test("quality.gopher: keep verdict, filter mode, prefix") {
    val docs = Seq(
      (1L, "the data and the facts that we have kept with care for years"), // passes
      (2L, "x y z"),                                                        // too few words
      (3L, "### the ### and ### that ### have ### with ### more ### tags")  // symbol flood
    ).toDF("doc_id", "text")
    val cfg = Cfg.of("min_words" -> 5, "min_stopwords" -> 2)
    val out = graft.operators.GopherQualityOp(StageContext.one(spark, docs, cfg))
    val keep = out.select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep === Map(1L -> true, 2L -> false, 3L -> false))
    val filtered = graft.operators.GopherQualityOp(StageContext.one(spark, docs,
      Cfg.of("min_words" -> 5, "min_stopwords" -> 2, "mode" -> "filter")))
    assert(filtered.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    val prefixed = graft.operators.GopherQualityOp(StageContext.one(spark, docs,
      Cfg.of("prefix" -> "gq_")))
    assert(prefixed.columns.contains("gq_keep") && prefixed.columns.contains("gq_n_words"))
  }

  test("text.normalize: NFC composition, accent strip, lowercase") {
    // combining acute (e + U+0301) composes to é under NFC
    assert(tnorm("Café") === "Café")
    assert(tnorm("CAFÉ Ñandú", "strip_accents" -> true) === "CAFE Nandu")
    assert(tnorm("CAFÉ Über", "strip_accents" -> true, "lowercase" -> true) === "cafe uber")
    // ß æ œ ø are letters, not accented forms — never stripped
    assert(tnorm("ß æ œ ø", "strip_accents" -> true) === "ß æ œ ø")
    // NFKC folds compatibility forms (ﬁ ligature, fullwidth digits)
    assert(tnorm("ﬁle １２", "form" -> "nfkc") === "file 12")
    intercept[GraftConfigError](tnorm("x", "form" -> "bogus"))
  }

  test("quality.perplexity: hand-checked unigram LM on a 3-doc corpus") {
    // corpus: "a a b" / "a b" / "a c" → counts a=4, b=2, c=1; N=7, V=3
    // alpha=0.5: p(a)=4.5/8.5, p(b)=2.5/8.5, p(c)=1.5/8.5
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = PerplexityOp(StageContext.one(spark, docs, Cfg.of()))
      .orderBy("doc_id").collect()
    def q(x: Double) = Math.round(Math.log(x) * 10000).toDouble / 10000
    val (pa, pb, pc) = (4.5 / 8.5, 2.5 / 8.5, 1.5 / 8.5)
    val exp1 = -(q(pa) + q(pa) + q(pb)) / 3
    val exp3 = -(q(pa) + q(pc)) / 2
    assert(out.map(_.getAs[Long]("ppl_words")).toSeq === Seq(3L, 2L, 2L))
    assert(Math.abs(out(0).getAs[Double]("avg_nll") - exp1) < 1e-9)
    assert(Math.abs(out(2).getAs[Double]("avg_nll") - exp3) < 1e-9)
    // rarer words → higher perplexity; doc 3 (has the rarest word) ranks worst
    val ppl = out.map(_.getAs[Double]("perplexity"))
    assert(ppl(2) > ppl(1) && ppl(1) > ppl(0))
    assert(Math.abs(ppl(0) - Math.round(Math.exp(exp1) * 1000) / 1000.0) < 1e-9)
  }

  test("quality.perplexity: separate training corpus, OOV smoothing, filter mode") {
    val train = Seq(Tuple1("the cat sat"), Tuple1("the dog sat")).toDF("text")
    val score = Seq((1L, "the cat"), (2L, "zebra quux")).toDF("doc_id", "text")
    val ctx = StageContext(spark,
      Seq("score" -> score, "train" -> train), Cfg.of())
    val out = PerplexityOp(ctx).orderBy("doc_id").collect()
    // OOV doc must score much worse than the in-vocab doc
    assert(out(1).getAs[Double]("perplexity") > out(0).getAs[Double]("perplexity") * 2)
    // filter mode keeps only low-perplexity rows (threshold between the two)
    val cut = (out(0).getAs[Double]("perplexity") + out(1).getAs[Double]("perplexity")) / 2
    val kept = PerplexityOp(StageContext(spark,
      Seq("score" -> score, "train" -> train),
      Cfg.of("mode" -> "filter", "max_perplexity" -> cut))).collect()
    assert(kept.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    intercept[GraftPlanError](PerplexityOp(StageContext.one(
      spark, score.drop("doc_id"), Cfg.of())))
    intercept[GraftConfigError](PerplexityOp(StageContext.one(
      spark, score, Cfg.of("smoothing" -> 0.0))))
  }

  test("chunk.text: budget, overlap, suffix suppression, short docs") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "short doc"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = ChunkTextOp(StageContext.one(spark, docs, Cfg.of(
      "max_tokens" -> 8L, "overlap" -> 4L)))
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect()
    assert(got === Array(
      // starts advance by 4 and stop at len-overlap-1=5 → starts 0, 4
      (1L, 0L, "t1 t2 t3 t4 t5 t6 t7 t8", 8L),
      (1L, 1L, "t5 t6 t7 t8 t9 t10", 6L),
      (2L, 0L, "short doc", 2L),
      (3L, 0L, "", 1L))) // empty text = one empty-token chunk (split semantics)
    // overlap tokens really repeat across consecutive chunks
    assert(got(1)._3.startsWith("t5 t6 t7 t8"))
    // null text yields no chunks; whitespace normalizes, case survives
    val edge = ChunkTextOp(StageContext.one(spark,
      Seq((1L, "A  B\t C"), (2L, null)).toDF("doc_id", "text"),
      Cfg.of("max_tokens" -> 2L)))
    assert(edge.count() === 2L)
    assert(edge.orderBy("chunk_id").select("chunk").as[String].collect() ===
      Array("A B", "C"))
    intercept[GraftConfigError](ChunkTextOp(StageContext.one(spark, docs,
      Cfg.of("max_tokens" -> 4L, "overlap" -> 4L))))
  }

  test("text.sentences: explode/array/count modes, terminator handling") {
    val docs = Seq(
      (1L, "First one. Second two!  Third three? tail without end"),
      (2L, "no terminators at all"),
      (3L, "Ends cleanly."),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = graft.operators.SentencesOp(StageContext.one(spark, docs, Cfg.of()))
      .select("doc_id", "sentence_id", "sentence")
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got === Array(
      (1L, 0L, "First one."), (1L, 1L, "Second two!"),
      (1L, 2L, "Third three?"), (1L, 3L, "tail without end"),
      (2L, 0L, "no terminators at all"),
      (3L, 0L, "Ends cleanly."))) // trailing terminator: no empty sentence
    val counted = graft.operators.SentencesOp(StageContext.one(spark, docs,
      Cfg.of("mode" -> "count"))).orderBy("doc_id")
      .select("n_sentences").collect()
    assert(counted.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq ===
      Seq(4L, 1L, 1L, -1L)) // null text → null count
    val arr = graft.operators.SentencesOp(StageContext.one(spark, docs,
      Cfg.of("mode" -> "array"))).filter($"doc_id" === 1L)
      .select(F.size(F.col("sentences"))).head().getInt(0)
    assert(arr === 4)
    intercept[GraftConfigError](graft.operators.SentencesOp(
      StageContext.one(spark, docs, Cfg.of("terminators" -> ""))))
  }
}
