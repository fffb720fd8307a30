package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * Simple transforms are pure `Column` expressions (codegen'd);
  * multi-branch scorers (`langId`, `qualityScore`, `winnowFingerprints`)
  * are one-pass JVM kernels behind Scala UDFs — their HOF forms
  * re-evaluated the interpreted token pipeline once per branch, which
  * at corpus scale costs more than leaving whole-stage codegen. The
  * kernels are the same functions registered on the SQL surface.
  */
object Text {

  /** ASCII punctuation char class, valid in both Java regex (Spark) and
    * RE2 (DuckDB oracle) — deliberately not \p{Punct} for parity. */
  val PunctClass = "[!-/:-@\\[-`{-~]"

  /** Whitespace-token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * non-alphanumeric glyphs each count as one token — a cheap proxy for
    * subword tokenizers' behavior on ASCII text. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Lower-cased whitespace tokens (building block). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PunctClass), lit(0)))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(punctCount(text) / length(text))

  /** Small multilingual stopword lists (public common-words lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "on", "with", "as", "was", "at", "by", "be", "this"),
    "fr" -> Seq("le", "la", "les", "de", "des", "du", "et", "ou", "un", "une",
      "est", "que", "qui", "dans", "pour", "sur", "avec", "au", "ce", "pas"),
    "de" -> Seq("der", "die", "das", "und", "oder", "ein", "eine", "ist",
      "zu", "den", "von", "mit", "auf", "für", "im", "nicht", "sich", "dem",
      "sie", "werden"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "o", "un", "una", "es",
      "que", "en", "por", "para", "con", "no", "se", "del", "al", "como"))

  private def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords(lang))))

  /** Fraction of tokens that are (`lang`) stopwords; 0 for empty text,
    * NULL for NULL. One JVM kernel pass (the HOF form ran the
    * interpreted token filter plus a separate token count per row);
    * the HOF form is kept as [[stopwordRatioExpr]] and spec-asserted
    * equal. */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    require(stopwords.contains(lang), s"unknown stopword language '$lang'")
    udf { (s: String) =>
      if (s == null) null
      else {
        val n = tokenCountScalar(s)
        Double.box(if (n == 0) 0.0
        else stopwordHitsScalar(tokensScalar(s), lang).toDouble / n)
      }
    }.apply(text)
  }

  /** Pure-Column (HOF) form of [[stopwordRatio]] — interpreted
    * CodegenFallback, for cross-checking the kernel only. */
  private[graft] def stopwordRatioExpr(text: Column, lang: String = "en"): Column = {
    val n = tokenCount(text)
    when(n === 0, 0.0).otherwise(stopwordHits(text, lang).cast("double") / n)
  }

  /** Mean token length; 0 for empty text, NULL for NULL. One JVM
    * kernel pass (the HOF form evaluated the interpreted token array
    * twice per row — once for the fold, once for the size); the HOF
    * form is kept as [[meanWordLengthExpr]] and spec-asserted equal. */
  def meanWordLength(text: Column): Column =
    udf { (s: String) =>
      if (s == null) null
      else {
        val toks = tokensScalar(s)
        Double.box(if (toks.isEmpty) 0.0
        else toks.map(_.length.toLong).sum.toDouble / toks.length)
      }
    }.apply(text)

  /** Pure-Column (HOF) form of [[meanWordLength]] — interpreted
    * CodegenFallback, for cross-checking the kernel only. */
  private[graft] def meanWordLengthExpr(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Heuristic document-quality score in [0,1] — the classic cheap filters
    * (length band, punctuation ratio, stopword presence, mean word length)
    * combined with equal weights. One JVM kernel pass per row
    * ([[qualityScoreScalar]], shared with the SQL surface): the pure-
    * Column form re-evaluates the interpreted `tokens`/`tokenCount` HOFs
    * once per component score — O(components × tokens) interpreted work
    * per row at corpus scale (the recompute family behind round 1's
    * MinHash blow-up). The HOF form is kept as [[qualityScoreExpr]] and
    * spec-asserted equal. */
  def qualityScore(text: Column): Column =
    udf { (s: String) =>
      if (s == null) null else Double.box(qualityScoreScalar(s))
    }.apply(text)

  /** Pure-Column (HOF) form of [[qualityScore]] — interpreted
    * CodegenFallback, for cross-checking the kernel only. */
  private[graft] def qualityScoreExpr(text: Column): Column = {
    val n = tokenCount(text)
    // length: 0 below 5 tokens, ramps to 1 at 50+, capped
    val lengthScore = least(n.cast("double") / 50.0, lit(1.0))
    // punctuation: penalize > 10% punct chars
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 10.0)
    // stopwords: having 2%+ English stopwords is a naturalness signal
    val swScore = least(stopwordRatioExpr(text) * 50.0, lit(1.0))
    // word length: natural text averages 3-10 chars/word (the Expr
    // form stays kernel-free so the cross-check is independent)
    val mwl = meanWordLengthExpr(text)
    val wordLenScore = when(mwl >= 3.0 && mwl <= 10.0, 1.0)
      .when(mwl > 0.0, 0.5).otherwise(0.0)
    when(text.isNull, lit(null).cast("double"))
      .when(n === 0, 0.0)
      .otherwise(round((lengthScore + punctScore + swScore + wordLenScore) / 4.0, 4))
  }

  /** N-gram-free language ID: stopword-hit argmax over the supported
    * languages; ties break by the declared order (en first); "und"
    * (undetermined) when the text has no stopword of any language;
    * NULL text yields NULL (like the SQL surface — the old HOF form
    * leaked "und" for NULL). One JVM kernel pass per row
    * ([[langIdScalar]], shared with the SQL surface) — the pure-Column
    * form ran the interpreted `filter(tokens(text))` HOF once per
    * language. The HOF form is kept as [[langIdExpr]] and spec-asserted
    * equal on non-null text. */
  def langId(text: Column): Column =
    udf { (s: String) => if (s == null) null else langIdScalar(s) }.apply(text)

  /** Pure-Column (HOF) form of [[langId]] — interpreted
    * CodegenFallback, for cross-checking the kernel only. */
  private[graft] def langIdExpr(text: Column): Column = {
    val langs = Seq("en", "fr", "de", "es")
    val hits = langs.map(l => stopwordHits(text, l))
    val best = greatest(hits: _*)
    val choice = langs.zip(hits).foldRight(lit("und")) { case ((l, h), rest) =>
      when(h === best, lit(l)).otherwise(rest)
    }
    when(best === 0, "und").otherwise(choice)
  }

  /** Canonical text normalization for fingerprinting/dedup: lowercase,
    * strip ASCII punctuation, collapse whitespace runs, trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), PunctClass, ""), "\\s+", " "))

  /** Unicode normalization + web-text folding — the stage every
    * tokenizer pipeline runs right after the charset decode (the
    * CCNet/Gopher normalize step, public practice): two byte
    * sequences that RENDER identically must not become different
    * tokens or different dedup fingerprints.
    *
    *  - canonical/compat normalization via `java.text.Normalizer`
    *    (`form` = "NFC" | "NFKC" | "NFD" | "NFKD"; NFKC also folds
    *    fullwidth forms and ligatures — `ＡＢＣ` → `ABC`, `ﬁ` → `fi`);
    *  - with `fold` (default): curly quotes → straight (`“”„‟` → `"`,
    *    `‘’‚‛` → `'`), dash family → `-` (en/em/horizontal-bar/minus),
    *    `…` → `...`, NBSP/narrow-NBSP → space, zero-width characters
    *    (ZWSP/ZWNJ/ZWJ/BOM) removed, C0 controls except `\t\n\r` and
    *    all C1 controls removed.
    *
    * One JVM kernel pass after the normalizer call; scalar,
    * shuffle-free; NULL → NULL. Deliberately NO case folding and NO
    * whitespace collapsing — [[normalizeText]] owns fingerprint
    * canonicalization; this is the content-preserving form (battery
    * q125 states every fold closed-form). */
  def normalizeUnicode(text: Column, form: String = "NFC",
                       fold: Boolean = true): Column = {
    require(Seq("NFC", "NFKC", "NFD", "NFKD").contains(form),
      s"unknown normalization form $form")
    udf((s: String) => normalizeUnicodeScalar(s, form, fold)).apply(text)
  }

  /** One fold pass (quotes/dashes/ellipsis/NBSP/zero-width/controls);
    * its output alphabet contains no foldable character, so the pass
    * is idempotent on its own — but REMOVING a character can bring a
    * base letter and a combining mark together, which is the
    * normalizer's job again (see [[normalizeUnicodeScalar]]). */
  private def foldPass(n: String): String = {
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      c match {
        case '\u201C' | '\u201D' | '\u201E' | '\u201F' => sb.append('"')
        case '\u2018' | '\u2019' | '\u201A' | '\u201B' => sb.append('\'')
        case '\u2013' | '\u2014' | '\u2015' | '\u2212' => sb.append('-')
        case '\u2026' => sb.append("...")
        case '\u00A0' | '\u202F' => sb.append(' ')
        case '\u200B' | '\u200C' | '\u200D' | '\uFEFF' => () // zero-width
        case _ if c < ' ' && c != '\t' && c != '\n' && c != '\r' => () // C0
        case _ if c >= '\u007F' && c <= '\u009F' => () // DEL + C1
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private[graft] def normalizeUnicodeScalar(s: String, form: String,
                                            fold: Boolean): String = {
    if (s == null) return null
    val f = java.text.Normalizer.Form.valueOf(form)
    if (!fold) return java.text.Normalizer.normalize(s, f)
    // normalize->fold to FIXPOINT: folding can DELETE a character
    // (zero-width, control) that separated a base letter from its
    // combining mark, creating a composition the normalizer must see
    // only on the NEXT pass -- one pass is not a fixed point and the
    // idempotence downstream fingerprints rest on demands one. After
    // the first pass the expanding fold (ellipsis -> "...") is gone,
    // so every further pass only shrinks; 2 passes settle all
    // practical inputs, the guard covers adversarial nests.
    var cur = s
    var prev: String = null
    var guard = 0
    while (cur != prev && guard < 10) {
      prev = cur
      cur = foldPass(java.text.Normalizer.normalize(cur, f))
      guard += 1
    }
    cur
  }


  /** 64-bit content fingerprint of normalized text (xxhash64 — stable
    * across Spark versions; for cross-engine oracle checks use
    * `fingerprintMd5`). */
  def fingerprint(text: Column): Column = xxhash64(normalizeText(text))

  /** MD5 fingerprint of normalized text — identical in DuckDB. */
  def fingerprintMd5(text: Column): Column = md5(normalizeText(text))

  /** Winnowing fingerprints of normalized text (rolling-hash document
    * fingerprinting, [[graft.operators.Sketches.winnow]]): any shared
    * substring of length ≥ w+k−1 yields a shared fingerprint, and an
    * edit only perturbs fingerprints near it — local-edit robustness
    * the whole-document [[fingerprint]] digest cannot give. One JVM
    * pass per document. */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    udf { (s: String) =>
      if (s == null) null else graft.operators.Sketches.winnow(s, k, w)
    }.apply(text)

  /** Positional k-gram hashes of normalized text (the sequence
    * [[winnowFingerprints]] selects from — see
    * [[graft.operators.Sketches.gramHashes]]); exposed so the winnow
    * selection is oracle-checkable from the raw corpus (q56/q56b). */
  def gramHashes(text: Column, k: Int): Column =
    udf { (s: String) =>
      if (s == null) null else graft.operators.Sketches.gramHashes(s, k)
    }.apply(text)

  /** Character k-shingles of normalized text (building block for MinHash /
    * Jaccard). Returns distinct shingles. */
  def shingles(text: Column, k: Int = 5): Column = {
    val norm = normalizeText(text)
    val n = length(norm)
    array_distinct(
      when(n < k, array(norm)).otherwise(
        transform(sequence(lit(1), n - k + 1), i => norm.substr(i, lit(k)))))
  }

  /** Word n-grams of normalized text (for n-gram Jaccard dedup). */
  def wordNgrams(text: Column, n: Int = 3): Column = {
    val ts = split(normalizeText(text), " ")
    val cnt = size(ts)
    array_distinct(
      when(cnt < n, array(concat_ws(" ", ts))).otherwise(
        transform(sequence(lit(0), cnt - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n))))))
  }

  /** All word n-grams of normalized text with duplicates PRESERVED —
    * the repetition-statistics form ([[wordNgrams]] deduplicates for
    * Jaccard). Texts with fewer than `n` words yield an empty array:
    * they have no n-gram, so they contribute nothing to repetition
    * scores rather than a fake whole-text gram. */
  def wordNgramsAll(text: Column, n: Int = 2): Column = {
    val ts = split(normalizeText(text), " ")
    val cnt = size(ts)
    when(cnt < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), cnt - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** Top n-gram share — the fraction of n-gram occurrences taken by
    * the most frequent one (the second Gopher repetition signal; high
    * values flag templated/looping text). One-pass JVM kernel
    * ([[graft.operators.Sketches.topNgramShare]]): the HOF form would
    * explode every occurrence into a corpus-wide shuffle just to
    * compute a per-document statistic. NULL when the text has fewer
    * than `n` words. Spec-asserted equal to the explode+count form. */
  def topNgramShare(text: Column, n: Int = 2): Column =
    udf { (s: String) =>
      if (s == null) null else graft.operators.Sketches.topNgramShare(s, n)
    }.apply(text)

  /** Duplicate-token fraction `1 − distinct/total` over normalized
    * whitespace tokens — the cheapest Gopher-style repetition signal
    * (high values flag boilerplate/spam for corpus filtering). Pure
    * Column; empty text scores 0. */
  def dupTokenFraction(text: Column): Column = {
    val ts = split(normalizeText(text), " ")
    when(length(normalizeText(text)) === 0, lit(0.0d)).otherwise(
      lit(1.0d) - size(array_distinct(ts)).cast("double") / size(ts))
  }

  /** The 13 Gopher repetition statistics of
    * [[graft.operators.Sketches.repetitionStats]] as a named struct
    * column — exact integer permille values, NULL for NULL text. */
  case class RepStats(dup_para_pm: Long, dup_line_pm: Long,
                      dup_para_char_pm: Long, dup_line_char_pm: Long,
                      top2_pm: Long, top3_pm: Long, top4_pm: Long,
                      dup5_pm: Long, dup6_pm: Long, dup7_pm: Long,
                      dup8_pm: Long, dup9_pm: Long, dup10_pm: Long)

  def repetitionStats(text: Column): Column =
    udf { (s: String) =>
      val a = graft.operators.Sketches.repetitionStats(s)
      if (a == null) null
      else RepStats(a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7), a(8),
        a(9), a(10), a(11), a(12))
    }.apply(text)

  /** The Gopher repetition-rule ladder (Rae et al. 2021 Table A1 —
    * public thresholds), in the paper's order: each entry is
    * `(rule name, [[RepStats]] field, permille ceiling)`; a document
    * is repetition-flagged when the stat EXCEEDS the ceiling. Order
    * matters for first-fail attribution — paragraphs before lines
    * (duplicate paragraphs duplicate their lines too, so the
    * paragraph rule must get first claim), fractions before char
    * fractions, top-grams before dup-grams. */
  val GopherRepetitionRules: Seq[(String, String, Int)] = Seq(
    ("dup_para", "dup_para_pm", 300),
    ("dup_line", "dup_line_pm", 300),
    ("dup_para_char", "dup_para_char_pm", 200),
    ("dup_line_char", "dup_line_char_pm", 200),
    ("top_2gram", "top2_pm", 200),
    ("top_3gram", "top3_pm", 180),
    ("top_4gram", "top4_pm", 160),
    ("dup_5gram", "dup5_pm", 150),
    ("dup_6gram", "dup6_pm", 140),
    ("dup_7gram", "dup7_pm", 130),
    ("dup_8gram", "dup8_pm", 120),
    ("dup_9gram", "dup9_pm", 110),
    ("dup_10gram", "dup10_pm", 100))

  /** First fired Gopher repetition rule of a [[repetitionStats]]
    * struct (NULL when none fires) — the "WHICH rule dropped this
    * doc" column a curation funnel reports. Pure Column ladder over
    * the struct's integer fields; shared by the q171 battery and
    * [[graft.operators.Corpus.gateAttribution]]'s named-repetition
    * mode so the two can never disagree on a threshold. */
  def gopherRepetitionRule(stats: Column): Column =
    GopherRepetitionRules.foldRight(lit(null).cast("string")) {
      case ((name, field, thr), rest) =>
        when(stats.getField(field) > thr, lit(name)).otherwise(rest)
    }

  /** [[RepStats]] field names in kernel-array order — the one place
    * that states the struct-field ↔ array-slot correspondence, so
    * [[gopherFiredRule]] and the Column ladder can never drift. */
  private val RepStatsFields: Seq[String] = Seq(
    "dup_para_pm", "dup_line_pm", "dup_para_char_pm", "dup_line_char_pm",
    "top2_pm", "top3_pm", "top4_pm", "dup5_pm", "dup6_pm", "dup7_pm",
    "dup8_pm", "dup9_pm", "dup10_pm")

  /** Single-kernel form of
    * `gopherRepetitionRule(repetitionStats(text))`: ONE JVM pass
    * computes the 13 stats and walks the same
    * [[GopherRepetitionRules]] ladder in-process, returning the first
    * fired rule name (NULL when none fires, NULL text → NULL).
    *
    * This exists because the Column composition evaluates the stats
    * UDF once per threshold consumer — codegen subexpression
    * elimination does not hoist a common subtree across nested
    * CaseWhen branches, so the 13-`when` ladder re-ran the kernel up
    * to 13× per row (the round-15 q171b defect). Funnel callers
    * ([[graft.operators.Corpus.gateAttribution]]) use this form; the
    * struct form stays for stat REPORTING (q171) where every field is
    * a real output. TextSpec pins the two forms equal over all 26
    * fire/near-miss fixture classes. */
  def gopherFiredRule(text: Column): Column = {
    val ladder = GopherRepetitionRules.map { case (name, field, thr) =>
      val idx = RepStatsFields.indexOf(field)
      require(idx >= 0, s"unknown RepStats field $field")
      (name, idx, thr.toLong)
    }
    udf { (s: String) =>
      val a = graft.operators.Sketches.repetitionStats(s)
      if (a == null) null
      else ladder.collectFirst {
        case (name, idx, thr) if a(idx) > thr => name
      }.orNull
    }.withName("gopher_fired_rule").apply(text)
  }

  // --------------------------------------------- chat-template render

  /** Committed chat-template markers (the public ChatML shape — every
    * serving stack renders messages to one token stream with turn
    * delimiters; committing them as literals makes the rendering a
    * repo fact, not a tokenizer-config lookup). */
  val ChatTurnStart = "<|im_start|>"
  val ChatTurnEnd = "<|im_end|>"

  /** Render a `array<struct<role string, content string>>` message
    * list to the single training/serving string:
    * `<|im_start|>role\ncontent<|im_end|>\n` per turn, in order.
    * NULL roles/contents render as empty rather than nulling the
    * whole conversation (one malformed turn must not erase the
    * document). Pure `aggregate` HOF over the array — codegen,
    * row-local, fuses into the scan. */
  def renderChatMessages(msgs: Column): Column =
    aggregate(msgs, lit(""), (acc, m) =>
      concat(acc, lit(ChatTurnStart),
        coalesce(m.getField("role"), lit("")), lit("\n"),
        coalesce(m.getField("content"), lit("")), lit(ChatTurnEnd),
        lit("\n")))

  /** The PROMPT PREFIX of a rendered conversation — everything up to
    * and including the final turn's `<|im_start|>role\n` header, i.e.
    * the part an SFT mask treats as prompt (train on the final
    * completion only; the q177 recipe). The prefix ends at a
    * WHITESPACE boundary, so a word-bounded tokenizer's ids for the
    * full rendering extend the prefix's ids exactly — tokenizing both
    * and taking `n_tokens(prefix)` as the [[graft.operators.Packing
    * .assembleSftSequences]] boundary is geometry-exact (battery q180
    * pins the chain; TextSpec pins prefix-stability itself). Empty
    * message lists render as an empty prefix. */
  def chatPromptPrefix(msgs: Column): Column =
    when(size(msgs) <= 0, lit(""))
      .otherwise(concat(
        renderChatMessages(slice(msgs, lit(1), size(msgs) - 1)),
        lit(ChatTurnStart),
        coalesce(element_at(msgs, -1).getField("role"), lit("")),
        lit("\n")))

  /** The per-turn SEGMENTS of [[renderChatMessages]] — for each turn,
    * `header` = `<|im_start|>role\n` and `body` = `content<|im_end|>\n`
    * (plus the role for masking decisions). Concatenating every
    * turn's header+body reproduces the rendering exactly (TextSpec
    * pins it), and every segment boundary falls on the `\n` a segment
    * ends with — WHITESPACE — so a word-bounded tokenizer's ids for
    * the full rendering are the concatenation of each segment's ids
    * (the [[chatPromptPrefix]] prefix-stability argument, applied at
    * every boundary). That additivity is what lets multi-turn loss
    * masks derive from per-segment token COUNTS alone
    * ([[turnMaskSpans]]) without re-tokenizing prefixes. Pure
    * `transform` HOF: row-local, codegen, fuses into the scan. */
  def chatTurnUnits(msgs: Column): Column =
    transform(msgs, m => struct(
      coalesce(m.getField("role"), lit("")).as("role"),
      concat(lit(ChatTurnStart), coalesce(m.getField("role"), lit("")),
        lit("\n")).as("header"),
      concat(coalesce(m.getField("content"), lit("")), lit(ChatTurnEnd),
        lit("\n")).as("body")))

  /** Multi-turn SFT loss-mask spans in TOKEN units — the standard
    * multi-turn recipe (public practice in every chat-SFT stack:
    * train on every ASSISTANT turn's content + its end-of-turn
    * marker; mask system/user turns and all role headers): given
    * [[chatTurnUnits]] and the aligned per-turn token counts
    * (`array<struct<header_tokens, body_tokens>>`, from
    * [[graft.operators.Bpe.turnTokenCounts]]), emits
    * `array<struct<start, end>>` half-open spans over the rendered
    * document's token ids — span k covers assistant turn k's body
    * (content + `<|im_end|>`), positioned by prefix-summing the
    * counts (exact by segment additivity; never re-tokenized).
    * Non-assistant turns and empty message lists contribute no
    * spans; NULL inputs yield NULL (the span assembler's
    * unlabeled-document convention). One `aggregate` HOF — row-local,
    * no shuffle. Feed to
    * [[graft.operators.Packing.assembleSftSequencesMultiTurn]]. */
  def turnMaskSpans(units: Column, counts: Column): Column = {
    val emptySpans = array().cast("array<struct<start:bigint,end:bigint>>")
    aggregate(
      zip_with(units, counts, (u, c) => struct(
        u.getField("role").as("role"),
        coalesce(c.getField("header_tokens"), lit(0L)).as("h"),
        coalesce(c.getField("body_tokens"), lit(0L)).as("b"))),
      struct(lit(0L).as("pos"), emptySpans.as("spans")),
      (acc, x) => {
        val pos = acc.getField("pos")
        val s = pos + x.getField("h")
        val e = s + x.getField("b")
        struct(
          e.as("pos"),
          when(x.getField("role") === lit("assistant") && e > s,
            concat(acc.getField("spans"),
              array(struct(s.as("start"), e.as("end")))))
            .otherwise(acc.getField("spans")).as("spans"))
      },
      acc => acc.getField("spans"))
  }

  // ------------------------------------------------ C4 badwords gate

  /** Committed blocklist for the C4 badwords gate (Raffel et al. 2020
    * §2.2 — the public recipe filters pages containing any word from
    * the public "bad words" blocklist; this commits the adult/spam
    * staple subset, and both gates take the full list as a
    * parameter). Committed as a literal so the gate's behavior is a
    * repo fact, not an environment lookup. */
  val C4Badwords: Seq[String] = Seq("sex", "porn", "porno", "xxx",
    "viagra", "casino", "nude", "erotic", "escort", "gambling")

  /** The C4 content gate: TRUE when any WHOLE word of `text` is on
    * the blocklist. Words split on non-alphanumeric runs of the
    * lowercased text — so `free-porn` flags (hyphen is a word
    * boundary, as in C4) while `sussex`/`classy` never do (substring
    * hits are not words). Pure codegen Columns (lower + split +
    * arrays_overlap), no UDF; at 100 TB this fuses into the scan. */
  def containsBlockedWord(text: Column,
                          words: Seq[String] = C4Badwords): Column =
    arrays_overlap(split(lower(text), "[^a-z0-9]+"), typedlit(words))

  /** The C4 URL gate: same whole-token test over the URL's
    * alphanumeric tokens (`best-casino.example.com` flags on its
    * `casino` token — C4 drops by source URL as well as content). */
  def blockedUrl(url: Column, words: Seq[String] = C4Badwords): Column =
    arrays_overlap(split(lower(url), "[^a-z0-9]+"), typedlit(words))

  // --------------------------------------------------- PII scrubbing

  /** RE2-compatible PII patterns (no lookaround, no backreferences) so
    * SQL warehouses state byte-identical semantics; replacement order
    * is email → IPv4 → phone, and the replacement token contains no
    * digits, so passes cannot cascade. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d() .-]{6,}\\d"

  /** Redact emails, IPv4 addresses, and phone-shaped digit runs — the
    * PII scrub pass of a training-data pipeline. Pure `regexp_replace`
    * chain: codegen'd, one projection, no UDF; at 100 TB this is a
    * map-only pass that fuses into whatever scan feeds it. */
  def scrubPii(text: Column, replacement: String = "[PII]"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, replacement),
        Ipv4Re, replacement),
      PhoneRe, replacement)

  /** Match count for one PII pattern (audit/reporting side of the
    * scrub). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Sliding token-window chunks — the context-budget splitter of a
    * training-data pipeline: whitespace tokens, windows of
    * `chunkTokens` starting every `stride` tokens (`stride <
    * chunkTokens` gives overlapping chunks for retrieval; `stride ==
    * chunkTokens` partitions). Returns `array<string>` of chunk texts:
    * empty/blank text yields an empty array, every token lands in at
    * least one chunk, and the last chunk may be short. One JVM pass
    * per document: the HOF form kept the token-array subtree inside
    * the per-chunk lambda, which interpreted evaluation re-runs once
    * per chunk — O(chunks × length) per row (the quantizeInt8 /
    * round-1 HOF-recompute trap; the HOF form survives as
    * [[chunkByTokensExpr]] for the equality spec). Pair with
    * `posexplode` for `(chunk_id, chunk)` rows. */
  def chunkByTokens(text: Column, chunkTokens: Int = 512,
                    stride: Int = 512): Column = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    udf { (s: String) =>
      if (s == null) null
      else {
        val toks = s.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) Array.empty[String]
        else {
          val lastK = math.max(0,
            math.ceil((toks.length - chunkTokens).toDouble / stride).toInt)
          Array.tabulate(lastK + 1)(k =>
            toks.slice(k * stride, k * stride + chunkTokens).mkString(" "))
        }
      }
    }.apply(text)
  }

  /** Pure-Column (HOF) form of [[chunkByTokens]] — interpreted
    * CodegenFallback that re-evaluates the token array per chunk; kept
    * only to cross-check the kernel (TextSpec asserts equality). */
  private[graft] def chunkByTokensExpr(text: Column, chunkTokens: Int = 512,
                                       stride: Int = 512): Column = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    val ts = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    val n = size(ts)
    // last window start: the smallest multiple of stride covering the
    // tail, ceil((n - chunkTokens) / stride) clamped at 0
    val lastK = greatest(ceil((n - chunkTokens).cast("double") / stride)
      .cast("int"), lit(0))
    // explicit null arm: greatest() skips the null token count, so the
    // otherwise-branch would fabricate [""] for null text
    when(text.isNull, lit(null).cast("array<string>"))
      .when(n === 0, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), lastK),
          k => concat_ws(" ", slice(ts, k * stride + 1, lit(chunkTokens)))))
  }

  // ------------------------------------------- SQL-surface scalars (U4)

  private[graft] def tokensScalar(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  /** Space-only trim, matching Spark's `trim` (Java `String.trim` also
    * strips \t/\n/\r and would diverge from the Column form). */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private[graft] def tokenCountScalar(text: String): Int = {
    val t = trimSpaces(text)
    if (t.isEmpty) 0 else t.split("\\s+", -1).length
  }

  private def stopwordHitsScalar(toks: Array[String], lang: String): Int = {
    val set = stopwords(lang).toSet
    toks.count(set.contains)
  }

  private[graft] def langIdScalar(text: String): String = {
    val toks = tokensScalar(text)
    val langs = Seq("en", "fr", "de", "es")
    val hits = langs.map(l => l -> stopwordHitsScalar(toks, l))
    val best = hits.map(_._2).max
    if (best == 0) "und" else hits.find(_._2 == best).get._1
  }

  private[graft] def qualityScoreScalar(text: String): Double = {
    val n = tokenCountScalar(text)
    if (n == 0) return 0.0
    val toks = tokensScalar(text)
    val punct = text.count(c => (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~'))
    val lengthScore = math.min(n / 50.0, 1.0)
    val punctScore = math.max(0.0, 1.0 - (punct.toDouble / text.length) * 10.0)
    val swScore = math.min((stopwordHitsScalar(toks, "en").toDouble / n) * 50.0, 1.0)
    val mwl = if (toks.isEmpty) 0.0 else toks.map(_.length.toLong).sum.toDouble / toks.length
    val wordLenScore = if (mwl >= 3.0 && mwl <= 10.0) 1.0 else if (mwl > 0.0) 0.5 else 0.0
    BigDecimal((lengthScore + punctScore + swScore + wordLenScore) / 4.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private[graft] def fingerprintMd5Scalar(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(graft.operators.Sketches.normalize(text).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Register the text library for the SQL surface — scalar mirrors of
    * the Column forms (TextSpec asserts SQL == Column over the corpus,
    * nulls included). NULL in → NULL out like the Column forms. */
  /** Source-code quality signals — the BigCode/StarCoder "The Stack"
    * file filters (public preprocessing recipe): line-length shape
    * (minified/generated files have huge lines; data blobs have huge
    * averages) and alphanumeric density (binary-ish or
    * symbol-soup files score low). Pure built-in Columns (split /
    * transform / aggregate / regexp_replace), fully inside
    * whole-stage codegen — no UDF — and restatable verbatim in SQL
    * (battery q103). Returns
    * `struct(n_lines, max_line_len, avg_line_len, alnum_frac)`;
    * averages and fractions are `round(·, 4)` so the cross-engine
    * hash compare is robust. Empty text: one empty line, zero
    * lengths, zero density. Compose the keep-rule downstream (q103
    * gates `max ≤ L ∧ avg ≤ A ∧ alnum ≥ F`). */
  /** Deterministic fill-in-the-middle transform (the OpenAI FIM
    * recipe, arXiv:2207.14255, PSM order): for a hash-gated
    * `pFimPct`% of documents, two hash-drawn cut points split the
    * text into prefix/middle/suffix and the document re-emits as
    * `<PRE>prefix<SUF>suffix<MID>middle`, teaching an autoregressive
    * model to infill; the rest pass through raw. Every draw is an
    * md5-prefix integer (the Sampling discipline) keyed on the doc id
    * plus a salt — engine-independent, restatable in any SQL, and
    * stable across runs/partitionings, so the SAME docs transform
    * with the SAME cuts everywhere. Row-local, shuffle-free,
    * codegen-friendly. NULL text passes through NULL. */
  def fimTransform(id: Column, text: Column, pFimPct: Int = 50,
                   preTok: String = "<PRE>", sufTok: String = "<SUF>",
                   midTok: String = "<MID>"): Column = {
    require(pFimPct >= 0 && pFimPct <= 100,
      s"pFimPct must be in [0,100], got $pFimPct")
    def draw(salt: String): Column =
      conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8),
        16, 10).cast("long")
    val len = length(text).cast("long")
    val gate = pmod(draw("fimgate"), lit(100L)) < pFimPct
    val c1 = pmod(draw("fimc1"), len + 1L)
    val c2 = pmod(draw("fimc2"), len + 1L)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    when(text.isNull, lit(null).cast("string"))
      .when(gate,
        concat(lit(preTok), substr(text, lit(1), lo),
          lit(sufTok), substr(text, hi + 1L, len - hi),
          lit(midTok), substr(text, lo + 1L, hi - lo)))
      .otherwise(text)
  }

  def codeStats(text: Column): Column = {
    val lines = split(coalesce(text, lit("")), "\n", -1)
    val lens = transform(lines, l => length(l))
    val total = aggregate(lens, lit(0L), (acc, x) => acc + x)
    val n = size(lines)
    val alnum = length(regexp_replace(coalesce(text, lit("")),
      "[^A-Za-z0-9]", ""))
    val tlen = length(coalesce(text, lit("")))
    struct(
      n.cast("int").as("n_lines"),
      coalesce(array_max(lens), lit(0)).cast("int").as("max_line_len"),
      round(total.cast("double") / n.cast("double"), 4).as("avg_line_len"),
      when(tlen === 0, lit(0.0))
        .otherwise(round(alnum.cast("double") / tlen.cast("double"), 4))
        .as("alnum_frac"))
  }

  /** SPDX-style license-header classification for code corpora (The
    * Stack / StarCoder keep-permissive gate). Detection scans only
    * the first `headerChars` characters — license headers live at the
    * top of a file, a deep accidental phrase hit must not relicense
    * it, and the bound keeps the kernel O(header) per row no matter
    * how large the file. Marker phrases are the license texts' own
    * invariant sentences; ORDER MATTERS: BSD's header ends in the
    * same "all rights reserved" sentence a proprietary notice leads
    * with, so BSD must test first. Pure codegen'd column expressions
    * (lower + contains), no UDF. Returns
    * `struct(license string, permissive boolean)`; `none` (no marker
    * found) is NOT permissive — the conservative default the Stack's
    * gate uses for unlicensed files. */
  def licenseInfo(text: Column, headerChars: Int = 1500): Column = {
    val h = lower(substring(coalesce(text, lit("")), 1, headerChars))
    val license =
      when(h.contains("apache license") && h.contains("version 2.0"),
        lit("apache-2.0"))
      .when(h.contains("gnu general public license"), lit("gpl-3.0"))
      .when(h.contains("permission is hereby granted, free of charge"),
        lit("mit"))
      .when(h.contains("redistribution and use in source and binary forms"),
        lit("bsd-3-clause"))
      .when(h.contains("all rights reserved"), lit("proprietary"))
      .otherwise(lit("none"))
    struct(
      license.as("license"),
      license.isin("mit", "apache-2.0", "bsd-3-clause").as("permissive"))
  }

  def registerSqlFunctions(spark: SparkSession): Unit = {
    // guard PER FUNCTION, not on one proxy name: a long-lived session
    // that registered an older set must still pick up functions added
    // to this method later, and a partially-registered session must
    // complete the set (round-16 ADVICE; the old token_count proxy
    // masked both).  Skipping present functions avoids the
    // SimpleFunctionRegistry "replaced a previously registered
    // function" WARN each repeat would log per battery entry.
    def ifAbsent(name: String)(reg: => Unit): Unit =
      if (!spark.catalog.functionExists(name)) reg
    ifAbsent("token_count")(spark.udf.register("token_count", (s: String) =>
      if (s == null) null else Int.box(tokenCountScalar(s))))
    ifAbsent("lang_id")(spark.udf.register("lang_id", (s: String) =>
      if (s == null) null else langIdScalar(s)))
    ifAbsent("quality_score")(spark.udf.register("quality_score",
      (s: String) =>
        if (s == null) null else Double.box(qualityScoreScalar(s))))
    ifAbsent("normalize_text")(spark.udf.register("normalize_text",
      (s: String) =>
        if (s == null) null else graft.operators.Sketches.normalize(s)))
    ifAbsent("fingerprint_md5")(spark.udf.register("fingerprint_md5",
      (s: String) =>
        if (s == null) null else fingerprintMd5Scalar(s)))
    ifAbsent("stopword_ratio")(spark.udf.register("stopword_ratio",
      (s: String) =>
        if (s == null) null
        else {
          val n = tokenCountScalar(s)
          Double.box(if (n == 0) 0.0
          else stopwordHitsScalar(tokensScalar(s), "en").toDouble / n)
        }))
    ifAbsent("mean_word_length")(spark.udf.register("mean_word_length",
      (s: String) =>
        if (s == null) null
        else {
          val toks = tokensScalar(s)
          Double.box(if (toks.isEmpty) 0.0
          else toks.map(_.length.toLong).sum.toDouble / toks.length)
        }))
    ifAbsent("winnow_fingerprints")(spark.udf.register(
      "winnow_fingerprints", (s: String) =>
        if (s == null) null else graft.operators.Sketches.winnow(s, 5, 4)))
    ifAbsent("minhash_similarity")(spark.udf.register("minhash_similarity",
      (a: Seq[Long], b: Seq[Long]) =>
        if (a == null || b == null) null
        else {
          val n = math.min(a.length, b.length)
          var m = 0
          var i = 0
          while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
          Double.box(m.toDouble / a.length)
        }))
    ifAbsent("normalize_unicode")(spark.udf.register("normalize_unicode",
      (s: String, form: String) =>
        normalizeUnicodeScalar(s, form, fold = true)))
    ifAbsent("scrub_pii")(spark.udf.register("scrub_pii", (s: String) =>
      if (s == null) null
      else s.replaceAll(EmailRe, "[PII]").replaceAll(Ipv4Re, "[PII]")
        .replaceAll(PhoneRe, "[PII]")))
  }
}
