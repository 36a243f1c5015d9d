"""Text-analysis operators for training-data pipelines.

North-star surface (BASELINE.json): language ID, quality scoring, token
counting, document fingerprinting. Everything here is a pure SQL
expression (JVM-side, whole-stage codegen) — the point at 100 TB is that
these run *in the scan stage*, adding zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr

# small, fixed stopword lists per language for the n-gram/stopword-hit
# language heuristic (top function words; deterministic, no model files).
# ASCII-only on purpose: the "simple" analyzer splits on [^a-z0-9]+, so an
# accented stopword would never survive tokenization anyway.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "on", "with", "as", "are", "at", "be", "this", "by", "from", "not"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las",
           "un", "una", "por", "con", "no", "para", "es", "al", "lo", "como"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "du", "que", "une",
           "dans", "est", "pour", "qui", "sur", "par", "plus", "pas", "avec", "au"),
    "de": ("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im",
           "auf", "des", "nicht", "ein", "eine", "als", "auch", "es", "an", "dem"),
    "it": ("il", "di", "che", "la", "per", "con", "del", "le", "una", "sono",
           "un", "non", "si", "da", "come", "anche", "alla", "nel", "gli", "dei"),
    "zh": (),  # no-space script: detected by the CJK script ratio instead
}

# Han ideographs (CJK Unified + Extension A). Hiragana/katakana are NOT
# included: they'd mark ja, and this heuristic only claims zh.
_CJK_CLASS = "[一-鿿㐀-䶿]"


def clean_text_expr(col: Column) -> Column:
    """Standard pre-index text normalization, scan-stage:

    1. control chars (C0 minus \\t \\n, plus DEL) removed — they break
       downstream tokenizers and line-based formats;
    2. runs of spaces/tabs collapse to one space;
    3. spaces hugging a newline are dropped (no trailing-space lines);
    4. 3+ consecutive newlines collapse to two (paragraph break survives,
       blank-line spam doesn't);
    5. leading/trailing whitespace trimmed.

    Pure Java-regex column expr (RE2-compatible — the DuckDB oracle runs
    the same patterns); NULL passes through NULL.
    """
    c = F.regexp_replace(col, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    return F.trim(c)


def clean_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Apply ``clean_text_expr`` (in place by default)."""
    return df.withColumn(out_col or text_col, clean_text_expr(F.col(text_col)))


# entity -> replacement; the handful that dominate crawled text (full
# decode needs an entity table; these cover the overwhelming majority).
# &amp; MUST decode LAST: decoding it first would turn escaped markup
# ('&amp;lt;' — HTML shown as code) into '&lt;' and then double-decode
# it to '<' (r3 review)
_HTML_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
)


def strip_html_expr(col: Column) -> Column:
    """Crawled-page text extraction, scan-stage:

    1. ``<script>``/``<style>`` blocks removed WITH their content
       (boilerplate code, not text; (?is) = case-insensitive dotall);
    2. block-level closers/openers (``</p> <br> <div> <li> <h1-6>
       <tr>``) become newlines so paragraph structure survives
       tag removal;
    3. every remaining tag (incl. ``<!-- -->`` comments) dropped;
    4. the dominant character entities decoded (&amp;nbsp; &amp;amp;
       &amp;lt; &amp;gt; &amp;quot; &amp;#39;);
    5. :func:`clean_text_expr` finishes (whitespace/blank-line spam
       introduced by tag removal).

    Pure column expr, same patterns in the DuckDB oracle; NULL passes
    through NULL. Not a full HTML5 parser by design — for an exact DOM
    walk plug a Pandas-UDF extractor in front; this is the cheap
    99%-of-crawl path that runs inside the scan.
    """
    # script/style handled separately — a <(script|style)>...</\1>
    # backreference would break the RE2-portability contract (DuckDB)
    c = F.regexp_replace(col, "(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, "(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, "(?is)<!--.*?-->", " ")
    # tag names need a closing boundary — a bare (p|li|tr)[^>]* would
    # also swallow <pre>, <link>, <track>… (r3 review). RE2 has no
    # lookahead, so the boundary is the (>|[\s/]…>) alternation.
    c = F.regexp_replace(
        c,
        "(?i)</?(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|br)"
        "(>|[\\s/][^>]*>)",
        "\n",
    )
    c = F.regexp_replace(c, "<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # boundary newlines are wrapper-tag artifacts (<body>... -> "\n...")
    return F.regexp_replace(clean_text_expr(c), "^\\n+|\\n+$", "")


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Apply ``strip_html_expr`` (in place by default)."""
    return df.withColumn(out_col or text_col, strip_html_expr(F.col(text_col)))


def token_count_expr(col: Column, analyzer: str = "simple") -> Column:
    """Whitespace/analyzer token count (BPE-ish proxy: tokens ≈ 0.75 words
    is the usual back-of-envelope; we expose the raw count)."""
    return F.size(analyzer_expr(col, analyzer))


# GPT-2-style pretokenizer split, minus the `\s+(?!\S)` lookahead branch so
# the same pattern runs under RE2 (DuckDB oracle) and Java regex (Spark).
# Groups: contractions, optional-space letter runs, digit runs, symbol
# runs, whitespace runs — each match ~ one BPE pretoken.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_expr(col: Column) -> Column:
    """BPE-ish pretoken count: number of pretokenizer-regex matches (the
    usual denominator for tokens-per-doc budgeting in training pipelines;
    an exact BPE vocab merge would need the vocab file — this counts the
    pretokens every BPE starts from)."""
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(BPE_SPLIT_PATTERN), 0)
    )


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """(id, n_tokens, n_distinct, n_bpe_tokens, avg_token_len) — one scan,
    no shuffle."""
    toks = analyzer_expr(F.col(text_col), analyzer)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        bpe_token_count_expr(F.col(text_col)).alias("n_bpe_tokens"),
        (
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.greatest(F.size(toks), F.lit(1)).cast("double")
        ).alias("avg_token_len"),
    )


def quality_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """Per-doc quality signals: length, punctuation ratio, stopword ratio,
    distinct-token ratio, plus a [0,1] composite `quality_score`.

    The composite mirrors common curation heuristics (Gopher/C4-style
    length + repetition + symbol filters) as a deterministic expression.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = analyzer_expr(text, analyzer)
    n_chars = F.length(text)
    n_alnum = F.length(F.regexp_replace(F.lower(text), r"[^a-z0-9]", ""))
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    en_stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))

    punct_ratio = (n_chars - n_alnum).cast("double") / F.greatest(
        n_chars, F.lit(1)
    ).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast(
        "double"
    )
    distinct_ratio = n_distinct.cast("double") / F.greatest(
        n_tokens, F.lit(1)
    ).cast("double")

    length_ok = (n_tokens >= 10) & (n_tokens <= 100000)
    punct_ok = punct_ratio < 0.5
    rep_ok = distinct_ratio > 0.1
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ok, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(rep_ok, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    cjk_threshold: float = 0.3,
) -> DataFrame:
    """Heuristic language ID: stopword-hit counts per language, argmax with
    deterministic tie-break (hit count desc, then language code asc);
    'und' when nothing hits. (id, lang_pred, lang_hits).

    No-space scripts can't be caught by stopword tokens, so zh is detected
    FIRST by script ratio: if ≥ ``cjk_threshold`` of the non-whitespace
    characters are Han ideographs, the doc is 'zh' and lang_hits is the
    ideograph count; otherwise the stopword argmax decides.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = analyzer_expr(text, "simple")
    scores = []
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        if not stops:
            continue
        arr = F.array(*[F.lit(s) for s in stops])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax with deterministic tie-break: sort structs asc on (-hits, lang)
    keyed = F.array(
        *[
            F.struct(
                (-s["hits"]).alias("neg"), s["lang"].alias("lang"), s["hits"].alias("hits")
            )
            for s in scores
        ]
    )
    best = F.sort_array(keyed, asc=True)[0]
    n_cjk = F.length(text) - F.length(F.regexp_replace(text, _CJK_CLASS, ""))
    n_nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    is_zh = (
        n_cjk.cast("double")
        / F.greatest(n_nonspace, F.lit(1)).cast("double")
    ) >= float(cjk_threshold)
    return df.select(
        F.col(id_col),
        F.when(is_zh, F.lit("zh"))
        .when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        F.when(is_zh, n_cjk).otherwise(best["hits"]).alias("lang_hits"),
    )


def content_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """(id, fp_md5, fp_minhash): md5 of the normalized token stream (exact
    content identity up to tokenization) + min token-5-gram hash (a 1-hash
    MinHash sketch: equal for heavily-overlapping docs with prob ≈ J)."""
    from sparksearchengine_spark.operators.dedup import token_ngrams

    toks = analyzer_expr(F.coalesce(F.col(text_col), F.lit("")), analyzer)
    normalized = F.concat_ws(" ", toks)
    grams = token_ngrams(toks, 5)
    minhash = F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("fp_md5"),
        minhash.alias("fp_minhash"),
    )


def winnow_selected(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 4, n: int = 5, analyzer: str = "simple",
) -> DataFrame:
    """The winnowing SELECTION (Schleimer et al. 2003) as data:
    `(id, sel)` — sorted distinct per-window-min k-gram hashes. The
    digest form is :func:`rolling_hash_fingerprint`; the pairwise
    overlap join (`operators/dedup.py::winnow_overlap_pairs`) consumes
    the raw selection."""
    toks = analyzer_expr(F.coalesce(F.col(text_col), F.lit("")), analyzer)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )  # positional (not distinct) k-grams
    # Each stage materializes its array before the next references it:
    # an inline sub-expression inside a transform lambda is RE-EVALUATED
    # per element (HOFs are interpreted, no CSE across lambda calls), which
    # turns the window-min pass into O(G^2) per doc. Bound columns are
    # evaluated once, keeping it O(G * window).
    hashed = df.select(
        F.col(id_col),
        F.transform(grams, lambda g: F.md5(g)).alias("_hashes"),
    )
    h = F.col("_hashes")
    nwin = F.greatest(F.size(h) - (window - 1), F.lit(1))
    window_mins = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    return hashed.select(
        F.col(id_col),
        F.array_sort(F.array_distinct(window_mins)).alias("sel"),
    )


def rolling_hash_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 4, n: int = 5, analyzer: str = "simple",
) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al. 2003): k-gram hashes,
    per-window minima, distinct selected hashes sorted -> md5 digest.
    Pure SQL higher-order functions; (id, fp_winnow, n_selected).

    Gram hash = md5 hex string, window-min = lexicographic min: winnowing
    only needs a uniform total order on hashes, and md5 (unlike xxhash64)
    exists in every engine, so the DuckDB correctness oracle replicates
    this bit-for-bit.
    """
    sel = F.col("sel")
    return winnow_selected(df, text_col, id_col, window, n, analyzer).select(
        F.col(id_col),
        F.md5(F.concat_ws(",", sel)).alias("fp_winnow"),
        F.size(sel).alias("n_selected"),
    )


# --------------------------------------------------------------------------
# Gopher/C4-style repetition signals
# --------------------------------------------------------------------------


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams joined by a single space ('' when len(toks) < n)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_run(sorted_arr: Column) -> Column:
    """(best_count, best_elem) of the most frequent element of a SORTED
    array — single linear run-length pass via aggregate(); ties go to the
    lexicographically smallest element (first maximal run wins because the
    comparison is strict). Struct-state aggregate is CodegenFallback
    (interpreted) but stays per-row in the scan stage: the 100 TB-safe
    alternative to explode + per-doc groupBy, which would shuffle every
    n-gram occurrence."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("bestg"),
    )

    def step(acc, x):  # type: ignore[no-untyped-def]
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestg"]).alias("bestg"),
        )

    return F.aggregate(
        sorted_arr, init, step,
        lambda acc: F.struct(acc["best"].alias("cnt"), acc["bestg"].alias("gram")),
    )


def _dup_chars(sorted_arr: Column) -> Column:
    """Characters inside elements that occur more than once in a SORTED
    array, counting every occurrence (a gram seen c>1 times contributes
    c * length(gram)). Same linear run-length pass as _top_run."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc, x):  # type: ignore[no-untyped-def]
        rep = x == acc["prev"]
        run = F.when(rep, acc["run"] + 1).otherwise(F.lit(1))
        # 2nd occurrence back-credits the 1st: + 2*len; later ones + len
        add = F.when(
            rep & (acc["run"] == 1), F.length(x) * 2
        ).when(rep, F.length(x)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"), run.alias("run"), (acc["dup"] + add).alias("dup")
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["dup"])


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1;
    also used by C4/Dolma/RedPajama curation): documents dominated by a
    repeated n-gram or duplicated lines are low-quality for training.

    Per doc, one scan, zero shuffles (every metric is a per-row
    expression over the token/line arrays):

      top_2gram_char_frac / top_3gram_char_frac
          (count * chars of the most frequent word n-gram) / chars(text);
          ties break to the lexicographically smallest gram.
      dup_5gram_char_frac
          chars inside 5-grams occurring >1 time (every occurrence
          counted) / total 5-gram chars.
      n_lines, frac_dup_lines
          trimmed non-empty lines; fraction = 1 - distinct/total.

    Definitions follow the published filters in spirit; exact
    denominators are pinned here (and mirrored in the DuckDB oracle)
    since the papers leave them implementation-defined.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.coalesce(
        analyzer_expr(text, analyzer), F.array().cast("array<string>")
    )
    n_chars = F.greatest(F.length(text), F.lit(1)).cast("double")

    out = [F.col(id_col)]
    for n in (2, 3):
        top = _top_run(F.array_sort(_ngrams(toks, n)))
        out.append(
            F.round(
                F.when(
                    top["cnt"] > 0,
                    top["cnt"] * F.length(top["gram"]) / n_chars,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"top_{n}gram_char_frac")
        )
    g5 = F.array_sort(_ngrams(toks, 5))
    total5 = F.aggregate(
        g5, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    out.append(
        F.round(
            F.when(
                total5 > 0, _dup_chars(g5).cast("double") / total5
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_5gram_char_frac")
    )
    # split on \r?\n so CRLF documents don't count '\r' filler as lines
    lines = F.filter(
        F.transform(F.split(text, r"\r?\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines)
    out.append(n_lines.cast("long").alias("n_lines"))
    out.append(
        F.round(
            F.when(
                n_lines > 0,
                F.lit(1.0)
                - F.size(F.array_distinct(lines)).cast("double") / n_lines,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("frac_dup_lines")
    )
    return df.select(*out)


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): no lookaround, no backreferences.
# Ordering matters: EMAIL before PHONE so digit runs inside addresses
# aren't re-masked as phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # country code is OPTIONAL: requiring it meant bare 10-digit numbers
    # ('555-123-4567', '(555) 123-4567' — the common US shapes) were
    # never masked, a silent PII leak (r3 review finding)
    ("phone", r"(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mask common PII shapes (emails, SSNs, IPv4s, phone numbers) with
    typed placeholder tokens and report per-category match counts.

    Regex-shape detection only — deliberately conservative, the standard
    first-pass scrub in public curation pipelines (C4 removed lines by
    pattern; Dolma/RedPajama mask emails/IPs/phones the same way). Counts
    are measured on the ORIGINAL text per category (order-independent);
    masking applies sequentially in PII_PATTERNS order. Scan-stage
    expressions, zero shuffles, no UDFs.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = text
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(
        F.col(id_col), scrubbed.alias("text_scrubbed"), *counts
    )


# Gopher rule set (Rae et al. 2021, §A1.1 quality filters). Words are
# WHITESPACE tokens (the paper's definition), not analyzer tokens.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signal_exprs(
    text_expr: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_required_hits: int = 2,
) -> dict[str, Column]:
    """The Gopher signals as named column expressions over a text column —
    the composable form ``gopher_rules`` selects from and the curation
    pipeline inlines (keeping its one-scan plan: a join would be wasted
    on what is pure per-row compute)."""
    text = F.coalesce(text_expr, F.lit(""))
    words = F.filter(F.split(text, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = F.round(
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / safe_words,
        6,
    )
    lines = F.filter(
        # \r?\n so CRLF documents don't count '\r' filler as non-blank
        # lines and dilute the line-fraction rules (r3 review — matches
        # repetition_metrics)
        F.transform(F.split(text, r"\r?\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]"))).cast("double")
        / safe_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / safe_lines,
        6,
    )
    n_symbols = F.regexp_count(text, F.lit(r"#|\.\.\.|…"))
    symbol_word_ratio = F.round(n_symbols.cast("double") / safe_words, 6)
    alpha_word_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / safe_words,
        6,
    )
    required = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    required_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, lambda w: F.lower(w))), required
        )
    )
    gopher_pass = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (symbol_word_ratio <= max_symbol_word_ratio)
        & (alpha_word_frac >= min_alpha_word_frac)
        & (required_hits >= min_required_hits)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "symbol_word_ratio": symbol_word_ratio,
        "alpha_word_frac": alpha_word_frac,
        "required_word_hits": required_hits.cast("int"),
        "gopher_pass": gopher_pass,
    }


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds,
) -> DataFrame:
    """Per-document Gopher quality-rule signals and verdict.

    Emits the measured signal for every rule plus the composite
    ``gopher_pass`` (all rules hold). Signals, per the paper:

    * word count in [min_words, max_words]
    * mean word length in [min, max]
    * fraction of (non-blank) lines starting with a bullet char <= cap
    * fraction of (non-blank) lines ending with an ellipsis <= cap
    * '#'/ellipsis symbols per word <= cap
    * fraction of words containing an alphabetic character >= floor
    * at least ``min_required_hits`` distinct required stop words present

    All pure scan-stage SQL expressions (whole-stage codegen, zero
    shuffles, no UDFs); doubles rounded to 6dp for engine portability.
    NULL text behaves as the empty document. Thresholds are
    ``gopher_signal_exprs`` keyword arguments.
    """
    sig = gopher_signal_exprs(F.col(text_col), **thresholds)
    return df.select(
        F.col(id_col), *[expr.alias(name) for name, expr in sig.items()]
    )


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as one scan-stage pass.

    Line rules (a line survives only if ALL hold):
    * ends in terminal punctuation (. ! ? or a closing double quote)
    * has at least ``min_words_per_line`` whitespace words
    * does not contain the word "javascript" (case-insensitive)

    Page rules (reported as ``c4_keep``; the text is rewritten either way
    so callers can choose filter-then-keep or keep-all-with-verdict):
    * at least ``min_sentences`` sentences in the RETAINED text, counting
      terminal-punctuation boundaries
    * page contains neither "lorem ipsum" (case-insensitive) nor '{'

    Everything is per-row array/regex expressions — no explode, no
    shuffle, whole-stage codegen. The 3-sentence-span dedup from the
    paper is the job of the cross-document dedup family
    (``operators/dedup.py``), not this per-row pass.

    Returns the input columns with ``text_col`` rewritten plus
    ``n_lines_kept``, ``n_lines_dropped``, ``n_sentences``, ``c4_keep``.
    NULL text passes through as NULL with zero counts and c4_keep false.
    """
    sig = c4_signal_exprs(
        F.col(text_col),
        min_words_per_line=min_words_per_line,
        min_sentences=min_sentences,
    )
    out_cols = [c for c in df.columns if c != text_col]
    return df.select(
        *out_cols,
        sig["text"].alias(text_col),
        sig["n_lines_kept"].alias("n_lines_kept"),
        sig["n_lines_dropped"].alias("n_lines_dropped"),
        sig["n_sentences"].alias("n_sentences"),
        sig["c4_keep"].alias("c4_keep"),
    )


def c4_signal_exprs(
    raw: Column,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> dict[str, Column]:
    """The C4 results as named column expressions over a text column —
    the composable form ``c4_filters`` selects from and the curation
    pipeline inlines (keeping its one-scan plan)."""
    text = F.coalesce(raw, F.lit(""))
    # \r?\n: CRLF '\r' residue would defeat the terminal-punct line rule
    # (r3 review — matches repetition_metrics)
    lines = F.transform(F.split(text, r"\r?\n"), lambda l: F.trim(l))
    n_lines = F.size(lines)

    def _line_ok(l):  # type: ignore[no-untyped-def]
        words = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
        return (
            l.rlike(r'[.!?"]$')
            & (words >= min_words_per_line)
            & ~F.lower(l).rlike("javascript")
        )

    kept = F.filter(lines, _line_ok)
    new_text = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(new_text, F.lit(r'[.!?]("|\s|$)'))
    page_ok = (
        (n_sentences >= min_sentences)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return {
        "text": F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(
            new_text
        ),
        "n_lines_kept": F.size(kept),
        "n_lines_dropped": n_lines - F.size(kept),
        "n_sentences": n_sentences,
        "c4_keep": F.coalesce(page_ok & raw.isNotNull(), F.lit(False)),
    }


def readability(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classic readability scores per document — a standard curation
    signal next to the Gopher/C4 rules (too-hard and too-trivial text
    both correlate with low training value):

    ``(id, n_sents, n_words, n_syllables, words_per_sent,
    syll_per_word, flesch, fk_grade)``

    Explicit, engine-mirrorable definitions (no dictionary):

    * words = the FIXTURES §0 tokenizer (lowercase, ``[^a-z0-9]+``
      split) — same vocabulary every other text operator uses;
    * syllables per word = number of ``[aeiouy]+`` vowel groups,
      clamped to ≥ 1 (the standard heuristic, exact enough for a
      corpus-level signal);
    * sentences = ``[.!?]+`` runs in the RAW text, clamped to ≥ 1;
    * Flesch reading ease = 206.835 − 1.015·(W/S) − 84.6·(Syl/W);
      Flesch–Kincaid grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59.

    Zero-word documents get NULL ratios/scores (nothing to measure).
    One scan-stage projection — zero shuffles, rides the corpus scan at
    any scale. The per-word syllable transform is an interpreted HOF,
    O(words) per doc like the other textstats passes.
    """
    toks = analyzer_expr(F.col(text_col), "simple")
    staged = df.select(
        F.col(id_col),
        F.coalesce(toks, F.array().cast("array<string>")).alias("_t"),
        F.greatest(
            F.lit(1),
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(r"[.!?]+"),
                    0,
                )
            ),
        ).cast("long").alias("n_sents"),
    ).select(
        id_col,
        "n_sents",
        F.size("_t").cast("long").alias("n_words"),
        F.aggregate(
            F.transform(
                F.col("_t"),
                lambda w: F.greatest(
                    F.lit(1),
                    F.size(
                        F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)
                    ),
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sents").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast(
        "double"
    )
    nonzero = F.col("n_words") > 0
    return staged.select(
        id_col,
        "n_sents",
        "n_words",
        "n_syllables",
        F.round(F.when(nonzero, wps), 6).alias("words_per_sent"),
        F.round(F.when(nonzero, spw), 6).alias("syll_per_word"),
        F.round(
            F.when(
                nonzero,
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
            ),
            6,
        ).alias("flesch"),
        F.round(
            F.when(
                nonzero,
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
            ),
            6,
        ).alias("fk_grade"),
    )


def readability_ok_expr(
    col: Column,
    min_flesch: float | None = None,
    max_fk_grade: float | None = None,
    analyzer: str = "simple",
) -> Column:
    """Boolean readability gate as a bare Column, for inlining into the
    curation pipeline (`pipeline.curation_flags(readability=...)`) —
    same formulas as :func:`readability`, computed in ONE analyzer pass:
    a single fold accumulates (words, syllables) as a struct, so the
    tokenizer chain runs once per row, not once per metric.

    Zero-word documents FAIL the gate (their scores are undefined —
    same convention as the pipeline's NULL-text quality_ok). With both
    thresholds None the gate is constant True.
    """
    if min_flesch is None and max_fk_grade is None:
        return F.lit(True)
    toks = F.coalesce(
        analyzer_expr(col, analyzer), F.array().cast("array<string>")
    )
    acc = F.aggregate(
        toks,
        F.struct(
            F.lit(0).cast("long").alias("w"), F.lit(0).cast("long").alias("s")
        ),
        lambda a, t: F.struct(
            (a["w"] + 1).alias("w"),
            (
                a["s"]
                + F.greatest(
                    F.lit(1),
                    F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0)),
                )
            ).alias("s"),
        ),
    )
    sents = F.greatest(
        F.lit(1),
        F.size(
            F.regexp_extract_all(
                F.coalesce(col, F.lit("")), F.lit(r"[.!?]+"), 0
            )
        ),
    ).cast("double")
    wps = acc["w"].cast("double") / sents
    spw = acc["s"].cast("double") / acc["w"].cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    ok = acc["w"] > 0
    if min_flesch is not None:
        ok = ok & (flesch >= F.lit(float(min_flesch)))
    if max_fk_grade is not None:
        ok = ok & (fk <= F.lit(float(max_fk_grade)))
    return F.coalesce(ok, F.lit(False))


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """Per-doc token-distribution signals:
    ``(id, n_tokens, n_types, ttr, entropy, norm_entropy)``.

    * ``entropy`` — Shannon entropy of the doc's token distribution in
      nats, computed in the shuffle-friendly form
      ``ln(n) − Σ tf·ln(tf) / n`` (algebraically equal to
      ``−Σ (tf/n)·ln(tf/n)``), so the per-doc aggregation needs only
      two partial-agg'd sums — no window, no second pass.
    * ``norm_entropy`` — entropy / ln(n_types) ∈ [0, 1] (0 when the doc
      has ≤ 1 distinct token): 1 = perfectly uniform usage, → 0 =
      dominated by one token.
    * ``ttr`` — type-token ratio n_types / n_tokens (lexical diversity).

    Low entropy / low ttr flag degenerate repetition; the complement of
    :func:`repetition_metrics`' n-gram signals (those catch structured
    repeats, entropy catches skewed unigram mass). Empty docs return
    all-zero rows, never NULL.

    Plan: one tokenize + explode, ONE groupBy(id, term) partial agg,
    ONE groupBy(id) roll-up — both shuffles keyed on (or prefixed by)
    ``id_col``, no corpus-wide fan-in at any scale.
    """
    from sparksearchengine_spark.operators.dedup import _widen

    toks = analyzer_expr(F.col(text_col), analyzer)
    e = _widen(df).select(
        F.col(id_col), F.explode_outer(toks).alias("term")
    )
    tf = e.groupBy(id_col, "term").agg(
        F.count("term").cast("long").alias("tf")  # null pad row -> 0
    )
    n = F.sum("tf").cast("double")
    s = F.sum(F.col("tf").cast("double") * F.log(F.col("tf").cast("double")))
    n_types = F.sum((F.col("tf") > 0).cast("long"))
    agg = tf.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        n_types.alias("n_types"),
        F.when(n > 0, F.log(n) - s / n).otherwise(F.lit(0.0)).alias(
            "entropy"
        ),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_types",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_types").cast("double")
            / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ttr"),
        "entropy",
        F.when(
            F.col("n_types") > 1,
            F.col("entropy") / F.log(F.col("n_types").cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )


def dedup_lines_expr(raw: Column) -> "dict[str, Column]":
    """Within-document duplicate-line removal as named column
    expressions: ``text`` (first occurrence of each exact line kept, in
    order), ``n_dup_lines`` (lines dropped). The CCNet/C4 "remove
    repeated lines within the page" step — the WITHIN-doc complement of
    the cross-doc :func:`~sparksearchengine_spark.operators.dedup.
    boilerplate_lines` pass. Lines compare verbatim (no trim/casefold —
    normalization is :func:`clean_text`'s job, run it first if wanted).
    ``array_distinct`` keeps first-occurrence order; everything is one
    per-row expression — no explode, no shuffle, codegen."""
    text = F.coalesce(raw, F.lit(""))
    lines = F.split(text, r"\r?\n")
    uniq = F.array_distinct(lines)
    return {
        "text": F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(
            F.array_join(uniq, "\n")
        ),
        "n_dup_lines": (F.size(lines) - F.size(uniq)).cast("long"),
    }


def dedup_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply :func:`dedup_lines_expr`: input columns with ``text_col``
    rewritten (exact duplicate lines dropped, first kept) plus
    ``n_dup_lines``. NULL text stays NULL with a zero count."""
    sig = dedup_lines_expr(F.col(text_col))
    out_cols = [c for c in df.columns if c != text_col]
    return df.select(
        *out_cols,
        sig["text"].alias(text_col),
        sig["n_dup_lines"].alias("n_dup_lines"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-doc zlib compression ratio ``(id, n_bytes, compress_ratio)``
    — ``len(zlib(text)) / len(text)`` over UTF-8 bytes.

    The classic cheap redundancy detector (used alongside the Gopher
    rules in web-corpus cleaning): highly repetitive or templated text
    compresses far below prose (≈0.3–0.4 for English), so BOTH tails
    cut — very low = degenerate repetition, ≈1+ = random/binary soup.
    Complements :func:`token_entropy` (which sees only unigram mass,
    not structure).

    Arrow-batched pandas UDF (zlib is C-speed; the UDF is one
    ``Series.map`` per batch) over a :func:`~sparksearchengine_spark.
    operators.dedup._widen`-ed scan — no shuffle. NULL text → NULL
    ratio; empty text → 1.0 by convention (nothing to compress). The
    ratio is implementation-stable for a fixed zlib ``level`` but NOT a
    cross-engine invariant — registry checks are rows-only, thresholds
    belong in pytest.
    """
    from pyspark.sql.functions import pandas_udf

    from sparksearchengine_spark.operators.dedup import _widen

    lvl = int(level)
    if not (0 <= lvl <= 9):
        raise ValueError(f"zlib level must be in [0, 9], got {level}")

    @pandas_udf("double")
    def _ratio(s):  # type: ignore[no-untyped-def]
        import zlib

        def one(t):  # type: ignore[no-untyped-def]
            if t is None:
                return None
            b = t.encode("utf-8")
            if not b:
                return 1.0
            return len(zlib.compress(b, lvl)) / len(b)

        return s.map(one)

    return _widen(df).select(
        F.col(id_col),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        _ratio(F.col(text_col)).alias("compress_ratio"),
    )


# dictionaries are driver-built literal frames; this bounds the
# broadcast like the search-side query caps (loud, not silent)
DICTIONARY_MAX_PHRASES = 1_000_000


def dictionary_tag(
    df: DataFrame,
    phrases,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """Dictionary / gazetteer tagging at corpus scale (the FlashText /
    Aho-Corasick job, Spark-shaped): match a phrase dictionary against
    every document, ``(id_col, tag, phrase, n_hits)`` per matched
    phrase with occurrence counts.

    ``phrases`` is a ``{phrase: tag}`` dict (PII lexicons, topic
    gazetteers, blocklists — many phrases per tag is fine) or a plain
    iterable (tag = phrase). Phrases are analyzed with the FIELD's
    analyzer so matching is token-exact, never substring ("art" does
    not fire inside "cart"); multi-word phrases match as contiguous
    token n-grams.

    Plan shape: ONE corpus scan builds the token n-grams for every
    distinct phrase LENGTH in the dictionary (one flatten-explode, no
    per-phrase work), the dictionary broadcasts into a single hash
    join, and the per-(doc, phrase) count is a partial agg keyed on
    the doc — dictionary size bounds the broadcast
    (``DICTIONARY_MAX_PHRASES`` loud cap), corpus size bounds nothing
    but the scan. Overlapping occurrences each count (position-sliding
    grams).
    """
    from sparksearchengine_spark.functions.analyzers import tokenize_py
    from sparksearchengine_spark.operators.dedup import _widen

    items = (
        list(phrases.items())
        if isinstance(phrases, dict)
        else [(p, p) for p in phrases]
    )
    if not items:
        raise ValueError("empty phrase dictionary")
    if len(items) > DICTIONARY_MAX_PHRASES:
        raise ValueError(
            f"{len(items)} phrases exceeds DICTIONARY_MAX_PHRASES="
            f"{DICTIONARY_MAX_PHRASES} (the dictionary broadcasts to"
            " every task); shard the dictionary and union the outputs"
        )
    rows = []
    for phrase, tag in items:
        toks = tokenize_py(phrase, analyzer)
        if not toks:
            raise ValueError(
                f"phrase {phrase!r} analyzes to zero tokens under"
                f" {analyzer!r}"
            )
        rows.append((" ".join(toks), phrase, str(tag), len(toks)))
    lengths = sorted({r[3] for r in rows})
    spark = df.sparkSession
    ddf = spark.createDataFrame(
        rows, "gram string, phrase string, tag string, n int"
    ).select("gram", "phrase", "tag")

    def _occ_grams(tokens, n):  # type: ignore[no-untyped-def]
        # occurrence-preserving (no distinct) and STRICT length (no
        # whole-doc fallback — a phrase only matches n-token windows)
        return F.when(
            F.size(tokens) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))

    base = _widen(df).select(
        F.col(id_col),
        analyzer_expr(F.col(text_col), analyzer).alias("_t"),
    )
    grams = F.flatten(
        F.array(*[_occ_grams(F.col("_t"), n) for n in lengths])
    )
    e = base.select(id_col, F.explode(grams).alias("gram"))
    return (
        e.join(F.broadcast(ddf), "gram")
        .groupBy(id_col, "tag", "phrase")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
