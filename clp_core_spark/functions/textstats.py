"""Text-analysis functions for corpus curation: token counting, quality
scoring, language ID, and document fingerprinting.

Every function here is a pure JVM Column expression (built-in
pyspark.sql.functions only — whole-stage-codegen'd, no Python in the row
path), and each has an exact ANSI-SQL twin so results are oracle-checkable
in DuckDB. CLP analog: these are "scalar functions" in the sense of
SURVEY.md §2.7 — deterministic per-row derivations used by routing and
filtering stages.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# A small function-word profile per language; language ID is the argmax of
# marker-word hits (n-gram-free variant of the classic stopword profile).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by"]


def token_count_ws(text: Column) -> Column:
    """Whitespace token count. SQL twin: len(string_split(text, ' '))."""
    return F.size(F.split(text, " "))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: count of maximal runs of word chars plus
    standalone non-space punctuation (regexp-based, engine-agnostic).
    SQL twin: len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9 ]"), F.lit(0)))


def _count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def marker_hits(text: Column, words: list[str]) -> Column:
    """How many tokens of ``text`` are in ``words`` (word-boundary exact).
    SQL twin: len(list_filter(string_split(text,' '), w -> w IN (...)))."""
    toks = F.split(text, " ")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """argmax over LANG_MARKERS of marker hits; ties broken by language
    code order; zero hits => 'unknown'."""
    best_lang = F.lit("unknown")
    best_hits = F.lit(0)
    for code in sorted(LANG_MARKERS):
        hits = marker_hits(text, LANG_MARKERS[code])
        better = hits > best_hits
        best_lang = F.when(better, F.lit(code)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + alpha ratio + stopword
    presence (the standard cheap pretraining-corpus filters). Exact
    integer/ratio arithmetic so SQL twins agree bit-for-bit after
    round(...,6)."""
    n_chars = F.length(text)
    n_alpha = _count_matches(text, "[A-Za-z]")
    n_tokens = token_count_ws(text)
    stop_ratio = marker_hits(text, STOPWORDS_EN) / F.greatest(n_tokens, F.lit(1))
    alpha_ratio = n_alpha / F.greatest(n_chars, F.lit(1))
    len_band = (
        F.when((n_chars >= 64) & (n_chars <= 4096), F.lit(1.0))
        .when(n_chars > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    score = len_band * 0.4 + alpha_ratio * 0.4 + F.least(stop_ratio * 4, F.lit(1.0)) * 0.2
    return F.round(score, 6)


def fingerprint64(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint:
    h = fold over characters of (h*31 + ascii(c)) mod 2^31.
    SQL twin uses list_reduce over string_split_regex(text,'') — identical
    integer arithmetic in both engines."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * 31 + F.ascii(c), F.lit(2147483648)),
    )


def dup_line_ratio(text: Column) -> Column:
    """Fraction of duplicated lines (Gopher-style repetition signal):
    1 - distinct_lines / lines. SQL twin:
    1 - len(list_distinct(string_split(text, chr(10)))) /
    len(string_split(text, chr(10)))."""
    lines = F.split(text, "\n")
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(lines)) / F.greatest(F.size(lines), F.lit(1)),
        6,
    )


def top_bigram_fraction(text: Column) -> Column:
    """Fraction of all word bigrams taken by the single most common one
    (Gopher's top-n-gram repetition filter at n=2). Pure Column HOFs,
    O(n log n) per row: sort the gram array once, then one aggregate()
    pass tracks the longest equal-run — the max run in sorted order IS
    the max count. (The naive distinct x total filter form is ~10^10
    string compares for one 100k-token doc, which gopher_keep's length
    gate admits.) The SQL twin keeps the list-filter arithmetic — same
    value, and the oracle corpus is small. Texts with < 2 tokens
    score 0."""
    toks = F.split(text, " ")
    k = F.size(toks) - 1
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    run0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    max_count = F.aggregate(
        F.array_sort(grams),
        run0,
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(F.size(grams) > 0, F.round(
        max_count / F.size(grams), 6
    )).otherwise(F.lit(0.0))


def gopher_keep(text: Column) -> Column:
    """Gopher-rule-style document gate (Rae et al. 2021 heuristics,
    thresholds adapted): keep a document iff its whitespace token count
    is in [10, 100000], its mean token length is in [2, 12], at most
    half its lines are duplicates, and at least 40% of characters are
    alphabetic. Boolean Column; each term has an exact SQL twin."""
    n_tokens = token_count_ws(text)
    mean_tok_len = (
        F.length(F.translate(text, " ", "")) / F.greatest(n_tokens, F.lit(1))
    )
    alpha_ratio = _count_matches(text, "[A-Za-z]") / F.greatest(
        F.length(text), F.lit(1)
    )
    return (
        n_tokens.between(10, 100_000)
        & mean_tok_len.between(2, 12)
        & (dup_line_ratio(text) <= 0.5)
        & (alpha_ratio >= 0.4)
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing)

# Patterns restricted to the Java-regex/RE2 COMMON subset (no lookarounds,
# no backrefs) so the same literal pattern runs identically in Spark and
# DuckDB — dialect parity is pinned by a DuckDB cross-check in
# test_textstats. Order matters for redaction: SSN and phone are masked
# before the bare digit-run card pattern so their separators don't leave a
# residue that re-matches.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "card": r"\b\d{4}([ -]?\d{4}){3}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts, one JVM regexp_count expression per
    kind (SQL twin: len(regexp_extract_all(text, pattern))). Returns a
    dict so callers project only the kinds they audit."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Mask every PII occurrence with <KIND> placeholders — the standard
    scrub pass a training-data pipeline runs before tokenization.
    A chain of JVM regexp_replace calls (one codegen'd projection, no
    Python); applied in PII_PATTERNS order so separator-bearing kinds
    (ssn/phone) are consumed before the bare card digit-run pattern.
    SQL twin: the same regexp_replace chain with the 'g' flag."""
    out = text
    for kind in PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out
