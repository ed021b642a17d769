"""Text-analysis column expressions for large-scale training-data pipelines.

Beyond-reference surface (SURVEY.md §7 step 9): language-ID, quality scoring,
token counting, shingling and document fingerprinting — all as pure Catalyst
expressions (JVM-side, whole-stage-codegen) so they run at 100 TB without a
Python round-trip. The n-gram machinery here feeds the dedupe operators in
``operators/dedupe.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram heuristic language ID.
# Counting occurrences of high-frequency function words is the classic
# cheap-and-robust lang-id heuristic (cf. McNamee 2005, "Language
# identification: a solved problem suitable for undergraduate instruction").
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "zh": ("的", "是", "了", "在", "我", "不"),
}

_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
              "that", "for", "on", "as", "with", "was", "at", "by")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (lowercased), matching
    Python ``str.split()``: no empty tokens, ever. ``F.trim`` strips only
    ASCII spaces, so the previous trim-then-split emitted a phantom ''
    token for text edged with \\n/\\t/\\r — documents routinely end with a
    newline, which skewed token counts, quality thresholds and shingles
    corpus-wide. split on \\s+ can only produce empty strings at the
    edges (interior runs are one delimiter), so array_remove('') is
    exactly the whitespace-edge trim — and handles blank/NULL input for
    free ([''] → [])."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.lower(F.coalesce(c.cast("string"), F.lit("")))
    return F.array_remove(F.split(t, r"\s+"), "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (JVM-side)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: count word pieces + digits + punctuation
    runs via a GPT-2-style pre-tokenizer regex. Cheap proxy for LLM token
    budgeting at corpus scale (regexp_count is JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.coalesce(c.cast("string"), F.lit(""))
    return F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-gram word shingles → array<string>; the unit of Jaccard/MinHash
    dedupe. Built with transform over a token array — no UDF, no explode
    until the caller decides to."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    idx = F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(sh)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-grams of the normalized text → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.lower(F.regexp_replace(F.coalesce(c.cast("string"), F.lit("")), r"\s+", " "))
    k = F.length(t) - (n - 1)
    idx = F.sequence(F.lit(1), F.greatest(k, F.lit(1)))
    return F.when(F.length(t) <= n, F.array(t)).otherwise(
        F.transform(idx, lambda i: F.substring(t, i, n)))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Document-quality heuristics (Gopher/C4-style filters): length, mean
    word length, punctuation ratio, stopword ratio, alpha ratio, max-word
    repetition. Returns named columns; caller selects/thresholds."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.coalesce(c.cast("string"), F.lit(""))
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in _STOPWORDS])))
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(F.lit(0.0))
    # sum(len(word))/n_words — the Gopher/C4 definition the thresholds are
    # calibrated on; length(text)/n_tok would count the separating
    # whitespace, overstating by ~1 char per word and drifting with doc size
    n_wchars = F.length(F.regexp_replace(t, r"\s", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_word_len": F.when(n_tok > 0, n_wchars / n_tok).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_distinct": n_stop.cast("long"),
        "distinct_token_ratio": distinct_ratio,
    }


def marker_hits(col: Column | str, lang: str) -> Column:
    """Count of marker occurrences for one language (JVM-side).

    Whitespace-token languages count marker TOKENS; a language whose
    markers are all single characters (zh) counts marker CHARACTERS via
    translate — unsegmented scripts have no whitespace tokens, so the
    token form would score real Chinese text 0 and mislabel it 'und'."""
    markers = LANG_MARKERS[lang]
    c = F.col(col) if isinstance(col, str) else col
    t = F.lower(F.trim(F.coalesce(c.cast("string"), F.lit(""))))
    if all(len(m) == 1 for m in markers):
        return (F.length(t)
                - F.length(F.translate(t, "".join(markers), ""))).cast("int")
    toks = tokens(col)
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda x: F.array_contains(marker_arr, x)))


def language_guess(col: Column | str) -> Column:
    """Heuristic language ID: argmax over per-language marker-token hits,
    ties resolved by the fixed LANG_MARKERS declaration order, all-zero →
    'und'. Pure column expression: one token-array pass per language — no
    shuffle, no UDF, trivially scalable."""
    langs = list(LANG_MARKERS)
    hits = {lang: marker_hits(col, lang) for lang in langs}
    best = F.greatest(*hits.values()) if len(hits) > 1 else next(iter(hits.values()))
    out = F.lit("und")
    for lang in reversed(langs):
        out = F.when(hits[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def content_norm(col: Column | str) -> Column:
    """Canonical content normalization shared by the exact-dup key and the
    winnowing kernel (lowercase, non-alphanumeric runs → single space,
    trimmed) — ONE definition so the two can never drift apart and the
    oracle CTEs that mirror it stay in sync."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.coalesce(c.cast("string"), F.lit("")))
    return F.trim(F.regexp_replace(norm, r"[^a-z0-9]+", " "))


def doc_fingerprint(col: Column | str, length: int = 16) -> Column:
    """Deterministic document fingerprint: sha256 of whitespace/punct
    normalized lowercase text (``content_norm``), hex prefix. The
    exact-dup key."""
    return F.substring(F.sha2(content_norm(col), 256), 1, length)


_SENTENCE_BOUNDARY = r'(?<=[.!?])\s+(?=(?:["“‘(\[])?[A-Z0-9])'


def sentences(col: Column | str, max_words: int = 50) -> Column:
    """X10 — sentence splitting (`ridiculous_sentences_weekly.py:52,151-170`):
    split on punctuation followed by a capital/digit (optionally quoted or
    bracketed); pieces longer than ``max_words`` re-split on semicolons.
    Whitespace-normalized, blanks dropped — all JVM-side (split/transform),
    explode-ready for the weekly candidate pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(F.coalesce(c.cast("string"), F.lit("")),
                                      r"\s+", " "))
    parts = F.split(cleaned, _SENTENCE_BOUNDARY)
    norm = lambda p: F.trim(F.regexp_replace(p, r"\s+", " "))  # noqa: E731
    word_count = lambda p: F.size(F.split(F.trim(p), r"\s+"))  # noqa: E731
    resplit = F.transform(
        parts,
        lambda p: F.when(
            (word_count(p) > max_words) & p.contains(";"),
            F.filter(F.transform(F.split(p, ";"), norm),
                     lambda s: s != ""))
        .otherwise(F.array(norm(p))))
    return F.filter(F.flatten(resplit), lambda s: s != "")


def sentence_candidates(col: Column | str, max_words: int = 50) -> Column:
    """P10 — candidate bounds filter wired over the sentence split
    (`ridiculous_sentences_weekly.py:219-224`): keep pieces with
    1..``max_words`` words that contain at least one ASCII letter. A piece
    over the bound that carried no semicolon (so the re-split couldn't
    shorten it) is dropped here, matching the reference."""
    return F.filter(
        sentences(col, max_words),
        lambda s: (F.size(F.split(s, r"\s+")) <= max_words)
        & s.rlike("[A-Za-z]"))


def winnowed_fingerprints(col: Column | str, k: int = 5, window: int = 4,
                          base: int = 257,
                          mod: int = 1_000_000_007) -> Column:
    """Rolling-hash document fingerprints with winnowing (the MOSS scheme):
    polynomial hash every k-char gram of the normalized text, slide a
    ``window`` over the gram hashes, keep each window's minimum, emit the
    sorted distinct minima as ``array<bigint>``.

    Guarantees the winnowing property — any shared substring of length
    ``k + window - 1`` between two documents yields at least one shared
    fingerprint — which is what makes the fingerprint set joinable for
    near-dup candidate generation at corpus scale (explode + equi-join on
    fingerprint value, never all-pairs).

    Pure Catalyst higher-order functions (transform/aggregate/slice) — no
    UDF, JVM-side, and expressible identically in any SQL engine with list
    lambdas, so results are oracle-checkable bit-for-bit. Normalization
    IS `doc_fingerprint`'s (the shared ``content_norm``).
    """
    norm = content_norm(col)
    codes = F.transform(F.split(norm, ""), F.ascii)
    n = F.when(F.length(norm) > 0, F.size(codes)).otherwise(F.lit(0))

    gram_hash = lambda i: F.aggregate(  # noqa: E731
        F.slice(codes, i, k), F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod)
    grams = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - k + 1), gram_hash)
    ).otherwise(F.array().cast("array<bigint>"))

    g = F.size(grams)
    minima = F.when(
        g >= window,
        F.transform(F.sequence(F.lit(1), g - window + 1),
                    lambda p: F.array_min(F.slice(grams, p, window)))
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_sort(F.array_distinct(minima))


# ---------------------------------------------------------------------------
# PII detection / redaction (beyond-ref: training-data scrubbing)
# ---------------------------------------------------------------------------

#: Conservative patterns chosen to behave identically under Java regex
#: (Spark) and RE2 (DuckDB/the oracle): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # international-ish phone: leading '+', 9-15 digits with common
    # separators. Deliberately UNANCHORED (\b cannot anchor after '+',
    # and lookaround is banned above for RE2 parity), so it can match a
    # prefix inside a longer digit run — a conservative overcount, which
    # is the right failure direction for PII scrubbing.
    "phone": r"\+\d[\d\- ]{7,13}\d",
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (email / ipv4 / phone) as JVM-side column
    expressions — the detection half of training-data scrubbing, cheap
    enough to ride along any quality-scoring projection pass."""
    c = F.coalesce((F.col(col) if isinstance(col, str) else col)
                   .cast("string"), F.lit(""))
    return {f"n_{kind}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
            for kind, pat in PII_PATTERNS.items()}


def redact_pii(col: Column | str, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token`` — chained regexp_replace,
    zero UDFs, safe in any projection (the scrubbing half). Order matters:
    emails first so their domain dots cannot be half-eaten by the ipv4
    pattern."""
    out = F.coalesce((F.col(col) if isinstance(col, str) else col)
                     .cast("string"), F.lit(""))
    # Java treats '$' in the replacement as a group reference and '\' as
    # an escape — a caller token like '<$PII>' would throw
    # INVALID_REGEXP_REPLACE at runtime mid-stage; escape them
    token = token.replace("\\", "\\\\").replace("$", "\\$")
    # iterate the declaration, not a hardcoded list: a pattern added to
    # PII_PATTERNS must be scrubbed by the same release that counts it —
    # otherwise documents REPORTED as containing the new kind ship
    # unredacted. Dict order is declaration order, and 'email' is declared
    # first (its domain dots must not be half-eaten by the ipv4 pattern).
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
