"""Scalar column-expression helpers — SURVEY.md §2.8 (X1-X18).

Reference semantics (cited per function) re-expressed as pure Catalyst column
expressions: JVM-side, codegen-friendly, no Python UDFs. Exact-parity notes
are called out where the reference's behavior is quirky (blank-vs-null,
sentinel dates, hash recipes) because surrogate IDs and oracle comparisons
depend on them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OPEN_END_SENTINEL = "9999-12-31"


def safe_text(col: Column | str, default: str = "") -> Column:
    """X1 — reference `normalize.py:20-25`: None→default, str()+strip.

    Trim convention (shared by nonblank/blank_as_null and every oracle
    mirror): ASCII SPACES only — F.trim and DuckDB trim() agree on that,
    which is what keeps the certified SQL oracles byte-identical. Text
    edged with \\t/\\r/\\n keeps those characters; this deliberately
    deviates from Python str.strip()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.trim(c.cast("string")), F.lit(default))


def nonblank(col: Column | str) -> Column:
    """P4 — blank==missing predicate
    (`table_gold_current_members.py:259-262`). ASCII-space trim only —
    see safe_text's trim-convention note; '\\t' counts as present."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.coalesce(c.cast("string"), F.lit(""))) != ""


def blank_as_null(col: Column | str) -> Column:
    """Space-only/empty strings normalized to NULL (read convention of
    `pd.read_csv(keep_default_na=False)` inverted for Spark-native
    nulls). ASCII-space trim only — see safe_text's trim-convention
    note."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c.cast("string"))
    return F.when(t == "", F.lit(None).cast("string")).otherwise(t)


def truthy(col: Column | str) -> Column:
    """P5 — case-insensitive {"true","1","yes","y"}
    (`table_gold_current_members.py:253-256`). Strips ALL edge
    whitespace, unlike the blank==missing family: a CRLF-lined CSV
    delivers 'true\\r', and silently reading that as false drops rows
    from current-member logic; no oracle mirrors this predicate, so the
    full strip is safe."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(c.cast("string"), r"^\s+|\s+$", "")
    return F.lower(t).isin("true", "1", "yes", "y")


def _ascii_fold(s: Column) -> Column:
    """Shared accent fold approximating the reference's NFKD step: one
    translate for the precomposed (NFC) Latin-1 set the Irish corpus uses,
    then strip combining marks so DECOMPOSED (NFD) input — common from
    macOS-originated files — folds to the same letters instead of leaving
    a mark for the non-alnum pass to turn into a separator. One shared
    helper: snake_case and normalize_name folding differently would split
    what should be one join key/slug."""
    s = F.translate(s, "áàâäãéèêëíìîïóòôöõúùûüýçñ", "aaaaaeeeeiiiiooooouuuuycn")
    return F.regexp_replace(s, "[\u0300-\u036f]", "")


def snake_case(col: Column | str) -> Column:
    """X2 — `normalize.py:28-36`: ascii-fold, non-alnum→'_', collapse, trim.
    The fold (shared _ascii_fold) makes 'Dáil Éireann' → 'dail_eireann',
    not 'd_il_ireann', matching the reference's NFKD step."""
    c = F.col(col) if isinstance(col, str) else col
    s = _ascii_fold(F.lower(F.trim(c.cast("string"))))
    s = F.regexp_replace(s, r"[^a-z0-9]+", "_")
    return F.regexp_replace(s, r"^_+|_+$", "")


def normalize_name(col: Column | str) -> Column:
    """X3 — `normalize.py:39-44`: lowercase, strip non-letters, single spaces.
    Used to build fuzzy-match join keys (J3); folds via the shared
    _ascii_fold (the reference uses NFKD)."""
    c = F.col(col) if isinstance(col, str) else col
    s = _ascii_fold(F.lower(F.trim(c.cast("string"))))
    s = F.regexp_replace(s, r"[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def parse_iso_date(col: Column | str) -> Column:
    """X4 — `normalize.py:47-60`: ISO prefix match, then dd/MM/yyyy,
    yyyy/MM/dd, dd-MM-yyyy fallbacks; unparsable → NULL (errors='coerce')."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    iso = F.regexp_extract(s, r"^(\d{4}-\d{2}-\d{2})", 1)
    return F.coalesce(
        F.when(iso != "", F.try_to_timestamp(iso, F.lit("yyyy-MM-dd")).cast("date")),
        F.try_to_timestamp(s, F.lit("dd/MM/yyyy")).cast("date"),
        F.try_to_timestamp(s, F.lit("yyyy/MM/dd")).cast("date"),
        F.try_to_timestamp(s, F.lit("dd-MM-yyyy")).cast("date"),
    )


def is_current_range(start: Column | str, end: Column | str,
                     today: Column | None = None) -> Column:
    """X5 — `normalize.py:96-115`: today in [start, end]; open bounds pass;
    a supplied-but-unparsable bound → False; future start → False."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    now = today if today is not None else F.current_date()
    s_txt, e_txt = nonblank(s), nonblank(e)
    s_d, e_d = parse_iso_date(s), parse_iso_date(e)
    start_ok = F.when(~s_txt, F.lit(True)).otherwise(
        F.when(s_d.isNull(), F.lit(False)).otherwise(s_d <= now))
    end_ok = F.when(~e_txt, F.lit(True)).otherwise(
        F.when(e_d.isNull(), F.lit(False)).otherwise(e_d >= now))
    return start_ok & end_ok


def stable_hash(*cols: Column | str, length: int = 16) -> Column:
    """X6 — `normalize.py:73-76`: sha256("|".join(lower(str(part)))) hex
    prefix. Surrogate-ID recipe used across every reference table;
    expressed as a pure column expression so it runs JVM-side.

    NULL parts render as '' WITH their separator kept ('|b' for
    (NULL,'b')) — note this matches neither Python str(None) ('none|b')
    nor bare SQL concat_ws (which SKIPS nulls: 'b'); the SQL oracle
    mirror is therefore substr(sha256(lower(concat_ws('|',
    coalesce(a, ''), coalesce(b, '')))), 1, n), coalescing each part.
    The convention is locked by the certified oracle queries — do not
    change it without re-deriving every stored surrogate id."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    joined = F.lower(F.concat_ws("|", *[F.coalesce(p.cast("string"), F.lit("")) for p in parts]))
    return F.substring(F.sha2(joined, 256), 1, length)


def stable_record_hash(*cols: str) -> Column:
    """X7 — `normalize.py:79-81`: sha256 of a canonical (sorted-key) JSON
    rendering of the record. Canonicalization = build the struct with field
    names pre-sorted so to_json emits deterministic key order.

    Column NAMES only: the field names land inside the hashed JSON, so
    they must be caller-chosen strings — deriving a name from a Column
    expression's string rendering would make the "stable" hash depend on
    how the expression was spelled (and on internals absent under Spark
    Connect). Alias computed expressions in a select first."""
    if not all(isinstance(c, str) for c in cols):
        raise TypeError(
            "stable_record_hash takes column NAMES (the names are hashed "
            "as JSON keys); alias computed expressions in a prior select")
    named = sorted(cols)
    # ignoreNullFields=false: Spark's default SILENTLY OMITS null fields
    # from the JSON, so {'a':'x','b':NULL} hashed identically to a record
    # missing b entirely — defeating change detection across schema
    # revisions and diverging from the reference's sorted-key json.dumps
    # (which renders nulls)
    return F.sha2(
        F.to_json(F.struct(*[F.col(c).alias(c) for c in named]),
                  {"ignoreNullFields": "false"}), 256)


def coalesce_nonblank(*cols: Column | str) -> Column:
    """X14 — blank-aware coalesce (`table_gold_current_members.py:241-250`):
    first value that is non-null AND non-blank."""
    out = F.lit(None).cast("string")
    for c in reversed(cols):
        col = F.col(c) if isinstance(c, str) else c
        out = F.when(nonblank(col), F.trim(col.cast("string"))).otherwise(out)
    return out


def word_count(col: Column | str) -> Column:
    """X9 — `table_speeches.py:255-256`: len(text.split()). array_remove
    of '' matches Python str.split() exactly: F.trim strips only ASCII
    spaces, so trim-then-split counted a phantom token for text edged
    with \\n/\\t/\\r ('foo\\n' -> 2) and for whitespace-only input."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.coalesce(c.cast("string"), F.lit(""))
    return F.size(F.array_remove(F.split(t, r"\s+"), ""))


def slugify(col: Column | str) -> Column:
    """X17 — `table_speeches.py:280-288`: alnum-dash slugs for storage keys."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(F.trim(c.cast("string")))
    s = F.regexp_replace(s, r"[^a-z0-9]+", "-")
    return F.regexp_replace(s, r"^-+|-+$", "")


def strip_citations(col: Column | str) -> Column:
    """X15 — `llm_table_runner.py:118-121`: web-search answers carry inline
    ``[n]`` citation markers; replace each (with surrounding whitespace) by
    one space, collapse runs, trim. Pure regexp chain — JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.coalesce(c.cast("string"), F.lit("")),
                         r"\s*\[\d+\]\s*", " ")
    return F.trim(F.regexp_replace(s, r"\s{2,}", " "))


def strip_citations_py(s: str | None) -> str:
    """Python parity twin of ``strip_citations`` for mapInPandas/driver
    paths (same convention as stable_hash_py/parse_iso_date_py). Note
    ``.strip(" ")``, not ``.strip()``: Spark's F.trim removes ASCII spaces
    only, and the twins must agree byte-for-byte."""
    import re
    # re.ASCII: Java's \s and \d are ASCII-only, Python's default is
    # Unicode — without the flag the twin eats U+00A0 etc. where Spark
    # does not, and identical inputs produce different stored strings
    s = re.sub(r"\s*\[\d+\]\s*", " ", s or "", flags=re.ASCII)
    return re.sub(r"\s{2,}", " ", s, flags=re.ASCII).strip(" ")


def clamp_words(col: Column | str, max_words: int) -> Column:
    """X15 — `llm_table_runner.py:124-130`: keep the first ``max_words``
    whitespace tokens rejoined by single spaces; ``max_words<=0`` means no
    clamp (trim only). Tokens come from the same no-empty split as
    word_count — trim-then-split left a trailing '' token for
    \\n/\\t/\\r-edged text, rendering 'foo\\n' as 'foo ' (trailing space)
    where the reference ' '.join(s.split()[:n]) gives 'foo'."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.coalesce(c.cast("string"), F.lit(""))
    if max_words <= 0:
        # no clamp: trim only — interior whitespace is preserved verbatim
        return F.trim(t)
    toks = F.array_remove(F.split(t, r"\s+"), "")
    return F.array_join(F.slice(toks, 1, max_words), " ")


def week_id(col: Column | str) -> Column:
    """X11 — non-ISO week id (`ridiculous_sentences_weekly.py:173-195`).

    Monday-start weeks numbered from the FIRST MONDAY of the year (not ISO
    8601): a date before its year's first Monday belongs to the previous
    year's numbering. Output is the string ``YYYYWW`` (week zero-padded).
    Kept exact because weekly scope-replace keys rows by this id.
    """
    d = F.col(col) if isinstance(col, str) else col
    d = d.cast("date")

    def weekday(x: Column) -> Column:          # Monday=0 .. Sunday=6
        return (F.dayofweek(x) + 5) % 7

    def first_monday(year: Column) -> Column:
        jan1 = F.make_date(year, F.lit(1), F.lit(1))
        return F.date_add(jan1, ((F.lit(7) - weekday(jan1)) % 7).cast("int"))

    ws = F.date_sub(d, weekday(d).cast("int"))
    wy = F.when(ws < first_monday(F.year(d)), F.year(d) - 1) \
        .otherwise(F.year(d))
    wn = (F.datediff(ws, first_monday(wy)) / 7).cast("int") + 1
    return F.concat(wy.cast("string"), F.lpad(wn.cast("string"), 2, "0"))


def int_or_2dp(col: Column | str) -> Column:
    """X13 — `table_gold_content_fact_pool.py:219-223` (int_float): coerce
    to numeric (unparsable → 0), then render whole numbers with no decimal
    point and everything else rounded to 2dp with trailing zeros stripped
    ("12", "12.5", "12.34") — headline-friendly metric strings.

    Rounding mode: Spark's HALF_UP on the double's decimal rendering. The
    reference's `str(round(v, 2))` rounds the BINARY double (2.675 is
    stored as 2.67499..., so Python yields '2.67' where this yields
    '2.68') — exact parity on such representation boundaries is not
    expressible as a Catalyst expression; both sides agree everywhere the
    decimal rendering is exact (which includes every 2dp-source metric
    the reference formats)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.coalesce(c.cast("string").try_cast("double"), F.lit(0.0))
    r = F.round(n, 2)
    # DECIMAL render, not double->string: Spark casts doubles >= 1e7 to
    # scientific notation ('1.23456785E7'), which no headline (or the
    # DuckDB oracle's CAST AS VARCHAR) ever shows. decimal(38,2) prints
    # plain digits; the non-whole branch strips a trailing zero so
    # '12.50' reads '12.5' like str(round(v, 2)).
    plain = F.regexp_replace(r.cast("decimal(38,2)").cast("string"),
                             "0$", "")
    return F.when(r == F.floor(r), r.cast("decimal(38,0)").cast("string")) \
        .otherwise(plain)


def ordinal_rank(col: Column | str) -> Column:
    """X16 — `instagram/renderer/util.py:143-151`: 1→"1st", 2→"2nd",
    3→"3rd", 11-13→"th", non-positive/null → "N/A"."""
    c = F.col(col) if isinstance(col, str) else col
    r = c.cast("long")
    suffix = F.when((r % 100 >= 10) & (r % 100 <= 20), F.lit("th")) \
        .when(r % 10 == 1, F.lit("st")) \
        .when(r % 10 == 2, F.lit("nd")) \
        .when(r % 10 == 3, F.lit("rd")) \
        .otherwise(F.lit("th"))
    return F.when(r.isNull() | (r <= 0), F.lit("N/A")) \
        .otherwise(F.concat(r.cast("string"), suffix))


def percent_string(col: Column | str) -> Column:
    """X16 — `instagram/renderer/util.py:153-165`: missing-ish → "N/A";
    already-percent text passes through; whole numbers → "N%", else one
    decimal place; non-numeric text passes through unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(F.coalesce(c.cast("string"), F.lit("")))
    missing = (t == "") | F.lower(t).isin("none", "nan", "null")
    n = t.try_cast("double")
    # decimal renders avoid the >= 1e7 scientific-notation cast (see
    # int_or_2dp); one decimal place is exact for the non-whole branch
    whole = F.concat(n.cast("decimal(38,0)").cast("string"), F.lit("%"))
    frac = F.concat(F.round(n, 1).cast("decimal(38,1)").cast("string"),
                    F.lit("%"))
    # coalesce to passthrough: a castable-but-unrenderable value
    # ('Infinity' casts to double but overflows the decimal render to
    # NULL) must fall back to the original text, never emit a NULL cell
    return F.when(missing, F.lit("N/A")) \
        .when(t.endswith("%"), t) \
        .when(n.isNull(), t) \
        .when(n == F.floor(n), F.coalesce(whole, t)) \
        .otherwise(F.coalesce(frac, t))
