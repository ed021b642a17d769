"""Debate-record and debate-section silver flatteners — SURVEY §2.3.

The `/debates` endpoint returns one item per debate day wrapped in a
`debateRecord` envelope. The reference derives two tables from it:

* ``silver_debate_records`` — one row per debate with house/chamber
  context, show-as title fallback, and pdf/xml source-file locators
  (`extract/oireachtas/table_debate_records.py:160-209`).
* ``silver_debate_sections`` — the exploded, 1-based-ordered
  ``debateSections[]`` list with parent-section linkage
  (`extract/oireachtas/table_debate_sections.py:67-92,162-186`).

Both are Arrow-batched ``mapInPandas`` stages over the raw JSON column —
partition-parallel, no shuffle until the final PK dedupe — sharing the
parity helpers (sha-256 IDs, coerce-to-blank dates) from
``tables.silver``.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping

from pyspark.sql import DataFrame

from ..functions import scalar as sc
from .silver import (
    _first,
    _first_map,
    _flatten_stage,
    _results_of,
    _txt,
    parse_iso_date_py,
    record_hash_py,
    stable_hash_py,
)

DEBATE_RECORD_COLUMNS = [
    "debate_id", "debate_uri", "context_date", "debate_date", "chamber",
    "house_uri", "house_no", "house_code", "show_as", "source_xml_uri",
    "source_xml_url", "source_pdf_uri", "source_pdf_url",
    "source_file_id_xml", "source_file_id_pdf", "api_result_hash",
    "snapshot_date",
]

DEBATE_SECTION_COLUMNS = [
    "debate_section_id", "debate_id", "section_eid", "section_uri",
    "section_order", "heading", "show_as", "parent_section_id",
    "snapshot_date",
]


def _debate_ctx(item: Mapping[str, Any]) -> tuple[Mapping[str, Any], str, str]:
    """(record, debate_uri, debate_id) with the generated-ID fallback."""
    record = item.get("debateRecord")
    if not isinstance(record, Mapping):
        record = item
    uri = _first(record, "uri", "debateUri")
    debate_id = uri or "generated:debate:" + record_hash_py(record, length=20)
    return record, uri, debate_id


def _format_slot(formats: Mapping[str, Any], key: str) -> Mapping[str, Any]:
    value = formats.get(key)
    return value if isinstance(value, Mapping) else {}


def _source_file_id(debate_id: str, ftype: str, uri: str, url: str) -> str:
    if not (uri or url):
        return ""
    return "source_file:" + stable_hash_py(
        ["debate", debate_id, ftype, uri, url], length=24)


def silver_debate_records(df: DataFrame, json_col: str = "payload",
                          snapshot_date: str = "") -> DataFrame:
    """One row per debate with house context and format locators.

    Mirrors `table_debate_records.py:160-209`: debate_date falls back to
    the item-level contextDate, chamber prefers the houseCode, show_as
    falls back to "chamber — date", and each of pdf/xml gets a
    deterministic source-file ID only when a locator exists.
    """

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            if not isinstance(item, Mapping):
                continue
            record, uri, debate_id = _debate_ctx(item)
            context_date = parse_iso_date_py(item.get("contextDate")) or ""
            debate_date = parse_iso_date_py(record.get("date")) or context_date
            chamber_rec = _first_map(record, "chamber")
            house_rec = _first_map(record, "house")
            house_code = _first(house_rec, "houseCode", "chamberCode")
            chamber = house_code or _first(chamber_rec, "showAs") or \
                _first(house_rec, "showAs")
            show_as = _first(record, "showAs", "title") or \
                " — ".join(p for p in (chamber, debate_date) if p)
            formats = _first_map(record, "formats")
            pdf = _format_slot(formats, "pdf")
            xml = _format_slot(formats, "xml")
            pdf_uri = _first(pdf, "uri", "url", "href")
            xml_uri = _first(xml, "uri", "url", "href")
            # deliberate parity with table_debate_records.py:182-183: a
            # RELATIVE uri is NOT normalized to an absolute URL here (the
            # url column stays whatever url/href key exists) — unlike
            # silver_questions, which mirrors its own reference builder's
            # normalize_format_url call. The reference differs between the
            # two builders; each silver table tracks its own counterpart.
            pdf_url = pdf_uri if pdf_uri.startswith("http") else \
                _first(pdf, "url", "href")
            xml_url = xml_uri if xml_uri.startswith("http") else \
                _first(xml, "url", "href")
            yield {
                "debate_id": debate_id,
                "debate_uri": uri,
                "context_date": context_date,
                "debate_date": debate_date,
                "chamber": chamber,
                "house_uri": _first(house_rec, "uri")
                or _first(chamber_rec, "uri"),
                "house_no": _first(house_rec, "houseNo"),
                "house_code": house_code,
                "show_as": show_as,
                "source_xml_uri": xml_uri,
                "source_xml_url": xml_url,
                "source_pdf_uri": pdf_uri,
                "source_pdf_url": pdf_url,
                "source_file_id_xml": _source_file_id(
                    debate_id, "xml", xml_uri, xml_url),
                "source_file_id_pdf": _source_file_id(
                    debate_id, "pdf", pdf_uri, pdf_url),
                "api_result_hash": record_hash_py(item),
                "snapshot_date": snapshot_date,
            }

    return _flatten_stage(df, json_col, DEBATE_RECORD_COLUMNS,
                          rows_of).dropDuplicates(["debate_id"])


def _parent_section_id(value: Any) -> str:
    if isinstance(value, Mapping):
        return _first(value, "uri", "debateSectionId", "sectionId", "eid")
    return _txt(value)


def silver_debate_sections(df: DataFrame, json_col: str = "payload",
                           snapshot_date: str = "") -> DataFrame:
    """Exploded ``debateSections[]`` rows with 1-based document order.

    Mirrors `table_debate_sections.py:67-92,162-186`: each entry unwraps
    an optional ``debateSection`` envelope; the generated-ID fallback
    hashes (debate_id, section_eid, section_order); parent linkage takes
    the parent's URI-or-eid whether the parent is a mapping or a bare
    string.
    """

    def rows_of(payload: Any) -> Iterator[dict[str, Any]]:
        for item in _results_of(payload):
            if not isinstance(item, Mapping):
                continue
            record, _uri, debate_id = _debate_ctx(item)
            sections = record.get("debateSections")
            if not isinstance(sections, list):
                continue
            for order, entry in enumerate(sections, start=1):
                if not isinstance(entry, Mapping):
                    continue
                section = entry.get("debateSection")
                if not isinstance(section, Mapping):
                    section = entry
                section_uri = _first(section, "uri", "sectionUri")
                section_eid = _first(section, "debateSectionId",
                                     "sectionId", "eid")
                yield {
                    "debate_section_id": section_uri
                    or "generated:debate_section:" + stable_hash_py(
                        [debate_id, section_eid, order], length=20),
                    "debate_id": debate_id,
                    "section_eid": section_eid,
                    "section_uri": section_uri,
                    "section_order": str(order),
                    "heading": _first(section, "heading", "title", "showAs"),
                    "show_as": _first(section, "showAs", "heading", "title"),
                    "parent_section_id": _parent_section_id(
                        section.get("parentDebateSection")),
                    "snapshot_date": snapshot_date,
                }

    return _flatten_stage(df, json_col, DEBATE_SECTION_COLUMNS,
                          rows_of).dropDuplicates(["debate_section_id"])


def weekly_sentence_candidates(speeches: DataFrame,
                               text_col: str = "speech_text",
                               speaker_col: str = "speaker_name",
                               date_col: str = "debate_date",
                               max_words: int = 50) -> DataFrame:
    """Weekly sentence-candidate rows (`ridiculous_sentences_weekly.py:199-240`).

    Per speech: parse the debate date (unparseable rows drop, errors=coerce),
    tag the non-ISO Monday-start week id (X11), explode the sentence split
    with the P10 candidate bounds (1..max_words words, at least one ASCII
    letter), whitespace-normalize the speaker, then dedupe on
    (week_id, speaker_name, normalized sentence) keep-first (O7; the
    normalization lowercases and strips surrounding quote/bracket glyphs).
    ``candidate_id`` is the reference's sha-256("||" join)[:24], keying the
    downstream batch scorer (U3) and its resume anti-join.

    Scale: split/filter/explode are per-row column expressions in the scan
    stage; the only shuffle is the dedupe on the composite candidate key.
    """
    from pyspark.sql import functions as F

    from ..functions.scalar import parse_iso_date, week_id
    from ..functions.text import sentence_candidates

    def norm_ws(c):
        return F.trim(F.regexp_replace(
            F.coalesce(c.cast("string"), F.lit("")), r"\s+", " "))

    from pyspark.sql import Window

    sentence_norm = F.regexp_replace(
        F.lower(F.col("sentence")),
        "^[ \"'“”‘’()\\[\\]]+|[ \"'“”‘’()\\[\\]]+$", "")
    # Keep-first must be DETERMINISTIC (dropDuplicates keeps an arbitrary
    # row under Spark partitioning): posexplode preserves document order,
    # and the dedupe window orders by (date, position, sentence) — the
    # reference's frame-order keep-first, pinned.
    w = Window.partitionBy("week_id", "speaker_name", "sentence_norm") \
        .orderBy("debate_date", "__pos", "sentence")
    return (
        speeches
        .withColumn("__d", parse_iso_date(date_col))
        .filter(F.col("__d").isNotNull())
        .withColumn("week_id", week_id("__d"))
        .withColumn("debate_date", F.date_format("__d", "yyyy-MM-dd"))
        .withColumn("speaker_name", norm_ws(F.col(speaker_col)))
        .select("*", F.posexplode(sentence_candidates(text_col, max_words))
                .alias("__pos", "sentence"))
        .withColumn("sentence_norm", sentence_norm)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pos")
        .withColumn("word_count", F.size(F.split(F.col("sentence"), r"\s+")))
        .withColumn("candidate_id", F.substring(F.sha2(F.concat_ws(
            "||", F.col("week_id"), F.col("speaker_name"),
            F.col("sentence")), 256), 1, 24))
        .select("candidate_id", "week_id", "debate_date", "speaker_name",
                "sentence", "sentence_norm", "word_count")
    )


SPEECH_COLUMNS = [
    "speech_id", "debate_id", "debate_section_id", "debate_date",
    "speech_order", "speaker_ref", "speaker_name", "speaker_member_code",
    "speaker_match_method", "speaker_match_confidence", "speech_text",
    "speech_text_hash", "word_count", "char_count", "language",
    "source_file_id", "xml_source_key", "snapshot_date",
]


def silver_speeches(xml_df: DataFrame, snapshot_date: str = "",
                    id_col: str = "debate_id", xml_col: str = "xml",
                    date_col: str = "debate_date") -> DataFrame:
    """Debate XML corpus → the silver_speeches table
    (`table_speeches.py:230-283`): the F7 Akoma walk per document, then
    the reference's row normalization as pure column expressions —
    match method/confidence (TLCPerson href = 1.0, ref-marker = 0.8),
    sha-256[:24] text hash, section URI from the debate URI base +
    section eId, and the deterministic source-file id / raw-archive key.

    ``xml_df``: one row per debate document — (debate_id, xml,
    [debate_date], [xml_uri], [xml_url]); the download itself is the
    source layer's job (sources/files.py S6). Parsing is the
    mapInPandas UDTF in sources/xml.py — partition-parallel over
    debates, no shuffle until the PK dedupe."""
    from pyspark.sql import functions as F

    from ..sources.xml import speeches_from_xml

    for opt in (date_col, "xml_uri", "xml_url"):
        if opt not in xml_df.columns:
            xml_df = xml_df.withColumn(opt, F.lit(""))
    parsed = speeches_from_xml(xml_df, id_col=id_col, xml_col=xml_col)
    meta = xml_df.select(id_col, date_col, "xml_uri", "xml_url")
    out = parsed.join(meta, id_col, "left")

    # `table_speeches.py:276-284`: source_file id over the locator pair,
    # archive key from slugged debate id (last 120 chars) + slugged id
    sfid = F.concat(F.lit("source_file:"), sc.stable_hash(
        F.lit("debate"), F.col(id_col), F.lit("xml"),
        F.col("xml_uri"), F.col("xml_url"), length=24))
    slug = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(F.regexp_replace(c, "^https?://", ""),
                         r"[^A-Za-z0-9\-_.]", "-"), "^-+|-+$", "")
    entity_slug = F.substring(slug(F.col(id_col)), -120, 120)
    base = F.when(F.col(id_col).contains("/"),
                  F.regexp_replace(F.col(id_col), "/[^/]*$", "")) \
        .otherwise(F.col(id_col))
    return (
        out.select(
            F.col("speech_id"),
            F.col(id_col).alias("debate_id"),
            F.when(F.col("section_eid") != "",
                   F.concat(base, F.lit("/"), F.col("section_eid")))
            .otherwise(F.lit("")).alias("debate_section_id"),
            F.coalesce(F.col(date_col), F.lit("")).alias("debate_date"),
            F.col("speech_order"),
            F.col("speaker_ref"),
            F.col("speaker_name"),
            F.col("member_code").alias("speaker_member_code"),
            F.col("match_method").alias("speaker_match_method"),
            F.when(F.col("match_method") == "xml_tlc_person_href", 1.0)
            .when(F.col("match_method") == "speaker_ref_member_code", 0.8)
            .otherwise(F.lit(None).cast("double"))
            .alias("speaker_match_confidence"),
            F.col("text").alias("speech_text"),
            F.substring(F.sha2(F.col("text"), 256), 1, 24)
            .alias("speech_text_hash"),
            F.col("word_count"), F.col("char_count"),
            F.col("language"),
            sfid.alias("source_file_id"),
            F.concat(F.lit("raw/source_files/debate/"),
                     F.when(entity_slug != "", entity_slug)
                     .otherwise(F.lit("debate")),
                     F.lit("/"), slug(sfid), F.lit(".xml"))
            .alias("xml_source_key"),
            F.lit(snapshot_date).alias("snapshot_date"),
        )
        .dropDuplicates(["speech_id"])
    )
