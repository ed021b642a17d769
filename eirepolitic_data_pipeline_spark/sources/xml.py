"""Akoma-Ntoso-style debate XML → ordered speech rows — SURVEY §2.3 F7/F8
(`extract/oireachtas/xml_debates.py:31-225`).

The reference's parser semantics, preserved:
- namespace-agnostic recursive walk (tag local-names only);
- a section STACK whose non-joinable names (prelude, division, ta, nil,
  staon) never contribute to the section path;
- document-order ``speech_order`` counter across the whole debate;
- speaker resolved from TLCPerson href → member_code
  (``/member/id/{code}/`` marker) with #ref fallback;
- language inheritance from the nearest ancestor with xml:lang;
- deterministic ``speech_id`` = stable-hash(debate_id, speech_order, by).

This recursion + document-order counter does NOT fit spark-xml's row-tag
model (SURVEY F7 note), so the parser is plain ElementTree executed inside
``mapInPandas``: one XML document per input row, many speech rows out —
a UDTF-shaped operator, Arrow-batched, scaling with the number of debates.
"""

from __future__ import annotations

import hashlib
import re
import xml.etree.ElementTree as ET
from typing import Iterator, Optional

from pyspark.sql import DataFrame

NON_JOINABLE_SECTIONS = {"prelude", "division", "ta", "nil", "staon"}

SPEECH_SCHEMA = ("debate_id string, speech_id string, speech_order int, "
                 "section_path string, section_eid string, "
                 "member_code string, speaker_ref string, "
                 "speaker_name string, match_method string, "
                 "language string, text string, word_count int, char_count int")

_MEMBER_HREF_RE = re.compile(r"/member/id/([^/]+)/?")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _stable_hash(*parts, length: int = 16) -> str:
    """Thin adapter over the engine-wide X6 recipe (tables/silver
    stable_hash_py) — one implementation, so speech_id can never silently
    diverge from every other stable id."""
    from ..tables.silver import stable_hash_py
    return stable_hash_py(parts, length=length)


def _person_refs(root: ET.Element) -> dict[str, dict[str, str]]:
    """TLCPerson id → {member_code, show_as} (href marker parse + display
    name, reference `xml_debates.py:153-179`)."""
    refs: dict[str, dict[str, str]] = {}
    for el in root.iter():
        if _local(el.tag) == "TLCPerson":
            pid = el.attrib.get("eId") or el.attrib.get("id") or ""
            href = el.attrib.get("href", "")
            m = _MEMBER_HREF_RE.search(href)
            if pid:
                refs[pid] = {"member_code": m.group(1) if m else "",
                             "show_as": el.attrib.get("showAs", "")
                             or el.attrib.get("name", "")}
    return refs


def _speaker_name_of(el: ET.Element, by: str, show_as: str) -> str:
    """Display name: from/docProponent/speaker child, else the TLCPerson
    showAs, else the humanized ref. The reference
    (`xml_debates.py:111,202-213`) orders humanized-ref BEFORE showAs,
    which makes its showAs fallback unreachable (show_as can only be
    non-empty when `by` is) — deliberate divergence: the registry's
    display name beats a de-underscored eId."""
    for child in el:
        if _local(child.tag) in ("from", "docProponent", "speaker"):
            text = _text_of(child)
            if text:
                return text
    if show_as:
        return show_as
    if by:
        return re.sub(r"[_-]+", " ", by).strip()
    return ""


def _text_of(el: ET.Element) -> str:
    """Whole-subtree text with single-space joins (reference text assembly
    `xml_debates.py:215-225`)."""
    parts = [t.strip() for t in el.itertext() if t and t.strip()]
    return " ".join(parts)


_ATTRIBUTION_TAGS = ("from", "docProponent", "speaker")


def _speech_text_of(el: ET.Element) -> str:
    """Speech body: join of p/blockContainer children; the fallback for
    speeches without them walks every child EXCEPT the speaker-attribution
    tags — a bare _text_of(el) would splice the <from> display name into
    speech_text and inflate the word counts."""
    text = " ".join(_text_of(child) for child in el
                    if _local(child.tag) in ("p", "blockContainer"))
    if text:
        return text
    return " ".join(
        t for child in el if _local(child.tag) not in _ATTRIBUTION_TAGS
        for t in [_text_of(child)] if t)


def _lang_of(el: ET.Element, inherited: str) -> str:
    for k, v in el.attrib.items():
        if _local(k) == "lang" and v:
            return v
    return inherited


def parse_debate_xml(debate_id: str, xml_bytes: bytes) -> list[dict]:
    """Parse one debate document into ordered speech rows."""
    root = ET.fromstring(xml_bytes)
    refs = _person_refs(root)
    rows: list[dict] = []
    order = [0]  # document-order counter shared across recursion

    def walk(el: ET.Element, section_stack: tuple[str, ...], lang: str):
        lang = _lang_of(el, lang)
        name = _local(el.tag)
        if name == "speech":
            order[0] += 1
            by = (el.attrib.get("by") or "").lstrip("#")
            person = refs.get(by, {})
            member_code = person.get("member_code", "")
            match_method = "xml_tlc_person_href" if member_code else ""
            if not member_code and by:
                m = _MEMBER_HREF_RE.search(by)
                member_code = m.group(1) if m else ""
                if member_code:
                    match_method = "speaker_ref_member_code"
            text = _speech_text_of(el)
            rows.append({
                "debate_id": debate_id,
                "speech_id": _stable_hash(debate_id, order[0], by),
                "speech_order": order[0],
                "section_path": "/".join(n for n, _ in section_stack),
                "section_eid": section_stack[-1][1] if section_stack else "",
                "member_code": member_code,
                "speaker_ref": by,
                "speaker_name": _speaker_name_of(
                    el, by, person.get("show_as", "")),
                "match_method": match_method,
                "language": lang or "",
                "text": text,
                "word_count": len(text.split()),
                "char_count": len(text),
            })
            return  # speeches do not nest
        new_stack = section_stack
        if name == "debateSection":
            sec = el.attrib.get("name", "")
            if sec and sec not in NON_JOINABLE_SECTIONS:
                new_stack = section_stack + (
                    (sec, el.attrib.get("eId") or el.attrib.get("id") or ""),)
        for child in el:
            walk(child, new_stack, lang)

    walk(root, (), "")
    return rows


def speeches_from_xml(df: DataFrame, id_col: str = "debate_id",
                      xml_col: str = "xml") -> DataFrame:
    """UDTF-shaped operator: DataFrame[debate_id, xml(bytes|str)] → speech
    rows via mapInPandas (Arrow-batched; one task per partition of debates).
    At scale, partition by debate so parse work distributes evenly."""
    import pandas as pd

    def parse(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for did, xml in zip(pdf[id_col], pdf[xml_col]):
                # tolerant per document: the download layer deliberately
                # leaves null content for failed fetches (files.py
                # fetch_documents), and one malformed document must not
                # abort the whole corpus parse — both skip this debate.
                # (Arrow→pandas can surface missing values as None or NaN
                # depending on dtype, hence the type check, not an is-None.)
                if not isinstance(xml, (str, bytes, bytearray)):
                    continue
                data = xml.encode("utf-8") if isinstance(xml, str) else bytes(xml)
                try:
                    out.extend(parse_debate_xml(str(did), data))
                except ET.ParseError:
                    continue
            yield pd.DataFrame(
                out, columns=[c.split(" ")[0] for c in SPEECH_SCHEMA.split(", ")])

    return df.select(id_col, xml_col).mapInPandas(parse, schema=SPEECH_SCHEMA)
