"""U5 — HTML scraping stage: member profile photo URLs (SURVEY §2.11).

Reference contract (`process/members_photo_urls.py:99-143,160-240`):
- member URI → public profile URL (data.oireachtas.ie member-id URIs are
  rewritten to www.oireachtas.ie member pages; other http(s) URLs pass
  through slash-normalized; anything else is unreachable → null);
- the profile page's photo <img> is located by a selector chain —
  ``img.c-member-about__img``, then ``img.member-profile-photo``, then the
  first img inside ``div.member-image``, then any img whose src contains
  ``/media/members/photo/`` — and its src resolved against the page URL;
- fill-missing-only resume: rows already holding a photo_url are never
  re-fetched; fetch/parse failures yield null, never a task failure.

Spark shape: ``mapInPandas`` with an injected ``fetcher_factory() ->
callable(url) -> str`` (HTML). The factory is built once per task — tests
inject canned HTML; production wires an HTTP client with timeout +
politeness delay inside the factory (wall-clock throttling is the client's
concern, like the LLM runners). The selector chain is evaluated with a
small regex parser so the stage has no HTML-library dependency; the
selectors accepted are exactly the reference's four.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from urllib.parse import urljoin

_DATA_URI_PREFIX = "https://data.oireachtas.ie/ie/oireachtas/member/id/"
_PUBLIC_PREFIX = "https://www.oireachtas.ie/en/members/member/"

_IMG_TAG = re.compile(r"<img\b[^>]*>", re.IGNORECASE | re.DOTALL)
_ATTR = {
    name: re.compile(name + r"""\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
    for name in ("class", "src")
}
_MEMBER_IMAGE_DIV = re.compile(
    r"""<div\b[^>]*class\s*=\s*["'][^"']*\bmember-image\b[^"']*["'][^>]*>"""
    r"(.*?)</div>", re.IGNORECASE | re.DOTALL)


def to_public_profile_url(member_uri: Optional[str]) -> Optional[str]:
    """URI → fetchable public page URL (reference `:99-118`)."""
    if not member_uri or not isinstance(member_uri, str):
        return None
    if "data.oireachtas.ie" in member_uri and \
            "/ie/oireachtas/member/id/" in member_uri:
        # regex, not str.replace of the exact https prefix: an http:// (or
        # scheme-relative) data-API URI satisfies the condition above, and
        # a no-op replace would return the raw data URI as the "public
        # profile URL" — the fetch then gets JSON instead of the page
        code = member_uri.split("/ie/oireachtas/member/id/", 1)[1]
        return _PUBLIC_PREFIX + code.rstrip("/") + "/"
    if member_uri.startswith(("http://", "https://")):
        return member_uri.rstrip("/") + "/"
    return None


def _attr(tag: str, name: str) -> str:
    m = _ATTR[name].search(tag)
    return m.group(1) if m else ""


def extract_photo_url(html: str, page_url: str) -> Optional[str]:
    """Selector-chain img extraction (reference `:120-143`), relative srcs
    resolved against the page URL."""
    imgs = _IMG_TAG.findall(html)

    def first_with_class(cls: str) -> Optional[str]:
        for tag in imgs:
            if cls in _attr(tag, "class").split():
                return _attr(tag, "src") or None
        return None

    src = first_with_class("c-member-about__img") \
        or first_with_class("member-profile-photo")
    if not src:
        div = _MEMBER_IMAGE_DIV.search(html)
        if div:
            inner = _IMG_TAG.search(div.group(1))
            if inner:
                src = _attr(inner.group(0), "src") or None
    if not src:
        for tag in imgs:
            cand = _attr(tag, "src")
            if "/media/members/photo/" in cand:
                src = cand
                break
    return urljoin(page_url, src) if src else None


def scrape_photo_urls(df: DataFrame,
                      fetcher_factory: Callable[[], Callable[[str], str]],
                      existing: Optional[DataFrame] = None,
                      key_col: str = "member_code",
                      name_col: str = "member_name",
                      uri_col: str = "member_uri",
                      out_col: str = "photo_url") -> DataFrame:
    """Produce the ``photos`` table: (key_col, name_col, photo_url).

    Rows whose key already has a non-blank ``out_col`` in ``existing`` are
    reused without fetching (the reference's resume map); everything else
    is fetched and parsed, with any failure yielding null. The expensive
    stage only ever sees the anti-joined remainder — at corpus scale resume
    is the difference between re-scraping and topping up.
    """
    todo = df.select(key_col, name_col, uri_col)
    done = None
    if existing is not None and out_col in existing.columns:
        done = (existing
                .select(key_col, out_col)
                .filter(F.col(out_col).isNotNull() & (F.col(out_col) != ""))
                .dropDuplicates([key_col]))
        todo = todo.join(done.select(key_col), key_col, "left_anti")

    def scrape_partitions(batches: Iterator) -> Iterator:
        fetch = fetcher_factory()
        for pdf in batches:
            urls = []
            for uri in pdf[uri_col]:
                profile = to_public_profile_url(
                    str(uri) if uri is not None else "")
                found = None
                if profile:
                    try:
                        found = extract_photo_url(fetch(profile), profile)
                    except Exception:
                        found = None  # reference `:216-219`: failure → NA
                urls.append(found)
            out = pdf[[key_col, name_col]].copy()
            out[out_col] = urls
            yield out

    schema = f"{key_col} string, {name_col} string, {out_col} string"
    scraped = (todo
               .withColumn(key_col, F.col(key_col).cast("string"))
               .withColumn(name_col, F.col(name_col).cast("string"))
               .mapInPandas(scrape_partitions, schema=schema))
    if done is None:
        return scraped
    reused = (df.select(F.col(key_col).cast("string").alias(key_col),
                        F.col(name_col).cast("string").alias(name_col))
              .join(done, key_col, "inner"))
    return scraped.unionByName(reused)
