"""U5 HTML scraping: URI rewrite, selector chain, resume, consumer feed."""

from __future__ import annotations

from eirepolitic_data_pipeline_spark.enrich.scrape import (
    extract_photo_url,
    scrape_photo_urls,
    to_public_profile_url,
)
from eirepolitic_data_pipeline_spark.tables.consumers import (
    member_profile_metrics,
)

PAGE = "https://www.oireachtas.ie/en/members/member/X-1/"


def test_to_public_profile_url():
    assert to_public_profile_url(
        "https://data.oireachtas.ie/ie/oireachtas/member/id/X-1"
    ) == "https://www.oireachtas.ie/en/members/member/X-1/"
    assert to_public_profile_url("https://example.com/p") == "https://example.com/p/"
    assert to_public_profile_url("not a url") is None
    assert to_public_profile_url(None) is None


def test_extract_photo_url_selector_priority():
    html = """
    <img class="decor" src="/banner.png">
    <div class="member-image"><img src="/div-img.jpg"></div>
    <img class="member-profile-photo" src="/fallback.jpg">
    <img class="hero c-member-about__img" src="/primary.jpg">
    <img src="/media/members/photo/last.jpg">
    """
    # primary class wins over every fallback
    assert extract_photo_url(html, PAGE) == \
        "https://www.oireachtas.ie/primary.jpg"
    # remove primary -> second selector
    h2 = html.replace("c-member-about__img", "x")
    assert extract_photo_url(h2, PAGE) == \
        "https://www.oireachtas.ie/fallback.jpg"
    # remove both class selectors -> div.member-image img
    h3 = h2.replace("member-profile-photo", "y")
    assert extract_photo_url(h3, PAGE) == \
        "https://www.oireachtas.ie/div-img.jpg"
    # remove div -> src-substring fallback
    h4 = h3.replace("member-image", "z")
    assert extract_photo_url(h4, PAGE) == \
        "https://www.oireachtas.ie/media/members/photo/last.jpg"
    # nothing matches -> None
    assert extract_photo_url("<img src='/banner.png'>", PAGE) is None


def test_scrape_photo_urls_end_to_end(spark):
    def fetcher_factory():
        def fetch(url):
            if "M-2" in url:
                raise IOError("boom")  # fetch failure -> null
            code = url.rstrip("/").rsplit("/", 1)[-1]
            return f'<img class="c-member-about__img" src="/photo/{code}.jpg">'
        return fetch

    df = spark.createDataFrame(
        [("M-1", "Alice A", "https://data.oireachtas.ie/ie/oireachtas/member/id/M-1"),
         ("M-2", "Bob B", "https://data.oireachtas.ie/ie/oireachtas/member/id/M-2"),
         ("M-3", "Cara C", "garbage-uri")],
        "member_code string, member_name string, member_uri string")
    out = {r["member_code"]: r["photo_url"]
           for r in scrape_photo_urls(df, fetcher_factory).collect()}
    assert out == {
        "M-1": "https://www.oireachtas.ie/photo/M-1.jpg",
        "M-2": None,   # fetch raised
        "M-3": None,   # unreachable URI
    }


def test_scrape_resume_skips_existing(spark):
    def fetcher_factory():
        def fetch(url):
            if "M-1" in url:
                raise AssertionError("M-1 must not be re-fetched")
            return '<img class="c-member-about__img" src="/new.jpg">'
        return fetch

    df = spark.createDataFrame(
        [("M-1", "Alice A", "https://example.com/m1"),
         ("M-2", "Bob B", "https://example.com/m2")],
        "member_code string, member_name string, member_uri string")
    existing = spark.createDataFrame(
        [("M-1", "https://cdn/old.jpg"), ("M-9", "")],
        "member_code string, photo_url string")
    out = {r["member_code"]: r["photo_url"]
           for r in scrape_photo_urls(df, fetcher_factory,
                                      existing=existing).collect()}
    assert out == {"M-1": "https://cdn/old.jpg",
                   "M-2": "https://example.com/new.jpg"}


def test_scraper_output_feeds_member_profile_metrics(spark):
    """The consumer job's `photos` input is exactly the scraper's output."""
    def fetcher_factory():
        return lambda url: \
            '<img class="c-member-about__img" src="/p/alice.jpg">'

    roster = spark.createDataFrame(
        [("M-1", "Alice A", "https://example.com/m1")],
        "member_code string, member_name string, member_uri string")
    photos = scrape_photo_urls(roster, fetcher_factory)

    members = spark.createDataFrame(
        [("M-1", "Alice A", "Dublin", "Party P")],
        "member_code string, full_name string, constituency string, party string")
    votes = spark.createDataFrame(
        [("v1", "M-1")], "vote_id string, member_code string")
    debates = spark.createDataFrame(
        [("M-1", "Housing", "2024-03-01")],
        "member_code string, PoliticalIssues string, date string")
    row = member_profile_metrics(members, votes, photos, debates,
                                 target_year=2024).collect()[0]
    assert row["photo_url"] == "https://example.com/p/alice.jpg"
    assert row["member_code"] == "M-1"
