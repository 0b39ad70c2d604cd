"""URL/domain curation (pipeline/urls.py): expected-value table for
the canonicalization contract, registered-domain suffix rules, domain
filters, DuckDB parity for the dedup key, and map-only plan pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.urls import (
    domain_stats,
    filter_domains,
    normalize_url,
    registered_domain,
    url_dedup_key,
    url_host,
)

CASES = [
    # (input, canonical)
    ("http://Example.COM/path", "http://example.com/path"),
    ("https://www.example.com/", "https://example.com"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    (
        "http://example.com/a?utm_source=x&q=1&utm_medium=y",
        "http://example.com/a?q=1",
    ),
    ("http://example.com/a?gclid=abc", "http://example.com/a"),
    ("http://example.com/a?ref=hn&fbclid=z&x=2", "http://example.com/a?x=2"),
    ("http://user:pw@example.com/a", "http://example.com/a"),
    ("HTTPS://WWW.Example.com/Path/", "https://example.com/Path"),
    ("not a url", None),
    ("/relative/only", None),
]


def test_normalize_url_contract(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "id int, url string"
    )
    got = {
        r["id"]: r["norm"]
        for r in df.select(
            "id", normalize_url("url").alias("norm")
        ).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


DOMAIN_CASES = [
    ("http://a.b.example.com/x", "example.com"),
    ("https://news.bbc.co.uk/story", "bbc.co.uk"),
    ("http://shop.com.au.evil.com/", "evil.com"),
    ("https://www.gov.uk/", "www.gov.uk"),  # www + 2-letter cc + sl label
    ("http://example.ac.jp/x", "example.ac.jp"),
    ("http://localhost/x", "localhost"),
    ("http://example.com", "example.com"),
    ("nonsense", None),
]


def test_registered_domain_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(DOMAIN_CASES)],
        "id int, url string",
    )
    got = {
        r["id"]: r["dom"]
        for r in df.select(
            "id", registered_domain("url").alias("dom")
        ).collect()
    }
    for i, (u, want) in enumerate(DOMAIN_CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_registered_domain_on_bare_host(spark):
    df = spark.createDataFrame([("sub.example.co.uk",)], ["host"])
    assert (
        df.select(
            registered_domain("host", is_host=True).alias("d")
        ).first()["d"]
        == "example.co.uk"
    )


def test_filter_domains_block_and_allow(spark):
    df = spark.createDataFrame(
        [
            (1, "http://spam.example.net/a"),
            (2, "https://keep.org/b"),
            (3, "garbage"),
        ],
        "id int, url string",
    )
    blocked = filter_domains(df, "url", ["example.net"], mode="block")
    assert {r["id"] for r in blocked.collect()} == {2, 3}
    allowed = filter_domains(df, "url", ["keep.org"], mode="allow")
    assert {r["id"] for r in allowed.collect()} == {2}
    with pytest.raises(ValueError):
        filter_domains(df, "url", [], mode="deny")


def test_filter_domains_table_matches_literal_variant(spark):
    """The broadcast-join blocklist twin must agree with the inlined-
    literal filter_domains on every mode, including the NULL-domain
    (unparseable URL) rows, and preserve the input schema."""
    from grafeo_memory_spark.pipeline.urls import filter_domains_table

    df = spark.createDataFrame(
        [
            (1, "http://spam.example.net/a"),
            (2, "https://keep.org/b"),
            (3, "garbage"),
            (4, "https://www.KEEP.org/c"),
        ],
        "id int, url string",
    )
    doms = spark.createDataFrame(
        [("example.net",), ("KEEP.org",)], "domain string"
    )
    for mode, lits in (("block", ["example.net", "keep.org"]),
                       ("allow", ["example.net", "keep.org"])):
        lit_ids = {
            r["id"] for r in filter_domains(df, "url", lits, mode=mode).collect()
        }
        tab_ids = {
            r["id"]
            for r in filter_domains_table(df, "url", doms, mode=mode).collect()
        }
        assert tab_ids == lit_ids, mode
    out = filter_domains_table(df, "url", doms, mode="block")
    assert out.columns == df.columns
    with pytest.raises(ValueError):
        filter_domains_table(df, "url", doms, mode="deny")


def test_filter_domains_table_broadcast_knob(spark):
    """broadcast=False is the over-broadcast-size escape hatch: the
    plan must NOT broadcast the domain table (plain shuffle semi/anti
    join instead), while results stay identical to the default path."""
    from grafeo_memory_spark.pipeline.urls import filter_domains_table

    df = spark.createDataFrame(
        [
            (1, "http://spam.example.net/a"),
            (2, "https://keep.org/b"),
            (3, "garbage"),
        ],
        "id int, url string",
    )
    doms = spark.createDataFrame([("example.net",)], "domain string")
    # Disable size-based auto-broadcast so the plan shape reflects the
    # knob alone (a 1-row test table would otherwise be auto-broadcast);
    # restore whatever threshold the shared session carried, not a
    # hardcoded default.
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = filter_domains_table(
            df, "url", doms, mode="block", broadcast=False
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert {r["id"] for r in out.collect()} == {2, 3}
        bplan = (
            filter_domains_table(df, "url", doms, mode="block")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in bplan or "BroadcastExchange" in bplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_filter_domains_table_dom_column_collision(spark):
    """A caller column literally named `_dom` must survive untouched —
    the staging key picks a non-colliding name instead of shadowing."""
    from grafeo_memory_spark.pipeline.urls import filter_domains_table

    df = spark.createDataFrame(
        [
            (1, "http://spam.example.net/a", "keepme"),
            (2, "https://keep.org/b", "metoo"),
        ],
        "id int, url string, _dom string",
    )
    doms = spark.createDataFrame([("example.net",)], "domain string")
    out = filter_domains_table(df, "url", doms, mode="block")
    assert out.columns == df.columns
    rows = out.collect()
    assert [(r["id"], r["_dom"]) for r in rows] == [(2, "metoo")]


def test_dedup_key_collapses_variants_duckdb_parity(spark):
    urls = [
        "http://Example.com/a?utm_source=x",
        "http://www.example.com:80/a",
        "http://example.com/a#top",
        "http://example.com/b",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url", url_dedup_key("url").alias("key")
    ).collect()
    keys = {r["url"]: r["key"] for r in rows}
    assert keys[urls[0]] == keys[urls[1]] == keys[urls[2]]
    assert keys[urls[3]] != keys[urls[0]]
    # md5-of-canonical parity with DuckDB on the already-canonical form
    con = duckdb.connect()
    want = con.execute(
        "SELECT md5('http://example.com/a')"
    ).fetchone()[0]
    assert keys[urls[0]] == want


def test_domain_stats_rollup(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.example.com/x?utm_source=s"),
            (2, "http://www.a.example.com/x"),
            (3, "http://b.example.com/y"),
            (4, "https://other.org/z"),
            (5, "not a url"),
        ],
        "id int, url string",
    )
    rows = {
        r["domain"]: (r["n_pages"], r["n_urls"])
        for r in domain_stats(df, "url").collect()
    }
    # canonical host keeps subdomains distinct, but the registered
    # domain folds them; urls 1 and 2 canonicalize to different hosts
    # (a.example.com vs a.example.com — www. stripped) → same key
    assert rows["example.com"] == (3, 2)
    assert rows["other.org"] == (1, 1)
    assert None not in rows


def test_normalize_plan_is_map_only(spark):
    df = spark.createDataFrame([("http://x.com/a",)], ["url"])
    plan = (
        df.select(normalize_url("url"), registered_domain("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
