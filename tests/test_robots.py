"""robots.txt politeness: pattern translation, RFC 9309 group parsing,
and the JVM longest-match gate — expectations hand-derived from the RFC
9309 examples (no generated SQL anywhere here)."""

import pytest

from case_uco_ontology_map_spark.functions.robots import (
    parse_robots,
    robots_decisions,
    robots_filter,
    robots_like_pattern,
)


def test_like_pattern_translation():
    assert robots_like_pattern("/private/") == "/private/%"
    assert robots_like_pattern("/*.gif$") == "/%.gif"
    assert robots_like_pattern("/a*b") == "/a%b%"
    assert robots_like_pattern("/100%_off") == r"/100\%\_off%"
    assert robots_like_pattern("/exact$") == "/exact"
    assert robots_like_pattern("/") == "/%"


_ROBOTS = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/open/

User-agent: greedybot
Disallow: /

User-agent: alpha
User-agent: beta
Disallow: /shared/

User-agent: alpha
Allow: /shared/docs/
Disallow:
"""


def _rules(spark, agent):
    df = spark.createDataFrame(
        [("example.org", _ROBOTS)], "host string, robots_txt string"
    )
    rows = parse_robots(df, agent).collect()
    return sorted((r.pattern, r.is_allow) for r in rows)


def test_parse_star_group(spark):
    # unknown agent falls back to the * group
    assert _rules(spark, "somebot") == [
        ("/private/", False),
        ("/private/open/", True),
    ]


def test_parse_specific_overrides_star(spark):
    # greedybot has its own group: * rules must NOT apply
    assert _rules(spark, "GreedyBot") == [("/", False)]


def test_parse_consecutive_agents_and_group_merge(spark):
    # alpha appears in a shared UA header AND its own later group; the
    # groups merge; the empty Disallow emits nothing
    assert _rules(spark, "alpha") == [
        ("/shared/", False),
        ("/shared/docs/", True),
    ]
    assert _rules(spark, "beta") == [("/shared/", False)]


def test_parse_no_body_or_no_rules(spark):
    df = spark.createDataFrame(
        [("a.org", None), ("b.org", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )
    assert parse_robots(df, "bot").count() == 0


def _decide(spark, urls, rules):
    udf = spark.createDataFrame([(u,) for u in urls], "url string")
    rdf = spark.createDataFrame(
        [
            (h, p, a, robots_like_pattern(p), len(p))
            for h, p, a in rules
        ],
        "host string, pattern string, is_allow boolean, "
        "like_pat string, rlen int",
    )
    got = robots_decisions(udf, rdf).collect()
    return {r.url: r.allowed for r in got}


def test_longest_match_wins(spark):
    rules = [
        ("e.org", "/private/", False),
        ("e.org", "/private/open/", True),
    ]
    d = _decide(
        spark,
        [
            "http://e.org/private/x",
            "http://e.org/private/open/x",
            "http://e.org/public/x",
            "http://e.org/",
        ],
        rules,
    )
    assert d == {
        "http://e.org/private/x": False,
        "http://e.org/private/open/x": True,
        "http://e.org/public/x": True,  # no matching rule → allowed
        "http://e.org/": True,
    }


def test_tie_allow_wins_and_wildcards(spark):
    rules = [
        ("e.org", "/page", True),  # len 5
        ("e.org", "/*.ph", False),  # len 5 — RFC 9309 example: allow wins
        ("e.org", "/*.gif$", False),
        ("e.org", "/fish*.php", False),
    ]
    d = _decide(
        spark,
        [
            "http://e.org/page.php5",  # tie → allow
            "http://e.org/pic.gif",  # $ anchor hits
            "http://e.org/pic.gif?x=1",  # query defeats the $ anchor
            "http://e.org/fishheads/catfish.php?p=2",  # * spans segments
        ],
        rules,
    )
    assert d == {
        "http://e.org/page.php5": True,
        "http://e.org/pic.gif": False,
        "http://e.org/pic.gif?x=1": True,
        "http://e.org/fishheads/catfish.php?p=2": False,
    }


def test_unknown_host_allowed_and_root_rule(spark):
    rules = [("closed.org", "/", False)]
    d = _decide(
        spark,
        ["http://closed.org", "http://closed.org/a", "http://open.org/a"],
        rules,
    )
    assert d == {
        "http://closed.org": False,  # empty path matches as '/'
        "http://closed.org/a": False,
        "http://open.org/a": True,
    }


def test_filter_end_to_end(spark):
    df = spark.createDataFrame(
        [("example.org", "User-agent: *\nDisallow: /no/\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(df, "bot")
    urls = spark.createDataFrame(
        [("http://example.org/no/1",), ("http://www.example.org/no/2",),
         ("http://example.org/yes/1",)],
        "url string",
    )
    kept = sorted(r.url for r in robots_filter(urls, rules).collect())
    # www. strips to the same host — both /no/ urls drop
    assert kept == ["http://example.org/yes/1"]


def test_like_metacharacters_do_not_leak(spark):
    # a literal % or _ in a rule must not act as a LIKE wildcard
    rules = [("e.org", "/100%_off", False)]
    d = _decide(
        spark,
        ["http://e.org/100%_off/sale", "http://e.org/100XYoff/sale"],
        rules,
    )
    assert d == {
        "http://e.org/100%_off/sale": False,
        "http://e.org/100XYoff/sale": True,
    }


def test_fetch_waves_politeness_invariant(spark):
    from case_uco_ontology_map_spark.functions.robots import fetch_waves

    urls = [
        (f"http://h{i % 3}.org/p/{i}",) for i in range(20)
    ] + [("http://hub.org/only",)]
    df = spark.createDataFrame(urls, "url string")
    out = fetch_waves(df, per_wave=2).collect()
    # politeness: no (host, wave) holds more than per_wave urls
    from collections import Counter

    c = Counter((r.host, r.wave) for r in out)
    assert max(c.values()) <= 2
    # waves are dense 0..ceil(n/k)-1 per host and every url is scheduled
    assert len(out) == 21
    waves_h0 = sorted(r.wave for r in out if r.host == "h0.org")
    assert waves_h0 == [0, 0, 1, 1, 2, 2, 3]  # 7 urls, k=2
    assert [r.wave for r in out if r.host == "hub.org"] == [0]
    # determinism: a different partitioning yields the identical schedule
    again = fetch_waves(df.repartition(7), per_wave=2).collect()
    assert sorted((r.url, r.wave) for r in again) == sorted(
        (r.url, r.wave) for r in out
    )


def test_robots_sitemaps_discovery(spark):
    import duckdb
    import pandas as pd

    from case_uco_ontology_map_spark.functions.robots import (
        robots_sitemaps,
        robots_sitemaps_sql,
    )

    body_a = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://a.test/sitemap.xml\n"
        "sitemap:https://a.test/news.xml  # comment after\r\n"
        "SITEMAP: https://a.test/sitemap.xml\n"  # duplicate -> distinct
    )
    body_b = "User-agent: bot\nDisallow: /\n# Sitemap: https://hidden.test/s.xml\n"
    rows = [("a.test", body_a), ("b.test", body_b)]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {
        (r.host, r.sitemap_url) for r in robots_sitemaps(df).collect()
    }
    assert got == {
        ("a.test", "https://a.test/sitemap.xml"),
        ("a.test", "https://a.test/news.xml"),
    }
    con = duckdb.connect()
    con.register("r_src", pd.DataFrame(rows, columns=["host", "robots_txt"]))
    want = {
        tuple(r)
        for r in con.execute(
            "WITH r AS (SELECT * FROM r_src) " + robots_sitemaps_sql()
        ).fetchall()
    }
    assert got == want
