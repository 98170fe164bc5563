"""robots.txt parsing + crawl-permission decisions (tempeh_spark.robots)."""

from __future__ import annotations


def test_robots_rules_group_assembly(spark):
    """Sequential-format edges: stacked User-agent lines share the group's
    rules, comments and blank lines vanish, CRLF files parse (the \\r is
    trimmed), directives are case-insensitive, and an empty Disallow
    yields NO rule (the spec's 'no restriction' form)."""
    from tempeh_spark.robots import robots_rules

    txt = (
        "# top comment\r\n"
        "USER-AGENT: BotA\r\n"
        "user-agent: botb\r\n"
        "DISALLOW: /x # trailing comment\r\n"
        "\r\n"
        "User-agent: *\r\n"
        "Disallow:\r\n"
        "allow: /y\r\n"
    )
    df = spark.createDataFrame([("h.example", txt)], "host string, robots_txt string")
    rules = {(r["agent"], r["allow"], r["pattern"]) for r in robots_rules(df).collect()}
    assert rules == {
        ("bota", False, "/x"),
        ("botb", False, "/x"),
        ("*", True, "/y"),
    }


def test_robots_allowed_decisions(spark):
    """Longest prefix wins; an Allow beats a Disallow of EQUAL length;
    exact-agent group preferred over '*'; hosts without rules allow all;
    a bare-authority url is judged as path '/'."""
    from tempeh_spark.robots import robots_allowed, robots_rules

    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /p\nAllow: /p\nDisallow: /p/deep\n"),
            ("b.example", "User-agent: me\nAllow: /only\nDisallow: /\nUser-agent: *\nAllow: /\n"),
            ("c.example", "# nothing\n"),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://a.example/p/x"),      # /p tie -> allow wins
            (2, "http://a.example/p/deep/y"), # longer disallow wins
            (3, "http://b.example/only/f"),   # exact group allow
            (4, "http://b.example/other"),    # exact group disallow /
            (5, "http://c.example/z"),        # no rules -> allowed
            (6, "http://a.example"),          # bare authority -> '/'
        ],
        "doc_id long, url string",
    )
    out = {r["doc_id"]: r for r in robots_allowed(urls, rules, "Me").collect()}
    assert out[1]["allowed"] is True
    assert out[2]["allowed"] is False
    assert out[3]["allowed"] is True
    assert out[4]["allowed"] is False  # '*' Allow:/ must NOT leak into the exact group
    assert out[5]["allowed"] is True
    assert out[6]["allowed"] is True and out[6]["path"] == "/"
