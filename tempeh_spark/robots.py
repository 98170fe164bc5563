"""robots.txt parsing and crawl-permission decisions, as DataFrame ops.

The reference has no crawl-policy layer (its surface ends at parse/extract
— see SURVEY.md §2 Part C); this implements the original robots.txt
PREFIX-matching core of RFC 9309: user-agent groups, Allow/Disallow
rules, longest-match-wins with Allow breaking ties. The ``*``/``$``
wildcard EXTENSIONS are deliberately out of scope (documented subset) —
they would force regex translation whose escape syntax differs between
engines, breaking the oracle-twin contract for no gate value.

Group assembly is the interesting part: robots.txt is a SEQUENTIAL
format (consecutive ``User-agent`` lines open a group; following rules
belong to every agent of that group, until the next ``User-agent`` run).
That per-file sequential state is expressed entirely with window
functions over (host, line_no) — no Python in the loop, so a million
hosts' robots files parse as one codegen pipeline:

* ``lag(is_ua)`` marks the first line of each ``User-agent`` run,
* a running ``sum`` over the markers numbers the groups,
* rules join back to their group's agent rows on (host, group_id).

Decision semantics (``robots_allowed``): a fetch agent uses its
exact-named group if the host has one, else the ``*`` group, else
everything is allowed; among matching rules (path startswith pattern)
the LONGEST pattern wins and an Allow beats a Disallow of equal length.
An empty pattern is dropped at parse time (``Disallow:`` with no value
means "no restriction" per the spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into one rule row per (host, agent):
    ``(host, agent, allow BOOLEAN, pattern, plen)``.

    Scale shape: lines are a bounded per-file explode; group assembly is
    two windows keyed by host (lag + running sum — robots files are tiny,
    so per-host partitions are trivially balanced); the agent×rule
    attachment is one equi-join on (host, group_id). Nothing leaves
    codegen.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw"),
    )
    # strip comments then surrounding blanks (the spec's WS is space/tab;
    # \r survives line-splitting CRLF files and is trimmed here too)
    clean = F.regexp_replace(F.col("raw"), "#.*$", "")
    clean = F.regexp_replace(clean, r"^[ \t\r]+|[ \t\r]+$", "")
    parsed = lines.select(
        "host",
        "ln",
        F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)[ \t]*:", 1)).alias("d"),
        F.regexp_replace(
            F.regexp_extract(clean, r"^[A-Za-z-]+[ \t]*:(.*)$", 1),
            r"^[ \t]+|[ \t]+$",
            "",
        ).alias("v"),
    ).where(F.col("d").isin("user-agent", "allow", "disallow"))
    w_line = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("d") == "user-agent").cast("int")
    # first line of each User-agent RUN starts a group; stacked UA lines
    # share the group (lag over the previous directive line)
    starts = F.when(
        (is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w_line), F.lit(0)) == 0),
        1,
    ).otherwise(0)
    grouped = parsed.select(
        "host",
        "ln",
        "d",
        "v",
        F.sum(starts).over(w_line).alias("gid"),
    )
    agents = (
        grouped.where(F.col("d") == "user-agent")
        .select("host", "gid", F.lower(F.col("v")).alias("agent"))
        .distinct()
    )
    rules = grouped.where(
        F.col("d").isin("allow", "disallow") & (F.col("v") != "")
    ).select(
        "host",
        "gid",
        (F.col("d") == "allow").alias("allow"),
        F.col("v").alias("pattern"),
        F.length("v").alias("plen"),
    )
    return rules.join(agents, ["host", "gid"]).select(
        "host", "agent", "allow", "pattern", "plen"
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-url crawl permission for ``agent`` against a parsed rule table:
    ``(doc_id, host, path, allowed)``.

    Group selection per host: the exact-named agent group when present,
    else the ``*`` group; hosts with neither allow everything. Among
    rules whose pattern is a PREFIX of the path, the longest wins, Allow
    breaking length ties (``max_by`` over the (plen, allow) key — any
    full-key tie carries the same verdict, so the argmax is
    deterministic).

    Scale shape: one small agg over the rule table (per-host group
    choice), one equi-join urls×rules on host (rule counts per host are
    tiny), one per-url max_by agg. The rule side is policy data — Spark
    broadcasts it when it fits.
    """
    from tempeh_spark.webgraph import url_host

    a = agent.lower()
    mine = rules.where(F.col("agent").isin(a, "*"))
    has_exact = mine.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("hx")
    )
    chosen = (
        mine.join(has_exact, "host")
        .where(
            ((F.col("hx") == 1) & (F.col("agent") == a))
            | ((F.col("hx") == 0) & (F.col("agent") == "*"))
        )
        .select("host", "allow", "pattern", "plen")
    )
    base = urls.select(
        F.col(id_col).alias("doc_id"),
        url_host(url_col).alias("host"),
        # path = everything from the first '/' after the authority; a
        # bare authority url gets '/' (what a crawler requests)
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    hits = (
        base.join(chosen, "host")
        .where(F.col("path").startswith(F.col("pattern")))
        .groupBy("doc_id")
        .agg(
            # longest pattern wins, Allow breaks length ties: one INTEGER
            # argmax key (plen*2 + allow) — integer so the oracle's
            # arg_max sorts identically; a full-key tie carries the same
            # verdict, so the argmax is deterministic
            F.max_by(
                "allow", F.col("plen") * 2 + F.col("allow").cast("int")
            ).alias("verdict")
        )
    )
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        "host",
        "path",
        F.coalesce("verdict", F.lit(True)).alias("allowed"),
    )
