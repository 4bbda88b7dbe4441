"""robots.txt gating as a broadcast join + vectorized rule match.

Reference: ``CrawlerCallback.crawl.valid`` consults one RobotFileParser for
the whole crawl (download.py:978, 1022) — note the reference reads the
undefined ``settings.user_agent`` there (latent bug, SURVEY.md §7.4); the
engine takes the agent explicitly.

Rule semantics follow urllib.robotparser's documented behavior: within the
best-matching agent section, the first rule (file order) whose path prefix
matches the URL path decides; no matching rule (or no rules for the
domain) means allowed. Agent specificity: rules for the exact agent beat
``'*'`` rules.

Rules live in a small per-domain table (FIXTURES.md §4) broadcast to the
candidates — robots tables are tiny relative to frontiers (one row per
rule, ~10^5 domains x ~10 rules even at web scale fits a broadcast; if it
ever didn't, the join key (domain) co-partitions with the politeness
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = "domain string, agent string, rule string, path_prefix string, order int"


def parse_robots_txt(domain: str, text: str) -> list[tuple[str, str, str, str, int]]:
    """Parse robots.txt content into ROBOTS_SCHEMA rows.

    Follows urllib.robotparser's reading of the format: ``User-agent``
    lines open a section (consecutive agent lines share the following
    rules), ``Allow``/``Disallow`` lines append rules in file order, ``#``
    comments and unknown directives are ignored, and an empty Disallow
    value means allow-all (recorded as an allow with empty prefix).
    """
    rows: list[tuple[str, str, str, str, int]] = []
    agents: list[str] = []
    expecting_agents = True
    order = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not expecting_agents:
                agents = []
                expecting_agents = True
            agents.append(value)
        elif key in ("allow", "disallow"):
            expecting_agents = False
            if not agents:
                continue
            rule = "allow" if key == "allow" else "disallow"
            if key == "disallow" and value == "":
                rule, value = "allow", ""
            for agent in agents:
                rows.append((domain, agent, rule, value, order))
            order += 1
    return rows


def robots_table(spark, per_domain_texts: dict[str, str]):
    """Build the broadcastable rules DataFrame from raw robots.txt bodies."""
    rows = [
        row for domain, text in per_domain_texts.items()
        for row in parse_robots_txt(domain, text)
    ]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def robots_gate(
    candidates: DataFrame,
    robots: DataFrame,
    user_agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Filter candidates to rows robots.txt allows for ``user_agent``.

    Plan shape: broadcast-join candidates x rules on domain, filter to
    prefix-matching rules, pick the winning rule per URL with a min_by
    aggregation (agent specificity, then file order), allow when the winner
    allows or no rule matched.
    """
    path = F.coalesce(
        F.when(
            F.col(url_col).rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
            F.parse_url(F.col(url_col), F.lit("PATH")),
        ),
        F.lit("/"),
    )
    cand = candidates.withColumn("_path", F.when(path == "", "/").otherwise(path))

    # urllib.robotparser consults exactly ONE section per domain: the
    # exact-agent section when it exists, else the '*' section. A '*' rule
    # must never decide for a domain that has any exact-agent rows — even
    # when none of the exact section's prefixes match the path (no match in
    # the selected section means allowed).
    exact = robots.filter(F.col("agent") == user_agent)
    star = robots.filter(F.col("agent") == "*").join(
        exact.select("domain").distinct(), "domain", "left_anti"
    )
    applicable = exact.unionByName(star)

    joined = cand.join(F.broadcast(applicable), "domain", "left")
    matches = joined.withColumn(
        "_hit",
        F.col("path_prefix").isNotNull()
        & (
            (F.col("path_prefix") == "")
            | F.col("_path").startswith(F.col("path_prefix"))
        ),
    )
    # winner per URL: first-matching rule in file order within the selected
    # section; NULL if none matched
    verdict = matches.groupBy(*[F.col(c) for c in candidates.columns]).agg(
        F.min_by(
            F.col("rule"), F.when(F.col("_hit"), F.col("order"))
        ).alias("_winning_rule")
    )
    allowed = verdict.filter(
        F.col("_winning_rule").isNull() | (F.col("_winning_rule") == "allow")
    )
    return allowed.drop("_winning_rule")
