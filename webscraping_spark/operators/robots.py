"""robots.txt gating as a broadcast join + vectorized rule match.

Reference: ``CrawlerCallback.crawl.valid`` consults one RobotFileParser for
the whole crawl (download.py:978, 1022) — note the reference reads the
undefined ``settings.user_agent`` there (latent bug, SURVEY.md §7.4); the
engine takes the agent explicitly.

Entry/rule semantics follow urllib.robotparser exactly:

* the file parses into *entries* (sections); consecutive ``User-agent``
  lines share the following rules;
* an entry containing ``*`` among its agents becomes the *default* entry —
  the whole entry, including any named agents, which then never match by
  name — and only the FIRST such entry counts (``_add_entry``);
* ``can_fetch`` scans named entries in file order and uses the first one
  that *applies to* the user agent: an entry applies when any of its agent
  tokens, lowercased, is a **substring** of ``useragent.split('/')[0]
  .lower()`` (``Entry.applies_to``). No applicable named entry → the
  default entry decides; no default → allowed;
* within the selected entry, the first rule (file order) whose path prefix
  matches decides (``Entry.allowance``); a ``*`` path matches everything;
  no matching rule means allowed; an empty ``Disallow`` value is allow-all.

Rules live in a small per-domain table (FIXTURES.md §4) broadcast to the
candidates — robots tables are tiny relative to frontiers (one row per
rule, ~10^5 domains x ~10 rules even at web scale fits a broadcast; if it
ever didn't, the join key (domain) co-partitions with the politeness
shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = (
    "domain string, agent string, rule string, path_prefix string, "
    "order int, entry int"
)


def parse_robots_txt(domain: str, text: str) -> list[tuple[str, str, str, str, int, int]]:
    """Parse robots.txt content into ROBOTS_SCHEMA rows.

    Follows urllib.robotparser's reading of the format: ``User-agent``
    lines open a section (consecutive agent lines share the following
    rules), ``Allow``/``Disallow`` lines append rules in file order, ``#``
    comments and unknown directives are ignored, and an empty Disallow
    value means allow-all (recorded as an allow with empty prefix).

    ``entry`` numbers sections in file order; a section whose agents
    include ``*`` is emitted with the single agent ``'*'`` (robotparser
    folds the whole entry into the default entry) and only the first such
    section is kept.
    """
    rows: list[tuple[str, str, str, str, int, int]] = []
    agents: list[str] = []
    section: list[tuple[str, str, int]] = []
    expecting_agents = True
    entry = 0
    order = 0
    have_default = False

    def flush() -> None:
        nonlocal entry, have_default
        if not agents or not section:
            return
        if "*" in agents:
            # robotparser._add_entry: the whole entry becomes the default
            # entry (named co-agents never match) and the first '*' entry
            # wins; later ones are dropped.
            if not have_default:
                have_default = True
                for rule, prefix, o in section:
                    rows.append((domain, "*", rule, prefix, o, entry))
        else:
            for agent in agents:
                for rule, prefix, o in section:
                    rows.append((domain, agent, rule, prefix, o, entry))
        entry += 1

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not expecting_agents:
                flush()
                agents, section = [], []
                expecting_agents = True
            agents.append(value)
        elif key in ("allow", "disallow"):
            expecting_agents = False
            if not agents:
                continue
            rule = "allow" if key == "allow" else "disallow"
            if key == "disallow" and value == "":
                rule, value = "allow", ""
            section.append((rule, value, order))
            order += 1
    flush()
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

    Plan shape (zero candidate-side exchange): select the applicable
    section per domain on the (small) rules side — substring agent match
    per ``Entry.applies_to``, first applicable named entry in file order,
    ``'*'`` default only for domains with no applicable named entry —
    collapse it to ONE row per domain carrying a file-ordered
    ``ARRAY<STRUCT<order,rule,path_prefix>>``, broadcast-join candidates
    against that table, and decide per row with higher-order
    ``filter``/``element_at`` expressions (first matching rule in file
    order wins; no match / no rules = allowed). The candidate frame never
    shuffles: the round-3 design aggregated the JOINED frame with a
    ``groupBy`` over every candidate column, which re-exchanged the whole
    batch for a decision computable per-row (and broke on un-groupable
    column types such as maps).

    Wildcard note (strict robotparser parity): a ``Disallow: *`` rule is
    matched as the literal prefix ``'*'`` — which blocks (almost) nothing —
    exactly like urllib.robotparser, where ``RuleLine`` quotes rule paths
    (``quote('*') == '%2A'``) so its ``path == "*"`` wildcard branch is
    dead code and ``'Disallow: *'`` only blocks paths that literally start
    with ``'*'`` (quoted ``'%2A'`` on both sides there, raw ``'*'`` on both
    sides here). The engine gates canonicalized URLs, for which quoting is
    the identity on the ASCII-safe set, so no quote pass is applied.
    """
    path = F.coalesce(
        F.when(
            F.col(url_col).rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"),
            F.parse_url(F.col(url_col), F.lit("PATH")),
        ),
        F.lit("/"),
    )
    cand = candidates.withColumn("_path", F.when(path == "", "/").otherwise(path))

    # Entry.applies_to: lowercase the agent token and test substring
    # containment against the UA's first '/'-separated token. The agent
    # string is constant for the gate, so this runs on the tiny rules side.
    ua_token = user_agent.split("/")[0].lower()
    named = robots.filter(
        (F.col("agent") != "*")
        & F.lit(ua_token).contains(F.lower(F.col("agent")))
    )
    # can_fetch scans entries in file order; the first applicable named
    # entry decides alone.
    first_entry = named.groupBy("domain").agg(F.min("entry").alias("_win_entry"))
    named = (
        named.join(first_entry, "domain")
        .filter(F.col("entry") == F.col("_win_entry"))
        .drop("_win_entry")
    )
    # The default entry is consulted last: only for domains where no named
    # entry applied.
    star = robots.filter(F.col("agent") == "*").join(
        named.select("domain").distinct(), "domain", "left_anti"
    )
    applicable = named.unionByName(star)

    # ONE array row per domain, file-ordered (struct sorts by its first
    # field, `order`) — the only exchange in the whole gate is this groupBy
    # on the tiny rules side, which then broadcasts.
    rules_arr = applicable.groupBy("domain").agg(
        F.sort_array(
            F.collect_list(F.struct("order", "rule", "path_prefix"))
        ).alias("_rules")
    )
    joined = cand.join(F.broadcast(rules_arr), "domain", "left")
    # Entry.allowance: first rule (file order) whose prefix matches decides;
    # empty prefix matches everything; no match / no rules row = allowed.
    # F.get (not element_at): null on empty arrays under ANSI mode
    winner = F.get(
        F.filter(
            F.col("_rules"),
            lambda r: (r["path_prefix"] == "")
            | F.col("_path").startswith(r["path_prefix"]),
        ),
        0,
    )
    allowed = joined.filter(winner.isNull() | (winner["rule"] == "allow"))
    return allowed.select(*candidates.columns)
