"""robots.txt text → per-host politeness rules (north-star "robots.txt
rules + crawl-delay budget").

The reference never reads robots.txt at all — it is polite by being
sequential (CrawlPaperVNExpress.py:277-278 sleeps between articles). The
engine's politeness layer consumes a rules TABLE
``(host, crawl_delay, disallow: array<string>)`` (frontier/politeness.py);
this module produces that table from raw ``/robots.txt`` bodies, so a
real crawl can go fetched-bytes → rules → budget without hand-curated
config.

Parsing follows the grammar subset ``urllib.robotparser`` implements
(groups of ``User-agent`` lines followed by rule lines; first matching
group wins, ``*`` group as fallback; substring agent match; ``#``
comments; empty ``Disallow:`` = no restriction; ``Crawl-delay``), and
``parse_robots_text`` is equality-tested against robotparser decisions
(tests/test_robots.py). Two documented deviations, both supersets:
fractional crawl-delays are accepted (robotparser requires digits), and
``Allow`` lines are parsed but returned separately — the engine's filter
model is disallow-prefix-only (an Allow carve-out inside a disallowed
prefix is NOT honored by robots_filter; hosts needing it keep the URL
out via the disallow list instead).

Spark shape: robots bodies are a per-host DIMENSION table (one row per
host, a few KB each — broadcast-sized at any scale), so the line-machine
parse runs as one Arrow ``mapInPandas`` pass over that dim table; the
result joins back to the frontier exactly like the hand-built table. The
fact-side politeness plan (salted windows, broadcast join) is unchanged.
"""

from __future__ import annotations

from urllib.parse import quote, unquote

from pyspark.sql import DataFrame

RULES_SCHEMA = "host string, crawl_delay double, disallow array<string>"


def _norm_path(path: str) -> str:
    """robotparser's RuleLine normalization: unquote then re-quote."""
    return quote(unquote(path.strip()))


def parse_robots_text(text: str, agent: str = "*") -> tuple[float | None, list[str]]:
    """Parse one robots.txt body for ``agent`` → (crawl_delay, disallow
    prefixes). Mirrors urllib.robotparser's group state machine: a
    ``User-agent`` line after rule lines starts a new group, blank lines
    close a group, the FIRST group whose agent list matches wins, and the
    ``*`` group applies only when no specific group matched."""
    agent_key = agent.split("/")[0].lower()

    groups: list[dict] = []  # {'agents': [...], 'disallow': [...], 'delay': ...}
    cur: dict | None = None
    state = 0  # 0 = outside, 1 = collecting agents, 2 = in rules

    def close():
        # robotparser only commits a group once it has rule lines (state 2);
        # a trailing agents-only group is discarded
        nonlocal cur, state
        if cur is not None and cur["agents"] and state == 2:
            groups.append(cur)
        cur, state = None, 0

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            if state == 1:
                cur, state = None, 0
            elif state == 2:
                close()
            continue
        if ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if state == 2:
                close()
            if cur is None:
                cur = {"agents": [], "disallow": [], "delay": None}
            cur["agents"].append(val)
            state = 1
        elif state != 0 and cur is not None:
            if key == "disallow":
                if val:  # empty Disallow: == no restriction
                    cur["disallow"].append(_norm_path(val))
                state = 2
            elif key == "allow":
                state = 2  # parsed-but-unmodeled (see module docstring)
            elif key == "crawl-delay":
                try:
                    cur["delay"] = float(val)
                except ValueError:
                    pass
                state = 2
    close()

    chosen = None
    # robotparser sorts groups into specific entries vs the ONE default
    # entry: any group listing '*' is only ever the fallback (the first
    # such group), even if it also names specific agents
    for g in groups:
        if "*" in g["agents"]:
            continue
        if any(a.lower() in agent_key for a in g["agents"]):  # first match wins
            chosen = g
            break
    if chosen is None:
        for g in groups:  # then the * fallback group
            if "*" in g["agents"]:
                chosen = g
                break
    if chosen is None:
        return None, []
    return chosen["delay"], chosen["disallow"]


def parse_robots_txt(
    bodies: DataFrame, agent: str = "*", default_delay: float | None = None
) -> DataFrame:
    """(host, robots_txt) → the politeness rules table
    ``(host, crawl_delay, disallow)`` consumed by robots_filter /
    select_round. One Arrow pass over the host dimension table; a null or
    empty body yields no restrictions and ``default_delay``."""

    def run(it):
        import pandas as pd

        for pdf in it:
            out = {"host": [], "crawl_delay": [], "disallow": []}
            for host, body in zip(pdf["host"], pdf["robots_txt"]):
                delay, dis = parse_robots_text(body or "", agent=agent)
                out["host"].append(host)
                out["crawl_delay"].append(delay if delay is not None else default_delay)
                out["disallow"].append(dis)
            yield pd.DataFrame(out)

    return bodies.select("host", "robots_txt").mapInPandas(run, RULES_SCHEMA)


def render_robots_txt(
    crawl_delay: float | None, disallow: list[str], agent: str = "*"
) -> str:
    """The inverse (synth/test helper): rules → a robots.txt body that
    parses back to exactly these rules."""
    lines = [f"User-agent: {agent}"]
    if crawl_delay is not None:
        delay = int(crawl_delay) if float(crawl_delay).is_integer() else crawl_delay
        lines.append(f"Crawl-delay: {delay}")
    lines.extend(f"Disallow: {p}" for p in disallow)
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Grammar-edge fixture + DuckDB twin (value-exact oracle)
# ---------------------------------------------------------------------------

#: Deterministic grammar-edge bodies shared by q_robots_parse and its
#: DuckDB twin: multi-agent groups, inline comments, empty Disallow,
#: blank-line group closing (rules after a close are ignored), an
#: agents-only group that must be DISCARDED, an unparsable Crawl-delay
#: value, rule lines before any User-agent (state-0 preamble), a
#: colon-less junk line, and a specific-agent-only host that falls back
#: to defaults for agent '*'.
ROBOTS_GRAMMAR_EDGES: list[tuple[str, str]] = [
    (
        "edge.example",
        "# edge grammar\nUser-agent: alphabot\nUser-agent: betabot\n"
        "Disallow: /x  # inline\nCrawl-delay: 4\nUser-agent: *\n"
        "Disallow:\nDisallow: /private\n",
    ),
    (
        "blank.example",
        "User-agent: *\nDisallow: /a\n\nDisallow: /after-close\n"
        "User-agent: *\nDisallow: /second-star\n",
    ),
    (
        "discard.example",
        "User-agent: lonelybot\n\nUser-agent: *\nCrawl-delay: nine\n"
        "Crawl-delay: 3.5\nDisallow: /q\nUnknown: zz\nDisallow: /r\n",
    ),
    (
        "preamble.example",
        "Disallow: /ignored\nno colon junk line\nUser-agent: *\nDisallow: /ok\n",
    ),
    ("agentsonly.example", "User-agent: *\n"),
    ("nostar.example", "User-agent: somebot\nDisallow: /s\n"),
]


def _sql_str(s: str) -> str:
    """DuckDB escape-string literal for a robots body (newlines kept)."""
    return "e'" + s.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n") + "'"


def robots_parse_sql(
    bodies: list[tuple[str, str]], agent: str = "*", default_delay: float = 1.0
) -> str:
    """DuckDB twin of ``parse_robots_txt`` + the explode in q_robots_parse:
    the urllib.robotparser group state machine restated as ONE pass of
    window functions — no recursion needed, because every transition is a
    function of (line type, previous line type):

    - a ``User-agent`` line opens a NEW group iff the previous
      significant line was a rule or a blank (or start-of-file); group id
      is the running sum of that flag;
    - a blank line CLOSES the current group: lines at or past the group's
      first blank are dead (state-0 in the Python machine), which also
      discards agents-only groups (no rule line survives → not committed);
    - unknown keys and colon-less lines never change state → dropped
      before the lag;
    - ``Crawl-delay`` keeps the LAST parseable value in the live region
      (``max_by(..., ln)`` + ``try_cast``), empty ``Disallow:`` adds no
      prefix but still commits the group;
    - group choice mirrors robotparser's two passes: first group whose
      lowered agent is a substring of the agent key and which does NOT
      list ``*``, else the first ``*`` group.

    The body set is embedded as literals (it is the same deterministic
    fixture the Spark query parses — the PARSER is what each engine
    implements independently). Path normalization (quote∘unquote) is the
    identity on every fixture path; percent-form equivalence is covered
    by tests/test_robots.py's robotparser-equality suite, the same split
    as urls.py's canon twin. Output: (host, crawl_delay, disallow_prefix),
    one row per prefix, NULL when unrestricted."""
    agent_key = agent.split("/")[0].lower()
    values = ",\n        ".join(
        f"({_sql_str(h)}, {_sql_str(b)})" for h, b in bodies
    )
    return f"""
    WITH bodies(host, robots_txt) AS (VALUES
        {values}),
    raw_lines AS (
        SELECT host,
               generate_subscripts(l, 1) AS ln,
               unnest(l) AS raw
        FROM (SELECT host,
                     regexp_split_to_array(coalesce(robots_txt, ''),
                                           '\\r\\n|\\r|\\n') AS l
              FROM bodies)
    ),
    typed AS (
        SELECT host, ln,
               lower(trim(split_part(trim(split_part(raw, '#', 1)), ':', 1))) AS key,
               trim(substr(trim(split_part(raw, '#', 1)),
                    strpos(trim(split_part(raw, '#', 1)), ':') + 1)) AS val,
               CASE
                 WHEN trim(split_part(raw, '#', 1)) = '' THEN 'B'
                 WHEN strpos(trim(split_part(raw, '#', 1)), ':') = 0 THEN NULL
                 WHEN lower(trim(split_part(trim(split_part(raw, '#', 1)), ':', 1)))
                      = 'user-agent' THEN 'U'
                 WHEN lower(trim(split_part(trim(split_part(raw, '#', 1)), ':', 1)))
                      IN ('disallow', 'allow', 'crawl-delay') THEN 'R'
                 ELSE NULL
               END AS type
        FROM raw_lines
    ),
    seq AS (
        SELECT host, ln, type, key, val,
               lag(type) OVER (PARTITION BY host ORDER BY ln) AS prev_type
        FROM typed WHERE type IS NOT NULL
    ),
    grouped AS (
        SELECT host, ln, type, key, val,
               sum(CASE WHEN type = 'U'
                             AND (prev_type IS NULL OR prev_type IN ('R', 'B'))
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY host ORDER BY ln
                         ROWS UNBOUNDED PRECEDING) AS gid
        FROM seq
    ),
    valid AS (
        SELECT g.* FROM grouped g
        WHERE g.gid > 0
          AND g.ln < coalesce((SELECT min(ln) FROM grouped b
                               WHERE b.host = g.host AND b.gid = g.gid
                                 AND b.type = 'B'),
                              9223372036854775807)
    ),
    groups AS (
        SELECT host, gid,
               list(val ORDER BY ln) FILTER (WHERE type = 'U') AS agents,
               list(val ORDER BY ln)
                   FILTER (WHERE type = 'R' AND key = 'disallow'
                           AND val <> '') AS disallow,
               max_by(try_cast(val AS DOUBLE), ln)
                   FILTER (WHERE type = 'R' AND key = 'crawl-delay'
                           AND try_cast(val AS DOUBLE) IS NOT NULL) AS delay,
               bool_or(type = 'R') AS has_rule
        FROM valid
        GROUP BY host, gid
    ),
    chosen AS (
        SELECT host, gid, delay, disallow,
               row_number() OVER (
                 PARTITION BY host
                 ORDER BY (NOT list_contains(agents, '*')) DESC, gid
               ) AS pick
        FROM groups
        WHERE has_rule
          AND (list_contains(agents, '*')
               OR (NOT list_contains(agents, '*')
                   AND len(list_filter(agents,
                           a -> strpos({_sql_str(agent_key)}, lower(a)) > 0)) > 0))
    )
    SELECT b.host,
           coalesce(c.delay, {default_delay}) AS crawl_delay,
           u.p AS disallow_prefix
    FROM bodies b
    LEFT JOIN (SELECT * FROM chosen WHERE pick = 1) c ON b.host = c.host
    LEFT JOIN LATERAL unnest(c.disallow) AS u(p) ON true
    ORDER BY b.host, disallow_prefix
    """
