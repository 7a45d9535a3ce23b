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
