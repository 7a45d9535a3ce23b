"""Per-source visible-time parsing (SURVEY.md X3/X4).

The reference normalizes stringly: TuoiTre straight strptime
(`ConnectAndSave.py:49-50`), VNExpress/ZNews via a 4-step regex chain —
strip weekday prefix, strip '(GMT+7)', zero-pad day/month — then
`%d/%m/%Y %H:%M` (`ConnectAndSave.py:52-60`). The engine expresses the
same normalization as native Catalyst ``regexp_replace`` + ``to_timestamp``
with non-padded patterns ('d/M/yyyy'), so no padding step is needed and
the whole chain stays inside whole-stage codegen.

``parse_time_py`` is the sequential twin used by the crawl simulator;
tests assert column == twin on every generated time string.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_time_col(source_col: Column, ts_col: Column, as_of: Column | None = None) -> Column:
    """Parse the visible time string into a timestamp, per source.

    ``as_of`` enables the beta relative forms ('X giờ trước', 'X phút
    trước', 'Hôm qua, HH:MM' — CrawlPaperVNExpress.py:87-104) anchored to
    a PARAMETER clock, never now() (SURVEY.md §7 determinism)."""
    # try_to_timestamp ≡ pandas errors='coerce' (ConnectAndSave.py:49) and is
    # ANSI-mode-safe (plain to_timestamp throws on malformed input in Spark 4)
    alpha = F.try_to_timestamp(
        F.regexp_replace(ts_col, r"\s*GMT\+7\s*$", ""), F.lit("dd/MM/yyyy HH:mm")
    )
    # beta: 'Thứ X, d/M/yyyy, HH:mm (GMT+7)'  gamma: 'Thứ X, d/M/yyyy HH:mm (GMT+7)'
    stripped = F.regexp_replace(
        F.regexp_replace(ts_col, r"^[^,]+,\s*", ""), r"\s*\(GMT\+7\)\s*$", ""
    )
    bg = F.coalesce(
        F.try_to_timestamp(stripped, F.lit("d/M/yyyy, HH:mm")),
        F.try_to_timestamp(stripped, F.lit("d/M/yyyy HH:mm")),
    )
    if as_of is not None:
        hours = F.regexp_extract(ts_col, r"^(\d+) giờ trước$", 1)
        mins = F.regexp_extract(ts_col, r"^(\d+) phút trước$", 1)
        yday = F.regexp_extract(ts_col, r"^Hôm qua, (\d{1,2}:\d{2})$", 1)
        rel = F.when(
            hours != "", F.timestamp_add("HOUR", -hours.try_cast("int"), as_of)
        ).when(
            mins != "", F.timestamp_add("MINUTE", -mins.try_cast("int"), as_of)
        ).when(
            yday != "",
            F.try_to_timestamp(
                F.concat(
                    F.date_format(F.date_sub(as_of.cast("date"), 1), "yyyy-MM-dd"),
                    F.lit(" "),
                    yday,
                ),
                F.lit("yyyy-MM-dd H:mm"),
            ),
        )
        bg = F.coalesce(rel, bg)
    return F.when(source_col == "alpha", alpha).otherwise(bg)


def parse_time_py(source: str, s: str, as_of: datetime | None = None) -> datetime | None:
    """Sequential twin of :func:`parse_time_col` (including the relative
    forms when ``as_of`` is given — same anchoring, same source gating)."""
    import re
    from datetime import timedelta

    if not s:
        return None
    try:
        if source == "alpha":
            return datetime.strptime(re.sub(r"\s*GMT\+7\s*$", "", s), "%d/%m/%Y %H:%M")
        if as_of is not None:
            m = re.match(r"^(\d+) giờ trước$", s)
            if m:
                return as_of - timedelta(hours=int(m.group(1)))
            m = re.match(r"^(\d+) phút trước$", s)
            if m:
                return as_of - timedelta(minutes=int(m.group(1)))
            m = re.match(r"^Hôm qua, (\d{1,2}):(\d{2})$", s)
            if m:
                d = as_of.date() - timedelta(days=1)
                return datetime(d.year, d.month, d.day, int(m.group(1)), int(m.group(2)))
        t = re.sub(r"^[^,]+,\s*", "", s)
        t = re.sub(r"\s*\(GMT\+7\)\s*$", "", t)
        for fmt in ("%d/%m/%Y, %H:%M", "%d/%m/%Y %H:%M"):
            try:
                return datetime.strptime(t, fmt)
            except ValueError:
                continue
        return None
    except ValueError:
        return None
