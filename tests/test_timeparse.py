"""X3/X4 time parsing: Spark column == sequential twin, incl. malformed."""

from datetime import datetime

from pyspark.sql import functions as F

from web_scraper_spark.functions.timeparse import parse_time_col, parse_time_py
from web_scraper_spark.synth.sitegen import SiteConfig, _publish_dt, _time_str


def test_column_matches_python_twin(spark):
    cfg = SiteConfig()
    rows = []
    for source in ["alpha", "beta", "gamma"]:
        for cat in range(3):
            for i in range(8):
                dt = _publish_dt(cfg, source, cat, i)
                rows.append((source, _time_str(source, dt)))
    # malformed / edge inputs must yield NULL, not errors (errors='coerce')
    rows += [
        ("alpha", "N/A"),
        ("beta", "N/A"),
        ("gamma", ""),
        ("alpha", "32/13/2025 99:99 GMT+7"),
        ("beta", "Thứ hai, not/a/date, 08:30 (GMT+7)"),
    ]
    df = spark.createDataFrame(rows, "source string, ts string")
    got = df.select(
        "source", "ts", parse_time_col(F.col("source"), F.col("ts")).alias("parsed")
    ).collect()
    for r in got:
        expected = parse_time_py(r["source"], r["ts"])
        assert r["parsed"] == expected, (r["source"], r["ts"], r["parsed"], expected)


def test_known_values():
    assert parse_time_py("alpha", "01/12/2025 08:30 GMT+7") == datetime(2025, 12, 1, 8, 30)
    assert parse_time_py("beta", "Thứ hai, 1/12/2025, 08:30 (GMT+7)") == datetime(2025, 12, 1, 8, 30)
    assert parse_time_py("gamma", "Thứ ba, 2/12/2025 09:15 (GMT+7)") == datetime(2025, 12, 2, 9, 15)
    assert parse_time_py("alpha", "junk") is None
