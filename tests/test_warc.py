"""WARC writer + parsers (sources/warc.py).

Value-exactness of the codegen tier vs DuckDB is covered by the oracle
replica (`warc_parse` is a registered oracled query); these tests pin
the byte-level contract the oracle can't see:

- writer → byte-walk parser roundtrip is IDENTITY, including multibyte
  payloads (Content-Length counts octets, not chars) and planted decoys
  (payloads containing ``WARC/1.0`` banners and CRLFCRLF blank lines —
  exactly what breaks regex splitting);
- the codegen tier equals the byte-walk parser on clean payloads;
- a corrupted Content-Length surfaces as ``length_ok = false``;
- the codegen plan is Python-free (it must run at scan speed).
"""

from pyspark.sql import functions as F

from web_scraper_spark.sources import warc as wa


def _archive(spark, rows):
    """rows: (url, date, payload) → one-archive DataFrame via the writer."""
    df = spark.createDataFrame(rows, "url string, dt string, payload string")
    rec = wa.warc_record(F.col("url"), F.col("dt"), F.col("payload"))

    def _rec_of(x):
        return x["rec"]

    return (
        df.select("url", rec.alias("rec"))
        .groupBy()
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("url", "rec"))), _rec_of),
                "",
            ).alias("body")
        )
        .select(F.lit("t.warc").alias("archive"), "body")
    )


CLEAN = [
    ("https://a.example/1", "2025-12-01T00:00:00Z", "plain ascii payload"),
    ("https://a.example/2", "2025-12-02T00:00:00Z", "tiếng Việt — đa byte"),
    ("https://a.example/3", "2025-12-03T00:00:00Z", ""),
]

DECOYS = CLEAN + [
    (
        "https://a.example/4",
        "2025-12-04T00:00:00Z",
        "fake banner WARC/1.0\r\nWARC-Type: response\r\n\r\ninside payload\r\n\r\ntail",
    ),
]


def test_stream_parser_roundtrip_identity_with_decoys(spark):
    out = {
        r["url"]: r
        for r in wa.warc_records_stream(_archive(spark, DECOYS)).collect()
    }
    assert len(out) == len(DECOYS)
    for url, dt, payload in DECOYS:
        r = out[url]
        assert r["payload"] == payload  # byte-identity incl. decoy bytes
        assert r["warc_date"] == dt
        assert r["content_length"] == len(payload.encode("utf-8"))
    # records come back in writer order
    idx = [out[u]["rec_idx"] for u, _, _ in sorted(DECOYS)]
    assert idx == sorted(idx)


def test_codegen_tier_matches_stream_parser_on_clean_payloads(spark):
    arch = _archive(spark, CLEAN)
    cg = sorted(
        (r["url"], r["warc_date"], r["content_length"], r["payload"], r["length_ok"])
        for r in wa.warc_entries(arch).collect()
    )
    st = sorted(
        (r["url"], r["warc_date"], r["content_length"], r["payload"], True)
        for r in wa.warc_records_stream(arch).collect()
    )
    assert cg == st
    assert all(t[4] for t in cg)


def test_corrupt_content_length_flags_not_crashes(spark):
    arch = _archive(spark, CLEAN[:1]).select(
        "archive",
        F.regexp_replace("body", r"Content-Length: \d+", "Content-Length: 9999").alias(
            "body"
        ),
    )
    rows = wa.warc_entries(arch).collect()
    assert len(rows) == 1 and rows[0]["length_ok"] is False


def test_codegen_plan_is_python_free(spark):
    plan = (
        wa.warc_entries(_archive(spark, CLEAN))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan
