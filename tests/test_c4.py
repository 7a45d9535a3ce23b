"""C4 page/line cleaning rules (operators/c4.py).

Value-exactness vs DuckDB on the real corpus is covered by the oracle
replica (`c4_filters` is a registered oracled query, punct gate
reported-not-enforced there — the corpus is punctuation-free). These
tests pin the SEMANTICS on planted texts WITH punctuation, including the
faithful require_punct mode and its DuckDB twin.
"""

import duckdb
import pandas as pd
import pytest

from web_scraper_spark.operators import c4


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df.repartition(parts) if parts else df


# chunk=6: 6-word lines clear the MIN_LINE_WORDS=5 floor, tail chunks don't
CHUNK = 6


def _run(spark, rows, **kw):
    out = c4.c4_filters(_docs(spark, rows), chunk=CHUNK, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_line_rules(spark):
    rows = [
        # 3 chunk-lines of 6 words, none mentioning javascript
        (0, " ".join(f"a{i}" for i in range(18))),
        # second chunk carries 'javascript'
        (1, " ".join("javascript" if i == 7 else f"b{i}" for i in range(18))),
        # 2 full chunks + a 3-word tail chunk (short)
        (2, " ".join(f"c{i}" for i in range(15))),
    ]
    out = _run(spark, rows)
    assert out[0]["n_lines"] == 3 and out[0]["n_js"] == 0
    assert out[0]["n_kept"] == 3 and out[0]["n_short"] == 0
    assert out[1]["n_js"] == 1 and out[1]["n_kept"] == 2
    assert out[2]["n_lines"] == 3 and out[2]["n_short"] == 1
    assert out[2]["n_kept"] == 2


def test_page_dispositions(spark):
    base = " ".join(f"w{i}" for i in range(24))  # 4 kept 6-word lines
    rows = [
        (0, base),                                           # keep
        (1, base + " viagra"),                               # badword
        (2, base + " some Lorem Ipsum filler"),              # lorem
        (3, base + " code { brace"),                         # brace
        (4, "tiny doc"),                                     # few lines
        (5, ""),                                             # empty
    ]
    out = _run(spark, rows, require_punct=False)
    assert out[0]["disposition"] == "keep"
    assert out[1]["disposition"] == "drop_badword" and out[1]["has_badword"]
    assert out[2]["disposition"] == "drop_lorem" and out[2]["has_lorem"]
    assert out[3]["disposition"] == "drop_brace" and out[3]["has_brace"]
    assert out[4]["disposition"] == "drop_few_lines"
    assert out[5]["n_lines"] == 0 and out[5]["disposition"] == "drop_few_lines"
    # precedence: badword beats lorem beats brace
    both = _run(spark, [(0, base + " viagra lorem ipsum { x")])
    assert both[0]["disposition"] == "drop_badword"


def test_punct_gate(spark):
    # 6-word chunk-lines; with CHUNK=6 each line is one sentence
    lines_punct = ["this line has six words here."] * 3
    lines_none = ["this line has six words here"] * 3
    rows = [(0, " ".join(lines_punct)), (1, " ".join(lines_none))]
    out = {
        r["doc_id"]: r.asDict()
        for r in c4.c4_filters(_docs(spark, rows), chunk=6, require_punct=True).collect()
    }
    assert out[0]["n_punct_lines"] == 3 and out[0]["n_kept"] == 3
    assert out[0]["disposition"] == "keep"
    assert out[1]["n_punct_lines"] == 0 and out[1]["n_kept"] == 0
    assert out[1]["disposition"] == "drop_few_lines"


@pytest.mark.parametrize("require_punct", [False, True])
def test_duckdb_twin_on_planted_punctuated_text(spark, require_punct):
    """The registered oracle runs the punct-free corpus; this pins the
    require_punct variant's twin on text with real punctuation, plus the
    NULL-text row (both sides must emit it as an empty page, not drop it)."""
    rows = [
        (0, "Allow six word lines to pass here. Another full sentence of six words!"),
        (1, "no punctuation at all in this one but plenty of words to chunk"),
        (2, "short."),
        (3, "bad viagra page with punctuation everywhere. yes indeed it is one."),
        (4, "JavaScript required. " * 4),
        (5, None),
    ]
    df = c4.c4_filters(_docs(spark, rows), chunk=6, require_punct=require_punct)
    sdata = sorted(map(tuple, df.collect()))
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    odata = sorted(
        map(tuple, con.execute(c4.c4_filters_sql(chunk=6, require_punct=require_punct)).fetchall())
    )
    assert sdata == odata


def test_partition_invariant(spark):
    rows = [(i, " ".join(f"t{i}w{j}" for j in range(25))) for i in range(8)]
    a = sorted(map(tuple, c4.c4_filters(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, c4.c4_filters(_docs(spark, rows, 5)).collect()))
    assert a == b


def test_plan_shape(spark):
    df = c4.c4_filters(_docs(spark, [(i, "w " * 30) for i in range(4)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SinglePartition" not in plan
