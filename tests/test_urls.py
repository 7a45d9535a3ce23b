"""URL canonicalization properties (SURVEY.md §5 property-based tests)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from web_scraper_spark.urls import canon_url_py, host_py

path_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~/%?&=+",
    max_size=30,
)
hosts = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9.\-]{0,20}", fullmatch=True)
schemes = st.sampled_from(["http", "https", "HTTP", "Https"])
urls = st.builds(
    lambda s, h, p: f"{s}://{h}/{p}", schemes, hosts, path_chars
)


@given(urls)
@settings(max_examples=300, deadline=None)
def test_canon_idempotent(u):
    c = canon_url_py(u)
    assert canon_url_py(c) == c


@given(urls)
@settings(max_examples=200, deadline=None)
def test_canon_lowercases_scheme_host(u):
    c = canon_url_py(u)
    scheme, rest = c.split("://", 1)
    host = rest.split("/", 1)[0]
    assert scheme == scheme.lower()
    assert host == host.lower()


def test_canon_examples():
    assert canon_url_py("HTTP://Example.COM:80/a//b#frag") == "http://example.com/a/b"
    assert canon_url_py("https://example.com:443/x") == "https://example.com/x"
    assert canon_url_py("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canon_url_py("https://example.com") == "https://example.com/"
    # percent-decode unreserved, uppercase other escapes
    assert canon_url_py("https://e.com/%41%2fb") == "https://e.com/A%2Fb"
    assert canon_url_py("https://e.com/a?q=1//2#z") == "https://e.com/a?q=1//2"
    assert host_py("https://Ex.COM:8080/a") == "ex.com"


def test_native_chain_matches_python_on_percent_free(spark):
    from pyspark.sql import functions as F

    from web_scraper_spark.urls import canon_url

    samples = [
        "HTTP://Example.COM:80/a//b#frag",
        "https://alpha.example/kinh-te.htm",
        "https://beta.example/kinh-te-p2",
        "https://e.com/a?q=1//2#z",
        "https://example.com",
        "https://Example.com:8443/x",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "url string")
    got = df.select(
        canon_url(F.col("url"), percent_decode=False).alias("native"),
        canon_url(F.col("url"), percent_decode=True).alias("udf"),
    ).collect()
    for s, r in zip(samples, got):
        assert r["native"] == canon_url_py(s) == r["udf"], s


def test_with_canon_split_semantics_and_plan(spark):
    """with_canon must equal canon_url_py on every row (native branch for
    %-free URLs, UDF branch for escaped ones, NULL passthrough), and the
    native branch must carry no Python stage — the Arrow UDF appears once
    in the plan, gated behind the Contains('%') filter."""
    from pyspark.sql import functions as F

    from web_scraper_spark.urls import with_canon

    samples = [
        "HTTP://Example.COM:80/a//b#frag",
        "https://b.example/p%61th/%7Euser",   # unreserved escapes decode
        "https://c.example/ok",
        None,
        "relative/path",
        "https://x.example/a%2Fb",            # reserved escape: must NOT decode
        "https://x.example/50%25off?q=%20x",  # %25/%20 preserved (uppercased)
        "https://x.example/bad%zz",           # invalid escape passes through
        "https://x.example/trail%",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "url string")
    out = with_canon(df)
    got = {r["url"]: r["url_canon"] for r in out.collect()}
    assert len(got) == len(samples)
    for s in samples:
        assert got[s] == (canon_url_py(s) if s is not None else None), s
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_python = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    assert n_python == 1  # exactly the escaped branch
    assert "Contains" in plan  # ... and it sits behind the '%' filter


def test_xxhash_bucket_stability(spark):
    """url_hash is Spark-native xxhash64 — stable across sessions/plans."""
    from pyspark.sql import functions as F

    from web_scraper_spark.urls import url_hash

    df = spark.createDataFrame([("https://a.example/x",)], "url string")
    h1 = df.select(url_hash(F.col("url")).alias("h")).collect()[0]["h"]
    h2 = spark.sql("SELECT xxhash64('https://a.example/x') AS h").collect()[0]["h"]
    assert h1 == h2
