"""Recrawl change-rate estimator (frontier/recrawl.py): hand-computed
Cho–Garcia-Molina values, single-fetch behavior, tier boundaries."""

from __future__ import annotations

import math

import pytest

from web_scraper_spark.frontier import recrawl as rc


def _fetches(spark, rows):
    return spark.createDataFrame(
        rows, "url string, fetch_seq bigint, content_hash string"
    )


def lam(n, x):
    return round(-math.log((n - x + 0.5) / (n + 0.5)), 6)


def test_change_rate_hand_values(spark):
    rows = [
        # u_hot: changes at every one of 4 consecutive-fetch transitions
        ("u_hot", 1, "a"), ("u_hot", 2, "b"), ("u_hot", 3, "c"),
        ("u_hot", 4, "d"), ("u_hot", 5, "e"),
        # u_half: 2 changes in 4 transitions
        ("u_half", 1, "a"), ("u_half", 2, "a"), ("u_half", 3, "b"),
        ("u_half", 4, "b"), ("u_half", 5, "c"),
        # u_static: never changes
        ("u_static", 1, "z"), ("u_static", 2, "z"), ("u_static", 3, "z"),
    ]
    out = {r["url"]: r for r in rc.change_rate(_fetches(spark, rows)).collect()}
    h = out["u_hot"]
    assert (h["n_fetches"], h["n_changes"]) == (5, 4)
    assert h["change_rate"] == pytest.approx(lam(5, 4)) and h["tier"] == "hot"
    m = out["u_half"]
    assert (m["n_fetches"], m["n_changes"]) == (5, 2)
    assert m["change_rate"] == pytest.approx(lam(5, 2)) and m["tier"] == "steady"
    s = out["u_static"]
    assert (s["n_fetches"], s["n_changes"]) == (3, 0)
    # X = 0 -> (n + 0.5)/(n + 0.5) = 1 -> rate exactly 0: never-seen-to-
    # change pages get the minimum cadence, and the value is portable
    # (no libm noise at ln(1))
    assert s["change_rate"] == 0.0 and s["tier"] == "cold"
    assert s["change_rate"] == pytest.approx(lam(3, 0))


def test_change_rate_single_fetch_is_cold(spark):
    rows = [("u1", 1, "a")]
    out = rc.change_rate(_fetches(spark, rows)).collect()[0]
    assert out["n_fetches"] == 1 and out["n_changes"] == 0
    # n=1, X=0 -> lambda = -ln(1.5/1.5)... = -ln(1) = 0 exactly? No:
    # (1 - 0 + 0.5)/(1 + 0.5) = 1.0 -> rate 0.0 -> cold (no evidence)
    assert out["change_rate"] == 0.0 and out["tier"] == "cold"


def test_change_rate_order_is_by_seq_not_input(spark):
    # shuffled input rows: the lag window orders by fetch_seq, so the
    # a->a->b sequence has ONE change regardless of row order
    rows = [("u", 3, "b"), ("u", 1, "a"), ("u", 2, "a")]
    out = rc.change_rate(_fetches(spark, rows)).collect()[0]
    assert out["n_changes"] == 1


def test_change_rate_x_equals_n_minus_one_finite(spark):
    # the naive -ln(1 - X/n) estimator is infinite when every transition
    # changes AND you count X = n; the bias-reduced form is finite for
    # every observable (n, X) — assert the ceiling case stays bounded
    rows = [("u", i, f"h{i}") for i in range(1, 12)]
    out = rc.change_rate(_fetches(spark, rows)).collect()[0]
    assert out["n_changes"] == out["n_fetches"] - 1
    assert math.isfinite(out["change_rate"]) and out["tier"] == "hot"
