"""Cuckoo-filter seen-set backend (frontier/cuckoo.py).

Contract mirror of test_bloom_table_incremental_merge_and_split, plus
the cuckoo-only capability: deletion. The split must behave exactly like
the Bloom path from the engine's perspective — zero false negatives,
maybe-branch resolved by the exact anti-join — so the final "who is
actually new" answer is proven equal to exact set arithmetic.
"""

import numpy as np
import pytest

from web_scraper_spark.frontier.cuckoo import (
    CuckooSpec,
    bucket_cuckoo_df,
    delete_cuckoo_df,
    merge_cuckoo_delta,
    split_by_cuckoo_table,
)

SPEC = CuckooSpec(n_buckets=4, m=1 << 10, b=4)


def _rng():
    return np.random.default_rng(7)


def _hashes(rng, n):
    return rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)


def _to_df(spark, hs):
    return spark.createDataFrame(
        [(int(h), int(h) % 4) for h in hs], "url_hash long, bucket int"
    )


def test_spec_no_false_negatives_and_fpr_bound():
    rng = _rng()
    inserted = _hashes(rng, 2000)
    blob = SPEC.build_table(np.sort(inserted))
    assert SPEC.maybe_contains(blob, inserted).all()  # zero false negatives
    fresh = np.setdiff1d(_hashes(rng, 20000), inserted)
    fpr = SPEC.maybe_contains(blob, fresh).mean()
    # theory: ~2b/2^f = 8/65536 ≈ 0.00012; assert an order of slack
    assert fpr < 0.002, fpr


def test_spec_delete_is_sound_for_inserted_items():
    rng = _rng()
    inserted = _hashes(rng, 1500)
    blob = SPEC.build_table(np.sort(inserted))
    retire, keep = inserted[:200], inserted[200:]
    blob2 = SPEC.delete_from(blob, retire)
    assert SPEC.maybe_contains(blob2, keep).all()  # survivors intact
    # retired items are gone (fp-collision within the same two buckets is
    # possible in theory; at this fill it must be rare — require >99% gone)
    assert SPEC.maybe_contains(blob2, retire).mean() < 0.01


def test_spec_overflow_raises_not_silently_drops():
    tiny = CuckooSpec(n_buckets=1, m=8, b=4, max_kicks=50)
    with pytest.raises(RuntimeError, match="overflow"):
        tiny.build_table(np.arange(1000, dtype=np.int64) * 2654435761)


def test_table_build_is_partition_invariant(spark):
    hs = _hashes(_rng(), 800)
    a = {
        r["bucket"]: bytes(r["table"])
        for r in bucket_cuckoo_df(_to_df(spark, hs), SPEC).collect()
    }
    b = {
        r["bucket"]: bytes(r["table"])
        for r in bucket_cuckoo_df(_to_df(spark, hs).repartition(13), SPEC).collect()
    }
    assert a == b  # sorted insert makes the layout canonical


def test_incremental_delta_equals_rebuild_membership(spark):
    rng = _rng()
    h1, h2 = _hashes(rng, 500), _hashes(rng, 500)
    merged = {
        r["bucket"]: bytes(r["table"])
        for r in merge_cuckoo_delta(
            bucket_cuckoo_df(_to_df(spark, h1), SPEC), _to_df(spark, h2), SPEC
        ).collect()
    }
    allh = np.concatenate([h1, h2])
    for h in allh:
        assert SPEC.maybe_contains(
            merged[int(h) % 4], np.array([h], dtype=np.int64)
        )[0]


def test_split_resolves_to_exact_new_set(spark):
    rng = _rng()
    seen = _hashes(rng, 600)
    fresh = np.setdiff1d(_hashes(rng, 600), seen)
    cand = np.concatenate([seen[:150], fresh])
    table_df = bucket_cuckoo_df(_to_df(spark, seen), SPEC)
    new, maybe, handle = split_by_cuckoo_table(_to_df(spark, cand), table_df, SPEC)
    maybe_h = {r["url_hash"] for r in maybe.collect()}
    new_h = {r["url_hash"] for r in new.collect()}
    assert set(int(h) for h in seen[:150]) <= maybe_h  # no false negatives
    # engine downstream: exact anti-join resolves the maybe branch
    seen_set = set(int(h) for h in seen)
    resolved_new = new_h | {h for h in maybe_h if h not in seen_set}
    assert resolved_new == set(int(h) for h in cand) - seen_set
    handle.unpersist()


def test_dataframe_delete_enables_recrawl(spark):
    rng = _rng()
    seen = _hashes(rng, 600)
    retire = seen[:100]
    table_df = bucket_cuckoo_df(_to_df(spark, seen), SPEC)
    after = delete_cuckoo_df(table_df, _to_df(spark, retire), SPEC)
    new, maybe, handle = split_by_cuckoo_table(
        _to_df(spark, seen), after, SPEC
    )
    new_h = {r["url_hash"] for r in new.collect()}
    # retired URLs now pass the filter as definitely-new (re-crawlable)...
    assert len(new_h & set(int(h) for h in retire)) >= 99
    # ...while the remaining seen never leak into definitely-new
    assert not (new_h & set(int(h) for h in seen[100:]))
    handle.unpersist()
