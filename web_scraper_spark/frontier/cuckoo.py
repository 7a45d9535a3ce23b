"""Partitioned cuckoo filter over the URL-seen set (north-rule component).

The north rule names "bloom/cuckoo URL-seen" as the frontier's membership
structure; frontier/bloom.py is the deployed backend, and this module is
the CUCKOO alternative at the exact same table interface —
``(bucket, table)`` rows, bucket-cogrouped membership, incremental
delta maintenance — plus the one capability a Bloom filter cannot offer:
**deletion** (URL retire / forced re-crawl without rebuilding the seen
structure).

Design (Fan et al. 2014, "Cuckoo Filter: Practically Better Than
Bloom", public): per partition-bucket, a table of ``m`` cuckoo buckets ×
``b`` slots of ``f``-bit fingerprints (uint16 here, fp 0 reserved for
empty). Item with 64-bit hash h:

    fp  = low 16 bits of h, forced nonzero
    i1  = (h >> 16) mod m
    i2  = i1 XOR H(fp)        (partial-key cuckoo: i2's dual is i1)

Insert tries both buckets, then kicks a random-ish victim (deterministic
rotation here — no RNG, runs reproduce) up to ``max_kicks`` times.
Lookup checks 2b slots — false positive rate ≈ 2b/2^f ≈ 0.012% at
b=4/f=16, two orders tighter than the 1% Bloom sizing for the same
state budget class. Deletion clears ONE matching slot; per the standard
cuckoo caveat it is only sound for items actually inserted (deleting a
never-inserted item can evict a colliding twin's fingerprint — callers
delete from the seen set, which by construction only holds inserted
URLs).

Scale shape — identical to the Bloom backend: the filter state lives as
a TABLE, never transits the driver, and membership is bucket-cogrouped
(one partition-bucket's candidates meet that one bucket's filter bytes).
Incremental maintenance inserts only the round's delta hashes into the
prior table (insert is why cuckoo state, unlike Bloom bitmaps, cannot
OR-merge — the delta arrives as hashes, exactly what the commit path
already has in seen_delta).

Reference analogue: the in-memory Python set of
CrawlPaperTuoiTre.py:56-67 — exact and deletable but single-machine;
this keeps the deletability at table scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CUCKOO_TABLE_SCHEMA = "bucket int, table binary"


class CuckooSpec:
    def __init__(self, n_buckets: int = 16, m: int = 1 << 14, b: int = 4,
                 max_kicks: int = 500):
        self.n_buckets = n_buckets  # partition buckets (table rows)
        self.m = m                  # cuckoo buckets per partition bucket
        self.b = b                  # slots per cuckoo bucket
        self.max_kicks = max_kicks
        assert self.m & (self.m - 1) == 0, "m must be a power of 2"

    @classmethod
    def for_capacity(cls, n_items: int, n_buckets: int = 256,
                     load: float = 0.84) -> "CuckooSpec":
        """Size m so per-partition-bucket occupancy stays under ``load``
        (b=4 cuckoo tables fill reliably to ~0.95; 0.84 leaves skew
        headroom). The 10^10-URL design point at 4096 partition buckets:
        ~2.44M items/bucket → m = 2^20, state = m·b·2 B = 8 MiB/bucket,
        ~32 GiB total — same order as the Bloom table, with deletes."""
        import math

        per_bucket = max(1, n_items // n_buckets)
        m = 1 << max(8, math.ceil(math.log2(per_bucket / (4 * load))))
        return cls(n_buckets=n_buckets, m=m)

    # -- fingerprint / index arithmetic (vectorized) ----------------------

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty-slot sentinel
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return ((h.astype(np.uint64) >> np.uint64(16))
                & np.uint64(self.m - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # H(fp): the multiply-shift hash the cuckoo-filter paper uses
        hfp = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.m - 1
        )
        return (i.astype(np.uint64) ^ hfp).astype(np.int64)

    # -- per-partition-bucket filter ops ----------------------------------

    def empty_table(self) -> np.ndarray:
        return np.zeros((self.m, self.b), dtype=np.uint16)

    def insert_into(self, table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        """Insert hashes (in order) into ``table`` in place; returns it.
        Raises on kick exhaustion — sizing (for_capacity) is the contract,
        overflow is a configuration bug, not a silent false negative."""
        fps = self._fp(hashes)
        i1s = self._i1(hashes)
        for fp, i1 in zip(fps, i1s):
            fp = np.uint16(fp)
            i2 = int(self._alt(np.array([i1]), np.array([fp]))[0])
            placed = False
            for idx in (int(i1), i2):
                empt = np.nonzero(table[idx] == 0)[0]
                if len(empt):
                    table[idx, empt[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # kick loop: deterministic victim rotation (slot k % b)
            idx = int(i1)
            cur = fp
            for k in range(self.max_kicks):
                slot = k % self.b
                cur, table[idx, slot] = table[idx, slot], cur
                idx = int(self._alt(np.array([idx]), np.array([cur]))[0])
                empt = np.nonzero(table[idx] == 0)[0]
                if len(empt):
                    table[idx, empt[0]] = cur
                    break
            else:
                raise RuntimeError(
                    f"cuckoo filter overflow (m={self.m}, b={self.b}) — "
                    "resize via CuckooSpec.for_capacity"
                )
        return table

    def build_table(self, hashes: np.ndarray) -> bytes:
        return self.insert_into(self.empty_table(), hashes).tobytes()

    def _load(self, blob: bytes) -> np.ndarray:
        return np.frombuffer(blob, dtype=np.uint16).reshape(self.m, self.b)

    def maybe_contains(self, blob: bytes, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        table = self._load(blob)
        fps = self._fp(hashes)
        i1s = self._i1(hashes)
        i2s = self._alt(i1s, fps)
        hit1 = (table[i1s] == fps[:, None]).any(axis=1)
        hit2 = (table[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete_from(self, blob: bytes, hashes: np.ndarray) -> bytes:
        """Clear ONE matching slot per hash (sound for inserted items)."""
        table = self._load(blob).copy()
        fps = self._fp(hashes)
        i1s = self._i1(hashes)
        i2s = self._alt(i1s, fps)
        for fp, i1, i2 in zip(fps, i1s, i2s):
            for idx in (int(i1), int(i2)):
                slots = np.nonzero(table[idx] == fp)[0]
                if len(slots):
                    table[idx, slots[0]] = 0
                    break
        return table.tobytes()


# -- DataFrame layer: same contract as frontier/bloom.py ------------------

def bucket_cuckoo_df(seen_df, spec: CuckooSpec):
    """seen_df(url_hash long, bucket int) -> (bucket, table): one cuckoo
    table per partition bucket, built executor-side (no driver collect).
    Hashes are sorted per bucket so the build is partition-layout-
    invariant (insert order affects slot placement, not membership)."""

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = spec.build_table(
            np.sort(pdf["url_hash"].to_numpy(dtype=np.int64))
        )
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "table": [blob]}
        )

    return (
        seen_df.select("bucket", "url_hash")
        .groupBy("bucket")
        .applyInPandas(per_bucket, schema=CUCKOO_TABLE_SCHEMA)
    )


def merge_cuckoo_delta(table_df, delta_df, spec: CuckooSpec):
    """tables(k) = insert(tables(k-1), seen_delta(k)) — the incremental
    round update. Cogrouped per bucket: one prior table + that bucket's
    delta HASHES (cuckoo state cannot OR-merge; inserting the delta is
    the spec's update primitive and the commit path has the hashes)."""

    def upd(tab_pdf: pd.DataFrame, delta_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(tab_pdf) == 0:
            bucket = int(delta_pdf["bucket"].iloc[0])
            tab = spec.empty_table()
        else:
            bucket = int(tab_pdf["bucket"].iloc[0])
            tab = spec._load(bytes(tab_pdf["table"].iloc[0])).copy()
        if len(delta_pdf):
            spec.insert_into(
                tab, np.sort(delta_pdf["url_hash"].to_numpy(dtype=np.int64))
            )
        return pd.DataFrame({"bucket": [bucket], "table": [tab.tobytes()]})

    return (
        table_df.groupBy("bucket")
        .cogroup(delta_df.select("bucket", "url_hash").groupBy("bucket"))
        .applyInPandas(upd, schema=CUCKOO_TABLE_SCHEMA)
    )


def delete_cuckoo_df(table_df, retired_df, spec: CuckooSpec):
    """Remove retired URLs (e.g. forced re-crawl) from the seen filter —
    the operation the Bloom backend fundamentally cannot do."""

    def rm(tab_pdf: pd.DataFrame, ret_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(tab_pdf) == 0:
            return pd.DataFrame({"bucket": [], "table": []})
        bucket = int(tab_pdf["bucket"].iloc[0])
        blob = bytes(tab_pdf["table"].iloc[0])
        if len(ret_pdf):
            blob = spec.delete_from(
                blob, ret_pdf["url_hash"].to_numpy(dtype=np.int64)
            )
        return pd.DataFrame({"bucket": [bucket], "table": [blob]})

    return (
        table_df.groupBy("bucket")
        .cogroup(retired_df.select("bucket", "url_hash").groupBy("bucket"))
        .applyInPandas(rm, schema=CUCKOO_TABLE_SCHEMA)
    )


def split_by_cuckoo_table(candidates_df, table_df, spec: CuckooSpec):
    """Drop-in for bloom.split_by_bloom_table: candidates(url_hash,
    bucket, ...) ⋈ tables(bucket, table) -> (definitely_new, maybe_seen,
    cache_handle). Same bucket-cogrouped delivery, same no-false-negative
    guarantee (for inserted items), same downstream exact anti-join for
    the maybe branch."""
    cols = candidates_df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in candidates_df.schema.fields
    ) + ", maybe_seen boolean"

    def flag(cand_pdf: pd.DataFrame, tab_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf.copy()
        if len(cand_pdf) == 0 or len(tab_pdf) == 0:
            out["maybe_seen"] = np.zeros(len(cand_pdf), dtype=bool)
            return out
        out["maybe_seen"] = spec.maybe_contains(
            bytes(tab_pdf["table"].iloc[0]),
            cand_pdf["url_hash"].to_numpy(dtype=np.int64),
        )
        return out

    flagged = (
        candidates_df.groupBy("bucket")
        .cogroup(table_df.groupBy("bucket"))
        .applyInPandas(flag, schema=schema)
        .cache()
    )
    new = flagged.filter(~flagged.maybe_seen).select(*cols)
    maybe = flagged.filter(flagged.maybe_seen).select(*cols)
    return new, maybe, flagged
