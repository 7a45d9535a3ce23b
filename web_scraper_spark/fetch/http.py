"""Live HTTP fetch as a vectorized batch stage (SURVEY.md S3/ST5-ST7).

Replaces the reference's per-URL Selenium ``driver.get`` + sleeps
(CrawlPaperTuoiTre.py:107-110, retry ×3 at :105,133-135, politeness
sleeps CrawlPaperVNExpress.py:277-287) with ``mapInPandas`` batches:

- each Arrow batch fetches sequentially WITHIN the task (per-host
  politeness is already guaranteed upstream: the politeness stage caps
  per-host rows per round and salted repartition spreads hosts across
  tasks, so per-task sequential fetching + the scheduled ``fetch_slot_s``
  offsets bound the per-host request rate);
- retry ×`max_attempts` with exponential backoff per URL; failures return
  a row with ``fetched_ok = false`` so the engine requeues them
  (fail_count budget) instead of crashing the task;
- ``url_rewrite`` maps public URLs to the actual endpoint — the test
  harness uses it to aim at a local replay server; production passes
  identity.

No Selenium: stored-page corpora (Common Crawl WARC) and plain HTTP cover
the reference's sites; a JS-rendering fetcher would slot in at the same
mapInPandas point.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_SCHEMA = (
    "url string, status_code int, html binary, fetched_ok boolean, "
    "attempts int, session_gen int"
)


def http_fetch_batch(
    urls: DataFrame,
    url_rewrite: Callable[[str], str] | None = None,
    timeout_s: float = 10.0,
    max_attempts: int = 3,
    backoff_s: float = 0.2,
    pace: bool = False,
    recycle_every: int = 200,
) -> DataFrame:
    """urls(url [, fetch_slot_s]) → (url, status_code, html, fetched_ok,
    attempts, session_gen). pace=True sleeps out each row's scheduled
    ``fetch_slot_s`` offset relative to the batch start (the parallel
    analogue of the reference's inter-article sleeps).

    ST6 worker recycling: each task keeps a long-lived opener (connection
    pool / cookie state — the analogue of the reference's Chrome
    instance) and rebuilds it after ``recycle_every`` fetches, bounding
    per-session resource growth the way the reference restarts its
    browser every batch (CrawlPaperTuoiTre.py worker restart). The
    emitted ``session_gen`` says which session generation served the row
    (test-assertable)."""
    has_slot = "fetch_slot_s" in urls.columns
    cols = ["url"] + (["fetch_slot_s"] if has_slot else [])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        rewrite = url_rewrite or (lambda u: u)
        opener = urllib.request.build_opener()
        fetches = 0
        gen = 0
        for pdf in it:
            t_start = time.monotonic()
            out = []
            for row in pdf.itertuples(index=False):
                if pace and has_slot and row.fetch_slot_s:
                    wait = row.fetch_slot_s - (time.monotonic() - t_start)
                    if wait > 0:
                        time.sleep(wait)
                if fetches and fetches % recycle_every == 0:
                    opener.close()
                    opener = urllib.request.build_opener()  # recycle (ST6)
                    gen += 1
                fetches += 1
                status, body, ok, attempt = 0, None, False, 0
                for attempt in range(1, max_attempts + 1):
                    try:
                        with opener.open(rewrite(row.url), timeout=timeout_s) as resp:
                            status, body, ok = resp.status, resp.read(), True
                        break
                    except urllib.error.HTTPError as ex:
                        status = ex.code
                        if 400 <= ex.code < 500:
                            break  # permanent: do not retry
                    except (urllib.error.URLError, TimeoutError, OSError):
                        status = -1
                    time.sleep(backoff_s * (2 ** (attempt - 1)))
                out.append((row.url, status, body, ok, attempt, gen))
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "status_code", "html", "fetched_ok", "attempts", "session_gen",
                ],
            )

    return urls.select(*cols).mapInPandas(run, schema=FETCH_SCHEMA)
