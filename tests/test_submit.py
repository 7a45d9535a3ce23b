"""The spark-submit deployment path's packaging contract (north rule:
``spark-submit --py-files web_scraper_spark.zip scripts/run_crawl.py``).

scripts/submit.sh ships the library as a zip on the executor/driver
path; that only works if every module imports cleanly FROM the zip —
no ``__file__``-relative data loads, no import-time Spark session, no
filesystem assumptions. The full submit is exercised manually
(documented in SURVEY.md §8); this test pins the packaging contract
itself in seconds: build the identical zip and import the engine's
module graph from it in a subprocess whose cwd/sys.path exclude the
repo checkout.
"""

import pathlib
import subprocess
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent

MODULES = [
    "web_scraper_spark.frontier.engine",
    "web_scraper_spark.frontier.state",
    "web_scraper_spark.frontier.bloom",
    "web_scraper_spark.frontier.robots",
    "web_scraper_spark.frontier.politeness",
    "web_scraper_spark.queries",
    "web_scraper_spark.operators.dedup",
    "web_scraper_spark.operators.similarity",
    "web_scraper_spark.operators.multimodal",
    "web_scraper_spark.pipeline.entities",
    "web_scraper_spark.pipeline.segment",
    "web_scraper_spark.html.udfs",
    "web_scraper_spark.synth.sitegen",
    "web_scraper_spark.streaming.windows",
]


def test_package_imports_from_pyfiles_zip(tmp_path):
    zip_path = tmp_path / "web_scraper_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "web_scraper_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO).as_posix())

    prog = (
        "import sys\n"
        f"sys.path.insert(0, {str(zip_path)!r})\n"
        + "".join(f"import {m}\n" for m in MODULES)
        + "import web_scraper_spark\n"
        f"assert {str(zip_path)!r} in web_scraper_spark.__file__, web_scraper_spark.__file__\n"
        "print('ZIP_IMPORT_OK')\n"
    )
    # cwd=tmp_path so the repo checkout can't shadow the zip on sys.path
    out = subprocess.run(
        [sys.executable, "-c", prog], cwd=tmp_path, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "ZIP_IMPORT_OK" in out.stdout
