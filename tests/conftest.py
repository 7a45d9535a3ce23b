import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from web_scraper_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(
        app_name="tests", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    yield s


@pytest.fixture(scope="session")
def site_cfg():
    from web_scraper_spark.synth.sitegen import SiteConfig

    return SiteConfig()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
