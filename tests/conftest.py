import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # for `oracle` imports

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light


@pytest.fixture(scope="session")
def spark():
    from webcrawler_spark.session import get_spark

    s = get_spark(app_name="webcrawler-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_web(tmp_path_factory):
    """Synthetic web written once per test session: pages/seeds/robots."""
    from webcrawler_spark.fixtures import generate, write_parquet

    outdir = str(tmp_path_factory.mktemp("web"))
    paths = write_parquet(outdir, n_pages=150, seed=42)
    pages, seeds, robots = generate(n_pages=150, seed=42)
    return {"paths": paths, "pages": pages, "seeds": seeds, "robots": robots}
