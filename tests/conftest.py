import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_pbf2json_spark.session import get_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_session(app_name="osm-pbf2json-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def alexanderplatz(spark):
    from osm_pbf2json_spark.sources.fixtures import load_fixture

    t = load_fixture(spark, "alexanderplatz")
    t.nodes.cache().count()
    t.ways.cache().count()
    t.relations.cache().count()
    return t


@pytest.fixture(scope="session")
def wilhelmstrasse(spark):
    from osm_pbf2json_spark.sources.fixtures import load_fixture

    t = load_fixture(spark, "wilhelmstrasse")
    t.nodes.cache().count()
    t.ways.cache().count()
    t.relations.cache().count()
    return t


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
