import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moogle_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    return get_spark(app="moogle_tests", cores=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def built_warehouse(spark, tmp_path_factory):
    """One 200-doc index shared by the query/parity tests."""
    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs

    wh = str(tmp_path_factory.mktemp("wh") / "warehouse")
    docs = generate_docs(spark, 200)
    build_index(spark, docs, wh)
    return wh


@pytest.fixture(scope="session")
def oracle_index():
    from moogle_spark.corpus import generate_docs_local
    from moogle_spark.oracle import build_oracle_index

    return build_oracle_index(generate_docs_local(200))
