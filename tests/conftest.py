import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyield_spark.session import get_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_session("pyield_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    # default sf0.001 keeps the suite fast; tools/oracle_sweep.sh's
    # ANSI-on lap overrides to sf0.01 (the driver's gate SF)
    import os

    return os.environ.get("PYIELD_TEST_SF_DIR", "/root/testdata/sf0.001")
