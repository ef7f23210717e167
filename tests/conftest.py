import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _ensure_protobuf() -> None:
    """Unblock transformWithStateInPandas in images without protobuf.

    The TWS state-server protocol needs ``google.protobuf`` in BOTH the
    driver and the streaming Python workers. This image ships no
    protobuf wheel, but the gcloud SDK bundles a pure-Python copy
    (6.32.0-dev). When the real package is missing and that copy
    exists, put it on sys.path AND the process PYTHONPATH (workers are
    spawned with the JVM's env, which inherits ours — this must run
    BEFORE the SparkSession/JVM starts, hence module import time).
    PySpark 4.1's generated StateMessage gencode is 6.33.0 — one minor
    ahead of the bundled runtime — so protobuf's own documented escape
    hatch (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) is set too; the
    wire format is stable across that gap and the parity test asserts
    values, so a real incompatibility would fail loudly, not silently.
    Test-harness adaptation only: the engine itself never references
    this path.
    """
    import os

    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    gae = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(gae, "google", "protobuf")):
        return
    sys.path.append(gae)
    os.environ["PYTHONPATH"] = (
        os.environ["PYTHONPATH"] + os.pathsep + gae
        if os.environ.get("PYTHONPATH")
        else gae
    )
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


_ensure_protobuf()

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
