import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "src")
if SRC not in sys.path:
    sys.path.insert(0, SRC)
# Spark python workers import `extraction` by module reference — they need
# it on PYTHONPATH before the JVM starts (prod ships a zip via --py-files)
os.environ["PYTHONPATH"] = SRC + os.pathsep + os.environ.get("PYTHONPATH", "")


@pytest.fixture(scope="session")
def spark():
    from extraction.job import build_session

    s = build_session("local[4]", shuffle_partitions=8, app="extraction-tests")
    yield s
    s.stop()
