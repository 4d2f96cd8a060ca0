from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from unipdf_spark.pipeline import get_spark

    s = get_spark("unipdf-tests", cores=2, shuffle_partitions=4)
    yield s
    s.stop()
