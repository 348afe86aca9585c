from __future__ import annotations

import pytest

from cdcrypt.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cdcrypt-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
