import os
import shutil
import tempfile

import pytest

from etl_warehouse_agnostic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="etlwa-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
