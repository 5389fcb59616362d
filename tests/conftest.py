import shutil

import pytest

from hoopstat_haus_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8)
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    d = str(tmp_path / "table")
    yield d
    shutil.rmtree(d, ignore_errors=True)
