import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gds-spark-tests", cores=8, shuffle_partitions=2, driver_memory="8g",
                  extra_conf={"spark.sql.adaptive.enabled": "false"})  # tiny fixtures: AQE/job overhead dominates
    yield s


@pytest.fixture()
def tmp_ckpt(tmp_path):
    return str(tmp_path / "ckpt")
