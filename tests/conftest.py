from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from distributed_mapreduce_p2p_spark.session import get_spark

    wh = tempfile.mkdtemp(prefix="spark_wh_")
    spark = get_spark(
        app_name="tests",
        cores=8,
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}",
        },
    )
    yield spark
