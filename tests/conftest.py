import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_T2_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from web_maxiv_hdbppviewer_spark.session import get_spark

    # Env-tunable so the parity suite can replay the driver's grain
    # exactly (sf0.01) AND at a different parallelism: every query's
    # float discipline is supposed to be partition-count-invariant
    # (integer/fixed-point accumulation, round-then-canonicalize), and
    # running the same sweep at local[32]/shuffle=32 vs the default
    # local[8]/shuffle=8 is the cheap way to catch an order-dependent
    # float sum before the driver does.
    s = get_spark(
        app_name="hdbpp-spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8")),
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_SMOKE}/{name}.parquet')"
        )
    yield con
    con.close()
