from __future__ import annotations

import os
from contextlib import contextmanager

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from housenumbercore_spark.session import get_spark

    s = get_spark(app_name="hns-tests", cores=4, shuffle_partitions=8)
    # the 'reliable' pin strategy refuses to run without a durable
    # checkpoint dir (pinning.py); provision a throwaway one so the suite
    # can run under HNC_PIN_STRATEGY=reliable for cross-strategy sweeps
    if os.environ.get("HNC_PIN_STRATEGY") == "reliable":
        import shutil
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="hns_tests_ckpt_")
        s.sparkContext.setCheckpointDir(ckpt)
        yield s
        shutil.rmtree(ckpt, ignore_errors=True)
        return
    yield s


@contextmanager
def forced_pin_strategy(spark, value: str):
    """Force the pin strategy via session conf for a plan-shape assertion
    (conf outranks the HNC_PIN_STRATEGY env in pinning.pin_strategy), then
    restore whatever was set before — so plan tests that assert one
    strategy's physical shape stay green when the suite runs under
    another strategy's env."""
    from housenumbercore_spark.pinning import CONF_KEY

    prev = spark.conf.get(CONF_KEY, None)
    spark.conf.set(CONF_KEY, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(CONF_KEY)
        else:
            spark.conf.set(CONF_KEY, prev)
