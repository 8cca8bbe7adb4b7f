"""Shared Spark fixture (reference test strategy, SURVEY §5.1):
session-scoped local session, 2 shuffle partitions, UTC."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        "tests", master="local[4]", shuffle_partitions=2
    )
    yield session
    session.stop()


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")


SF_SMOKE = "/root/testdata/sf0.001"
