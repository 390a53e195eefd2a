from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nnanalytics_spark.inode import fixture
from nnanalytics_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", **{"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def inodes_pdf():
    return fixture.generate_pandas(levels=2, dirs_per_level=3, files_per_dir=24)


@pytest.fixture(scope="session")
def inodes(spark, inodes_pdf):
    df = spark.createDataFrame(inodes_pdf, schema=fixture.SCHEMA)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def engine(inodes):
    from nnanalytics_spark.inode.engine import INodeEngine

    return INodeEngine(inodes)
