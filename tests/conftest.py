from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vaero_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "vaero_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
            ),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcripts_pdf():
    from vaero_spark.testing.fixtures import make_transcripts_pdf

    return make_transcripts_pdf(n_turns=3000, n_convs=80, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    from vaero_spark.sources.transcripts import TRANSCRIPTS_SCHEMA

    return spark.createDataFrame(transcripts_pdf, TRANSCRIPTS_SCHEMA)
