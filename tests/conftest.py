"""Shared pytest fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Executor python workers must import test modules (cloudpickle pickles
# plugin classes defined in tests by module reference)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [REPO, TESTS, os.environ.get("PYTHONPATH")] if p
)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("schema-enforcer-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # availableNow + applyInPandasWithState + ProcessingTimeTimeout:
        # pending state timers make MicroBatchExecution schedule no-data
        # batches FOREVER (the query only terminates once every timer fired —
        # 30 min here), so every stateful streaming test saturates its
        # awaitTermination cap and leaks a live query. Drain-and-stop
        # maintenance runs must disable no-data batches.
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    from schema_enforcer_spark.synth import gen_transcripts

    df = gen_transcripts(spark, n_convs=30, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def conversations(spark):
    from schema_enforcer_spark.synth import gen_conversations

    return gen_conversations(spark, n_convs=30, seed=42).cache()


@pytest.fixture(scope="session")
def base_manifest():
    from schema_enforcer_spark.manifest import load_manifest

    return load_manifest(os.path.join(REPO, "manifests", "transcripts_base.yml"))
