"""Driver-local literal rows → DataFrame without a Python-RDD job.

``spark.createDataFrame(list_of_tuples)`` serializes through a Python RDD
— a full executor-side Python-worker job costing ~0.5 s warm and multiple
seconds cold PER CALL (measured; see also core/postops.py's note). For
the tiny driver-side frames this codebase builds — result assembly after
a streaming parity run, broadcast dimension tables, one-row markers —
the pandas path converts on the driver (Arrow when enabled, plain
iteration otherwise; identical result either way) and runs ~7× faster
warm with no executor fan-out at all.

Schema is applied POSITIONALLY (the tuples' order), same as the list
path. Empty input falls back to the list path, where the explicit schema
carries the types pandas inference can't see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows), schema)
