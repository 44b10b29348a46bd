"""Custom stateful streaming operator: cross-batch stream deduplication via
``applyInPandasWithState`` (the API the 100 TB streaming story needs when
built-in ``dropDuplicates`` watermark state is not enough — here state is a
compact seen-flag per key, queryable and explicitly managed).

Semantics: emit each key's FIRST arrival only, across all micro-batches
forever (state survives restarts through the checkpoint). The batch twin is
``operators/dedup.py::exact_dedup``; this is its infinite-stream form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_distinct(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    key_col: str,
    schema: str,
) -> None:
    """Exactly-once first-arrival stream over a file source: duplicates are
    dropped within AND across micro-batches (checkpointed state).

    The stateful function is a CLOSURE on purpose: cloudpickle serializes
    closures by value, while a module-level function is pickled by
    reference and would require ``chatdata_spark`` on every Python
    worker's path (breaks when the caller runs from outside the repo)."""

    def first_arrival(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            # key already emitted in a previous batch/run — swallow everything
            for _ in batches:
                pass
            return
        first = None
        for pdf in batches:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is not None:
            state.update((True,))
            yield first

    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = stream.groupBy(key_col).applyInPandasWithState(
        first_arrival,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
