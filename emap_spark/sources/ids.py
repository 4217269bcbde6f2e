"""S1/S2/W6: IDS-style incremental source — sequential scan of an
immutable log by monotonically increasing `unid` with persisted
progress (hl7-reader IdsOperations.getNextHL7IdsRecord :291, blocking
tail-read :320, IdsProgress).

Spark shape: the log is any table with a monotone `unid` column (here
parquet; in production a JDBC source partitioned on unid ranges).
Batch mode reads `unid > last_progress` slices and persists progress
only after the caller confirms the batch was durably processed —
the reference's ack-then-advance contract (Publisher.java:32-90).
Streaming mode is readStream over the same directory (file source
tracks its own offsets via checkpoint).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

IDS_SCHEMA = (
    "unid long, patient_id string, messagetype string, hl7message string,"
    " persistdatetime timestamp_ntz"
)


class IdsReader:
    def __init__(self, spark: SparkSession, log_path: str, progress_path: str) -> None:
        self.spark = spark
        self.log_path = log_path
        self.progress_path = progress_path

    # -- progress (IdsProgress row) ---------------------------------------
    def last_unid(self) -> int:
        if not os.path.exists(self.progress_path):
            return -1
        with open(self.progress_path) as f:
            return json.load(f)["last_unid"]

    def _commit(self, unid: int) -> None:
        tmp = self.progress_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_unid": unid}, f)
        os.replace(tmp, self.progress_path)  # atomic, crash-safe

    # -- batch incremental read -------------------------------------------
    def next_batch(self, max_rows: int | None = None) -> tuple[DataFrame, int | None]:
        """Rows with unid > progress (ordered slice). Returns (df,
        high_watermark); pass the watermark to commit() after the batch
        is durably processed — at-least-once by construction."""
        df = self.spark.read.parquet(self.log_path).filter(
            F.col("unid") > self.last_unid()
        )
        if max_rows is not None:
            df = df.orderBy("unid").limit(max_rows)
        hi = df.agg(F.max("unid").alias("m")).collect()[0].m
        return df, (int(hi) if hi is not None else None)

    def commit(self, high_watermark: int | None) -> None:
        if high_watermark is not None:
            self._commit(high_watermark)

    # -- streaming tail-read ----------------------------------------------
    def stream(self) -> DataFrame:
        """Blocking tail-read analogue: file-source stream over the log
        directory; offsets live in the query checkpoint (W6)."""
        schema = self.spark.read.parquet(self.log_path).schema
        return self.spark.readStream.schema(schema).parquet(self.log_path)
