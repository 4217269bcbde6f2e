"""S10/S11: waveform HL7 ingestion — the text-parse path and the
socket/file stream wiring (waveform-reader/.../Hl7ParseAndQueue.java:
49-135, Hl7ListenerConfig.java).

The reference listens on TCP, splits MLLP-framed messages, and walks
OBR groups -> OBX children with an ad-hoc splitter. Spark shape: the
same splitter as column expressions over a (socket/file/kafka) text
stream — posexplode the segment array once per message, attach each OBX
to its enclosing OBR with a running count (no UDF, one explode), then a
broadcast join against the stream-metadata dimension for sampling
rate/unit (the message does not carry them, :104-110).

Validation mirrors the reference:
- only ORU^R01 messages parse (:63-66);
- OBR-10 must equal PV1-3 or the row is rejected (:78-80);
- unknown / unusable stream ids are skipped via the metadata join
  (:95-103);
- only NM/NA value types survive (:112-116);
- OBX-5 must be a single repeat — `~` rejects the row (:117-119);
- source_message_id = MSH-10 + "_" + obrIndex + "_" + obxIndex (:124).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.sources.hl7_text import field, segments

# the MLLP reassembler ships a pandas closure to Spark's Python workers;
# serialize this module by value so a foreign-cwd driver works (see
# emap_spark/streaming/collation.py for the full rationale)
try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover - best effort
    pass


def stream_metadata(spark: SparkSession, rows=None) -> DataFrame:
    """Stream-metadata dimension (SourceMetadata.java): stream id ->
    (description, sampling_rate, unit, usable). Defaults mirror the
    reference's test metadata (52912 = ECG 300 Hz)."""
    rows = rows or [
        ("52912", "ECG", 300, "mV", True),
        ("52913", "Pleth", 150, "%", True),
        ("52914", "ABP", 50, "mmHg", True),
        ("59999", "Broken", None, None, False),  # insufficient metadata
    ]
    return spark.createDataFrame(
        rows,
        "stream_id string, mapped_stream_description string,"
        " sampling_rate int, unit string, usable boolean",
    )


def waveform_from_hl7(
    df: DataFrame, metadata: DataFrame, raw_col: str = "hl7"
) -> DataFrame:
    """Raw waveform ORU^R01 text -> WAVEFORM_SCHEMA rows (+ a `rejected`
    column naming the reason for dead-letter rows, K3)."""
    raw = F.col(raw_col)
    # OBR attachment as PURE array expressions (no window functions, so
    # the same plan runs under Structured Streaming; no shuffle at all):
    # index every segment, then for each OBX count the OBRs before it
    # (its group number) and the OBXs since that OBR (its index within
    # the group).
    segs = segments(raw)
    entries = F.filter(
        F.transform(segs, lambda s, i: F.struct(s.alias("f"), i.alias("pos"))),
        lambda e: e["f"].getItem(0).isin("OBR", "OBX"),
    )
    obrs = F.filter(entries, lambda e: e["f"].getItem(0) == "OBR")
    obxs = F.filter(entries, lambda e: e["f"].getItem(0) == "OBX")

    def attach(e):
        prior = F.filter(obrs, lambda o: o["pos"] < e["pos"])
        last_obr = F.try_element_at(prior, F.lit(-1))
        return F.struct(
            e["f"].alias("f"),
            F.size(prior).alias("obr_i"),
            F.try_element_at(last_obr["f"], F.lit(11)).alias("obr_loc"),
            F.size(
                F.filter(
                    obxs,
                    lambda x: (x["pos"] <= e["pos"])
                    & (x["pos"] > F.coalesce(last_obr["pos"], F.lit(-1))),
                )
            ).alias("obx_i"),
        )

    base = df.select(
        F.coalesce(field(raw, "MSH", 10), F.lit("?")).alias("__msg_id"),
        field(raw, "MSH", 9).alias("__msg_type"),
        field(raw, "PV1", 3).alias("__pv1_loc"),
        F.explode(F.transform(obxs, attach)).alias("__e"),
    )
    obx = base.select(
        "__msg_id",
        "__msg_type",
        "__pv1_loc",
        F.col("__e")["f"].alias("__f"),
        F.col("__e")["obr_i"].alias("__obr_i"),
        F.col("__e")["obr_loc"].alias("__obr_loc"),
        F.col("__e")["obx_i"].alias("__obx_i"),
    )

    gf = lambda n: F.try_element_at(F.col("__f"), F.lit(n + 1))  # OBX-n
    stream_id = F.try_element_at(F.split(gf(3), r"\^"), F.lit(1))
    vtype = gf(2)
    points_raw = gf(5)
    # OBX-14 carries zone-offset timestamps (yyyyMMddHHmmss.SSS+ZZZZ);
    # try_ variant so malformed times dead-letter instead of failing the
    # stream (the reference catches DateTimeException, :85-91)
    obs_dt = F.try_to_timestamp(
        F.trim(gf(14)), F.lit("yyyyMMddHHmmss.SSSZ")
    ).cast("timestamp_ntz")

    joined = obx.join(
        F.broadcast(metadata.withColumnRenamed("stream_id", "__meta_stream")),
        stream_id == F.col("__meta_stream"),
        "left",
    )
    rejected = (
        F.when(F.col("__msg_type") != "ORU^R01", F.lit("not ORU^R01"))
        .when(
            F.col("__obr_loc").isNull() | (F.col("__obr_loc") != F.col("__pv1_loc")),
            F.lit("location mismatch"),
        )
        .when(F.col("__meta_stream").isNull(), F.lit("unknown stream"))
        .when(~F.coalesce(F.col("usable"), F.lit(False)), F.lit("unusable metadata"))
        .when(~vtype.isin("NM", "NA"), F.lit("non-numeric type"))
        .when(points_raw.contains("~"), F.lit("multiple OBX-5 repeats"))
        .when(obs_dt.isNull(), F.lit("bad datetime"))
    )
    return joined.select(
        F.concat_ws("_", F.col("__msg_id"), F.col("__obr_i"), F.col("__obx_i")).alias(
            "source_message_id"
        ),
        F.lit("waveform-reader").alias("source_system"),
        obs_dt.alias("valid_from"),
        F.col("__pv1_loc").alias("source_location"),
        F.lit(None).cast("string").alias("mapped_location"),
        stream_id.alias("source_stream_id"),
        F.col("mapped_stream_description"),
        F.col("sampling_rate"),
        F.col("unit"),
        obs_dt.alias("observation_time"),
        F.transform(F.split(points_raw, r"\^"), lambda v: v.try_cast("double")).alias(
            "values"
        ),
        rejected.alias("rejected"),
    )


def mllp_reassemble_stream(lines: DataFrame) -> DataFrame:
    """Reassemble MLLP-framed HL7 messages from a line-split stream.

    Spark's socket source line-splits on BOTH \\r and \\n
    (BufferedReader.readLine), so each HL7 SEGMENT arrives as its own
    row: "\\x0bMSH|..." opens a frame, a row containing \\x1c closes it.
    This is a stateful reassembler (applyInPandasWithState): the state
    carries the unterminated fragment tail, so a frame straddling a
    micro-batch boundary is NOT lost. Rows are re-ordered by a
    monotonically-increasing id taken in the source's single partition
    (one TCP connection = one ordered stream, exactly the reference's
    per-port listener; scale comes from many listeners/ports, each its
    own key, not from parallelising within a connection)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def tag_order(batches):
        # Recover ARRIVAL order (monotonically_increasing_id is not
        # allowed on streams): the socket source assigns its buffered
        # rows to partitions round-robin in arrival order, so global
        # order is (index within partition, partition id) — encoded as
        # one sortable id. A single-partition source (file spool) is the
        # degenerate case and stays correctly ordered.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        i = 0
        for pdf in batches:
            out = pdf[["value"]].copy()
            out["__id"] = [(i + j) * 1_000_000 + pid for j in range(len(out))]
            out["__conn"] = 0
            i += len(out)
            yield out

    tagged = lines.mapInPandas(tag_order, "value string, __id long, __conn int")

    def fn(key, pdfs, state: GroupState):
        frags: list[str] = list(state.get[0]) if state.exists else []
        open_frame = bool(state.get[1]) if state.exists else False
        out: list[str] = []
        new = pd.concat(list(pdfs), ignore_index=True).sort_values("__id")
        for v in new["value"]:
            line = str(v).replace("\n", "")
            if line.startswith("\x0b"):
                frags, open_frame = [], True
                line = line[1:]
            if not open_frame:
                continue  # noise outside any frame
            if "\x1c" in line:
                head = line.split("\x1c", 1)[0]
                if head:
                    frags.append(head)
                if frags:
                    out.append("\r".join(frags))
                frags, open_frame = [], False
            elif line:
                frags.append(line)
        state.update((frags, open_frame))
        yield pd.DataFrame({"hl7": out}, columns=["hl7"])

    return tagged.groupBy("__conn").applyInPandasWithState(
        fn,
        "hl7 string",
        "tail array<string>, open boolean",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def waveform_socket_stream(
    spark: SparkSession,
    metadata: DataFrame,
    host: str = "localhost",
    port: int = 9999,
):
    """S10: TCP listener wiring (Hl7ListenerConfig.java pattern). The
    socket source line-splits the MLLP byte stream; frames are
    reassembled statefully (mllp_reassemble_stream — survives frames
    straddling micro-batches) and parsed with the same column
    expressions as the batch path. Local test substitute: a file stream
    over a spool directory (waveform_file_stream); the loopback-socket
    integration test lives in tests/test_stream_collation.py."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return waveform_from_hl7(mllp_reassemble_stream(lines), metadata)


def waveform_file_stream(spark: SparkSession, metadata: DataFrame, spool_dir: str):
    """File-spool substitute for the TCP listener (MLLP-framed blobs),
    used by tests and local runs — identical parse path. wholetext keeps
    the HL7 \\r segment separators intact (the line reader would split
    on them); messages are re-split on their MLLP frames."""
    lines = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(spool_dir)
    )
    return _parse_stream(lines, metadata)


def _parse_stream(lines: DataFrame, metadata: DataFrame) -> DataFrame:
    msgs = (
        lines.select(
            F.explode(F.split(F.col("value"), "\x0b")).alias("hl7")
        )
        .select(F.regexp_replace("hl7", "[\x1c\x0b\n]", "").alias("hl7"))
        .filter(F.trim("hl7") != "")
    )
    return waveform_from_hl7(msgs, metadata)


def synthetic_waveform_hl7(spark: SparkSession, n: int = 12) -> DataFrame:
    """Raw waveform ORU^R01 fixtures exercising every validation branch:
    two OBR groups per message; an unknown and an unusable stream; a
    non-single-repeat OBX-5; every 4th message's second OBR carries a
    mismatched location (rejected like the reference's
    Hl7ParseException path)."""
    rows = []
    for i in range(n):
        loc = f"B{i % 3}"
        ts = f"2024010100{i % 24 // 10}{i % 10}00.000+0000"
        obr2_loc = "WRONG" if i % 4 == 0 else loc
        ecg = "^".join(str(100 + (i + k) % 7) for k in range(5))
        pleth = "^".join(str(40 + (i + k) % 5) for k in range(3))
        abp = "^".join(str(80 + k) for k in range(2))
        segs = [
            f"MSH|^~\\&|CAPSULE|UCLH|x|x|20240101000000||ORU^R01|WF{i:06d}|P|2.3",
            f"PID|1|{i}",
            f"PV1|1|I|{loc}",
            f"OBR|1|||||||||{loc}",
            f"OBX|1|NA|52912^ECG||{ecg}||||||F|||{ts}",
            f"OBX|2|NM|59999^Broken||1.0||||||F|||{ts}",
            f"OBX|3|NM|88888^Mystery||2.0||||||F|||{ts}",
            f"OBR|2|||||||||{obr2_loc}",
            f"OBX|1|NA|52913^Pleth||{pleth}||||||F|||{ts}",
            f"OBX|2|NM|52914^ABP||7.0~8.0||||||F|||{ts}",
            f"OBX|3|NM|52914^ABP||{abp}||||||F|||{ts}",
        ]
        rows.append((i, "\r".join(segs)))
    return spark.createDataFrame(rows, "id long, hl7 string")
