"""Queries that drive the REAL engine operators (not SQL re-phrasings):
the bitemporal merge engine (SURVEY §2.3), identity merge closure (D2),
and the point-in-time interval join (D19/Q7) — each with a DuckDB oracle
expressing the same semantics independently, so the driver's gate checks
the engine's own output.

`events` plays the interchange stream: user_id = entity key, ts =
validFrom, event_id = sourceMessageId (total-order tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.operators.merge import ASSIGN, FILL_IF_NULL, MergeSpec, as_of, merge_batch, replay
from emap_spark.plans._util import tlit, us
from emap_spark.registry import register
from emap_spark.sources.tables import load_table

SPLIT_T = "2024-01-15 00:00:00"  # batch boundary for the replay test
ASOF_T = "2024-01-10 00:00:00"  # time-travel target inside batch 1


def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = e.select(
        F.col("user_id"),
        F.col("ts").alias("valid_from"),
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("last_purchase_value"),
    )
    # pre-partition by the merge key at full width: the fold's windows
    # reuse this exchange directly (hash on key satisfies their
    # distribution), and a USER repartition is exempt from AQE's
    # bytes-based coalescing — which would otherwise squeeze the
    # window-heavy fold of 100k rows into ~3 tasks because the shuffled
    # BYTES are small while the per-row window work is not
    return m.repartition(spark.sparkContext.defaultParallelism, F.col("user_id"))


_SPEC = MergeSpec(
    key=["user_id"],
    fields={
        "last_event_type": ASSIGN,
        "last_value": ASSIGN,
        "last_purchase_value": FILL_IF_NULL,
    },
    event_time="valid_from",
    seq="seq",
)

_STATE_ORACLE = """
SELECT DISTINCT user_id,
       last_value(event_type) OVER w AS last_event_type,
       last_value(value) OVER w AS last_value,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER w AS last_purchase_value,
       last_value(epoch_us(ts)) OVER w AS valid_from_us
FROM events {where}
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --------------------------------------------------------------------------
# q60: the merge engine end-to-end -> current snapshot
# --------------------------------------------------------------------------
@register(
    "q60_merge_engine_snapshot",
    oracle=_STATE_ORACLE.format(where=""),
    doc="merge_batch(M1-M7) over the whole stream; oracle = window-fold SQL.",
)
def q60_merge_engine_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = merge_batch(None, _messages(spark, sf_dir), _SPEC, "2024-06-01 00:00:00")
    return res.live().select(
        "user_id",
        "last_event_type",
        "last_value",
        "last_purchase_value",
        us("valid_from").alias("valid_from_us"),
    )


# --------------------------------------------------------------------------
# q61: two-batch replay + audit + as-of time travel
# --------------------------------------------------------------------------
@register(
    "q61_replay_asof",
    oracle=_STATE_ORACLE.format(where=f"WHERE ts <= TIMESTAMP '{ASOF_T}'"),
    doc=(
        "replay() in two chronological batches, then as_of(t) reconstruction "
        "from current+audit (Q5/AuditCore.isValidAsOf); oracle computes the "
        "t-bounded state directly."
    ),
)
def q61_replay_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _messages(spark, sf_dir)
    b1 = m.filter(F.col("valid_from") < tlit(SPLIT_T))
    b2 = m.filter(F.col("valid_from") >= tlit(SPLIT_T))
    res = replay(
        [b1, b2],
        _SPEC,
        ["2024-02-01 00:00:00", "2024-03-01 00:00:00"],
        granularity="message",
    )
    state = as_of(res.current, res.audit, ASOF_T)
    return state.select(
        "user_id",
        "last_event_type",
        "last_value",
        "last_purchase_value",
        us("valid_from").alias("valid_from_us"),
    )


# --------------------------------------------------------------------------
# q62: identity merge closure (D2, MrnToLive) via pointer doubling
# --------------------------------------------------------------------------
@register(
    "q62_identity_closure",
    oracle="""
WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
signups AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
edges AS (
  SELECT s.user_id AS src, s.user_id - 1 AS dst
  FROM signups s WHERE s.user_id - 1 IN (SELECT user_id FROM users)
),
chain(u, live) AS (
  SELECT user_id, user_id FROM users
  UNION ALL
  SELECT c.u, e.dst FROM chain c JOIN edges e ON c.live = e.src
)
SELECT u AS user_id, min(live) AS live_user_id FROM chain GROUP BY u
""",
    doc=(
        "D2 MRN-merge transitive closure: merge edges u->u-1 for signup "
        "users; engine resolves chains by pointer doubling (O(log n) "
        "self-joins of a dimension-sized mapping — the Spark-native shape "
        "of PersonController.mergeMrns chains)."
    ),
)
def q62_identity_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    signups = e.filter(F.col("event_type") == "signup").select("user_id").distinct()
    edges = (
        signups.alias("s")
        .join(users.alias("u"), F.col("s.user_id") - 1 == F.col("u.user_id"), "left_semi")
        .select(F.col("user_id").alias("src"), (F.col("user_id") - 1).alias("dst"))
    )
    # mapping m(u) = next hop (or u itself); pointer-double until fixpoint.
    m = (
        users.join(edges, users.user_id == edges.src, "left")
        .select(
            F.col("user_id").alias("u"),
            F.coalesce(F.col("dst"), F.col("user_id")).alias("live"),
        )
    )
    # ONE scalar count sizes the doubling loop: the longest chain is at
    # most the signup count, so ceil(log2(count)) iterations guarantee
    # convergence (same sizing as operators/identity.py resolve_identity)
    # and each iteration is a single self-join — no per-iteration
    # convergence probe. Extra iterations past actual convergence are
    # no-ops (roots map to themselves). A plain count() is a partial
    # aggregate with full parallelism; the previous exact-longest-run
    # sizing needed a GLOBAL row_number window — the entire signup set
    # through ONE task at scale just to save a few no-op self-joins.
    import math

    n_signups = signups.count()
    iters = math.ceil(math.log2(n_signups + 1)) if n_signups else 0
    from emap_spark.lineage import cut

    for _ in range(iters):
        m = cut(
            m.alias("a")
            .join(m.alias("b"), F.col("a.live") == F.col("b.u"))
            .select(F.col("a.u").alias("u"), F.col("b.live").alias("live"))
        )
    return m.select(F.col("u").alias("user_id"), F.col("live").alias("live_user_id"))


# --------------------------------------------------------------------------
# q63: point-in-time interval join (D19 waveform->LocationVisit shape)
# --------------------------------------------------------------------------
@register(
    "q63_interval_join_errors_to_sessions",
    oracle=f"""
WITH sessions AS (
  SELECT user_id, session_id,
         min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
  FROM (
    SELECT user_id, epoch_us(ts) AS ts_us,
           (sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > {24 * 3600 * 1_000_000}
                     THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
    FROM (
      SELECT *, lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    )
  )
  GROUP BY user_id, session_id
)
SELECT s.user_id, s.session_id, count(*) AS n_errors
FROM sessions s
JOIN events e
  ON e.user_id = s.user_id
 AND e.event_type = 'error'
 AND epoch_us(e.ts) >= s.session_start_us
 AND epoch_us(e.ts) <= s.session_end_us
GROUP BY s.user_id, s.session_id
""",
    doc=(
        "D19 point-in-time interval join: observations attach to the "
        "interval row covering their timestamp (equi key + range predicate, "
        "LocationVisitRepository.java:81-88)."
    ),
)
def q63_interval_join_errors_to_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.plans.event_state import q26_sessionization

    sessions = q26_sessionization(spark, sf_dir).select(
        "user_id", "session_id", "session_start_us", "session_end_us"
    )
    errors = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user_id"), us("ts").alias("e_ts_us"))
    )
    return (
        sessions.join(
            errors,
            (F.col("e_user_id") == F.col("user_id"))
            & (F.col("e_ts_us") >= F.col("session_start_us"))
            & (F.col("e_ts_us") <= F.col("session_end_us")),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


# --------------------------------------------------------------------------
# q104: the lakehouse MERGE sink (K2) driven through the oracle gate —
# durable DeltaLog ingest across batches + an idempotent crash-replay
# --------------------------------------------------------------------------
_Q104_ORACLE = """
SELECT * FROM (VALUES
  ('core_demographic', 50, 0),
  ('hospital_visit',   50, 50),
  ('mrn',              50, 0)
) t(tbl, n_live, n_audit)
ORDER BY tbl
"""


@register(
    "q104_lakehouse_sink_roundtrip",
    oracle=_Q104_ORACLE,
    doc=(
        "K2 incremental-MERGE sink end-to-end (storage/delta.py): 50 "
        "patients x 4 ADT messages ingested in two durable batches "
        "through EmapEngine's DeltaLog backend, THEN batch 1 replayed "
        "(crash recovery) — the transaction log makes the replay a "
        "no-op, so live/audit counts match the closed form: every visit "
        "has exactly one superseded version (admission state superseded "
        "by the discharge write), demographics and mrn never change "
        "after creation."
    ),
)
def q104_lakehouse_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from emap_spark.app import EmapEngine
    from emap_spark.sources.generators import adt_messages

    adt = adt_messages(spark, n_patients=50)
    b1 = adt.filter(F.col("source_message_id").endswith("-1") | F.col("source_message_id").endswith("-2"))
    b2 = adt.filter(F.col("source_message_id").endswith("-3") | F.col("source_message_id").endswith("-4"))
    eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="q104_"))
    eng.process_batch(b1, 0)
    eng.process_batch(b2, 1)
    eng.process_batch(b1, 0)  # crash-replay: must be a no-op
    rows = []
    for tbl in ("core_demographic", "hospital_visit", "mrn"):
        rows.append(
            eng.table(tbl).select(
                F.lit(tbl).alias("tbl"),
                F.lit(1).alias("__one"),
            )
            .groupBy("tbl")
            .agg(F.count(F.lit(1)).cast("int").alias("n_live"))
            .crossJoin(
                F.broadcast(
                    eng.audit(tbl).agg(F.count(F.lit(1)).cast("int").alias("n_audit"))
                )
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("tbl", "n_live", "n_audit").orderBy("tbl")


# --------------------------------------------------------------------------
# q105: the SQL-warehouse upsert mirror (the reference's ACTUAL sink — a
# Postgres star schema written transactionally per upsert,
# core/.../RowState.java:186-201; DuckDB stands in for the warehouse)
# --------------------------------------------------------------------------
_Q105_ORACLE = """
SELECT * FROM (VALUES
  ('core_demographic', 40, 0),
  ('hospital_visit',   40, 40),
  ('mrn',              40, 0)
) t(tbl, n_live, n_audit)
ORDER BY tbl
"""


@register(
    "q105_jdbc_upsert_mirror",
    oracle=_Q105_ORACLE,
    doc=(
        "K2 as a transactional SQL MERGE (storage/jdbc.py): the same "
        "two-durable-batch + crash-replay drill as q104 run through the "
        "JdbcUpsertStore backend — staging transfer is O(touched rows), "
        "the upsert is one server-side delete-insert MERGE, and the "
        "batch ledger commits in the same transaction, so the replay is "
        "a no-op. Live/audit counts match the closed form, proving the "
        "reference's Postgres-sink contract on a SQL warehouse."
    ),
)
def q105_jdbc_upsert_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from emap_spark.app import EmapEngine
    from emap_spark.sources.generators import adt_messages

    adt = adt_messages(spark, n_patients=40)
    b1 = adt.filter(F.col("source_message_id").endswith("-1") | F.col("source_message_id").endswith("-2"))
    b2 = adt.filter(F.col("source_message_id").endswith("-3") | F.col("source_message_id").endswith("-4"))
    eng = EmapEngine(storage_root=tempfile.mkdtemp(prefix="q105_"), backend="jdbc")
    eng.process_batch(b1, 0)
    eng.process_batch(b2, 1)
    eng.process_batch(b1, 0)  # crash-replay: must be a no-op
    rows = []
    for tbl in ("core_demographic", "hospital_visit", "mrn"):
        rows.append(
            eng.table(tbl).select(
                F.lit(tbl).alias("tbl"),
                F.lit(1).alias("__one"),
            )
            .groupBy("tbl")
            .agg(F.count(F.lit(1)).cast("int").alias("n_live"))
            .crossJoin(
                F.broadcast(
                    eng.audit(tbl).agg(F.count(F.lit(1)).cast("int").alias("n_audit"))
                )
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("tbl", "n_live", "n_audit").orderBy("tbl")
