from emap_spark.operators.merge import (  # noqa: F401
    ASSIGN,
    FILL_IF_NULL,
    TRISTATE,
    MergeResult,
    MergeSpec,
    as_of,
    fold_updates,
    merge_batch,
    merge_batch_versions,
    replay,
    tristate,
)
