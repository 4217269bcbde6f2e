from emap_spark.schemas.interchange import (  # noqa: F401
    ADT_SCHEMA,
    FLOWSHEET_SCHEMA,
    LAB_ORDER_SCHEMA,
    TRISTATE_STRING,
    WAVEFORM_SCHEMA,
    tristate_type,
)
from emap_spark.schemas.star import STAR_TABLES, audit_schema  # noqa: F401
