from emap_spark.functions.hl7 import (  # noqa: F401
    best_guess_valid_from,
    decompose_location,
    format_source_id,
    numeric_result,
    parse_questions,
    reference_range,
    tristate_from_hl7,
    value_type_of,
)
