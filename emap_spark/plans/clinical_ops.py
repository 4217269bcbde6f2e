"""S8 driver query: raw-HL7 clinical factories (ORM^O01 consult,
PPR^PC1 problem, ADT^A05+ZIF infection, ADT^A60 allergy) routed through
the EXISTING D12/D13 domain processors end-to-end.

Fixture arithmetic (synthetic_clinical_hl7, n=12 of each kind):
  consults: 12 (one per ORM), cancelled when i%4==0 unless i%8==4 which
    is the DISCHAUTO close -> cancelled {0,8}=2, closed {4}=1; every
    consult carries 2 questions (24) and a 2-line comment.
  problems: 2 PRB per message = 24 rows; first PRB is a DElete when
    i%3==0 -> 4 tombstoned keys; NTE comment rides on the first PRB
    only -> 12 comments.
  infections: 2 ZIF repeats per message = 24; the MRSA repeat carries a
    resolved time -> 12 resolved.
  allergies: 2 IAM per message = 24; second IAM is action D when i%4==0
    -> 3 deleted; live reactions = 12x2 (Hives+Anaphylaxis) + 9x1
    (Rash on surviving second IAMs) = 33.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from emap_spark.registry import register

_Q101_ORACLE = """
SELECT * FROM (VALUES
  ('CONSULT',            12, 12, 2, 24),
  ('PATIENT_ALLERGY',    24, 21, 3, 33),
  ('PATIENT_INFECTION',  24, 24, 0, 12),
  ('PATIENT_PROBLEM',    24, 20, 4, 12)
) t(kind, n_rows, n_live, n_removed, n_detail)
ORDER BY kind
"""


@register(
    "q101_hl7_clinical_factories",
    oracle=_Q101_ORACLE,
    doc=(
        "S8 HL7-text factories (ConsultFactory.java, "
        "PatientProblemFactory.java, PatientInfectionFactory.java, "
        "PatientAllergyFactory.java) -> D12/D13 processors: parse counts, "
        "merge tombstones, NotesParser questions, replace-set reactions."
    ),
)
def q101_hl7_clinical_factories(spark: SparkSession, sf_dir: str) -> DataFrame:
    from emap_spark.domains.observations import (
        allergen_reactions_view,
        process_conditions,
        process_consults,
    )
    from emap_spark.sources.hl7_clinical import (
        conditions_from_hl7,
        consults_from_hl7,
        synthetic_clinical_hl7,
    )

    raw = synthetic_clinical_hl7(spark, 12)
    stored = "2024-06-01 00:00:00"

    consults = consults_from_hl7(raw)
    cres = process_consults(
        None,
        consults.withColumn("seq", F.col("source_message_id")),
        stored,
    )
    consult_row = cres.current.agg(
        F.lit("CONSULT").alias("kind"),
        F.count(F.lit(1)).cast("int").alias("n_rows"),
        F.sum((~F.col("is_deleted")).cast("int")).cast("int").alias("n_live"),
        F.sum(F.col("cancelled").cast("int")).cast("int").alias("n_removed"),
        F.lit(None).cast("int").alias("n_detail"),
    )
    # D16 child via the merge engine (not just the parse): one live
    # request_answer row per (consult, question)
    from emap_spark.domains.observations import process_consult_questions

    qres = process_consult_questions(
        None, consults.withColumn("seq", F.col("source_message_id")), stored
    )
    n_questions = qres.live().agg(
        F.count(F.lit(1)).cast("int").alias("q")
    )
    consult_row = consult_row.crossJoin(F.broadcast(n_questions)).select(
        "kind", "n_rows", "n_live", "n_removed", F.col("q").alias("n_detail")
    )

    conds = conditions_from_hl7(raw)
    res = process_conditions(
        {}, conds.withColumn("seq", F.col("source_message_id")), stored
    )
    per_type = res["patient_condition"].current.groupBy(
        F.col("condition_type").alias("kind")
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_rows"),
        F.sum((~F.col("is_deleted")).cast("int")).cast("int").alias("n_live"),
        F.sum(F.col("is_deleted").cast("int")).cast("int").alias("n_removed"),
    )
    reactions = (
        allergen_reactions_view(res["allergen_reaction"].live())
        .groupBy(F.col("condition_type").alias("kind"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_reactions"))
    )
    problems_detail = conds.filter(
        F.col("comment")["status"] == "SAVE"
    ).groupBy(F.col("condition_type").alias("kind")).agg(
        F.count(F.lit(1)).cast("int").alias("n_comments")
    )
    resolved = conds.filter(F.col("resolution_date").isNotNull()).groupBy(
        F.col("condition_type").alias("kind")
    ).agg(F.count(F.lit(1)).cast("int").alias("n_resolved"))
    cond_rows = (
        per_type.join(reactions, "kind", "left")
        .join(problems_detail, "kind", "left")
        .join(resolved, "kind", "left")
        .select(
            "kind",
            "n_rows",
            "n_live",
            "n_removed",
            F.when(F.col("kind") == "PATIENT_ALLERGY", F.col("n_reactions"))
            .when(F.col("kind") == "PATIENT_PROBLEM", F.col("n_comments"))
            .otherwise(F.col("n_resolved"))
            .alias("n_detail"),
        )
    )
    return consult_row.unionByName(cond_rows).orderBy("kind")
