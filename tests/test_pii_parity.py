"""q121 cross-engine regex parity on PLANTED PII (ADVICE r6): the
synthetic corpus contains no PII-shaped strings, so the oracle check
exercises the email/IPv4/phone patterns only at zero hits. This
differential runs the SAME DuckDB (RE2) expressions the q121 oracle
uses against strings that probe the dialect-divergence spots (\\b
boundaries, {2,} quantifier, [-. ] classes, case sensitivity) and
compares counts, redacted length, and the redacted md5 with Spark."""

from __future__ import annotations

import duckdb
import pandas as pd

from emap_spark.plans.text_dedup import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
    _PII_TERMS,
    pii_scrub,
)

DOCS = [
    (1, "contact jane.doe+spam%x@mail-host.example.org today"),
    (2, "short tld a@b.co and too-short a@b.c stay distinct"),
    (3, "ip 10.0.255.1 mid-sentence, and 1234.1.1.1 has no left boundary"),
    (4, "ip at end 192.168.0.1"),
    (5, "phones 123-456-7890 and 123.456.7890 and 123 456 7890"),
    (6, "glued x123-456-7890 has no boundary; 123-456-78901 overruns"),
    (7, "Customer keeps case; customer and order and vector redact"),
    (8, "mixed a@b.de at 1.2.3.4 phone 555-123-4567 for customer now"),
    (9, "nothing sensitive here at all"),
    (10, ""),
]


def test_pii_regex_parity_planted(spark):
    sdf = (
        pii_scrub(
            spark.createDataFrame(DOCS, "doc_id long, text string")
        )
        .orderBy("doc_id")
        .toPandas()
    )

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    odf = con.execute(
        f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_email,
       len(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phone,
       len(regexp_extract_all(text, '{_PII_TERMS}'))::BIGINT AS n_entity,
       len(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_TERMS}', '<ENTITY>', 'g'))::BIGINT AS redacted_len,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_TERMS}', '<ENTITY>', 'g')) AS redacted_md5
FROM docs ORDER BY doc_id
"""
    ).df()

    assert sdf.astype(str).equals(odf.astype(str)), (
        f"spark:\n{sdf}\noracle:\n{odf}"
    )

    # sanity: the planted strings actually fired every pattern
    by_id = {r.doc_id: r for r in sdf.itertuples()}
    assert by_id[1].n_email == 1
    assert by_id[2].n_email == 1  # a@b.co only; a@b.c fails {2,}
    assert by_id[3].n_ipv4 == 1  # 10.0.255.1 only: 1234.1.1.1 has no \b start
    assert by_id[4].n_ipv4 == 1
    assert by_id[5].n_phone == 3
    assert by_id[6].n_phone == 0
    assert by_id[7].n_entity == 3  # Customer stays, customer/order/vector go
    assert (by_id[8].n_email, by_id[8].n_ipv4, by_id[8].n_phone, by_id[8].n_entity) == (1, 1, 1, 1)
    assert by_id[9].n_email + by_id[9].n_ipv4 + by_id[9].n_phone + by_id[9].n_entity == 0
