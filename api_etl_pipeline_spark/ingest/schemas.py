"""Schemas for the ingest layer.

Mirrors the reference's data model (SURVEY.md §1) with explicit Spark
StructTypes — fixed schema at the sink, tolerant schema-on-read at the
edges (from_json PERMISSIVE instead of the reference's `_safe_json`,
sec_edgar.py:65-71 / nrc_adams_aps.py:84-90).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Captured HTTP response (reference: CapturedResponse, http_client.py:14-21).
# headers/params stay stringified JSON for fidelity; typed views come from
# from_json on demand.
CAPTURED_RESPONSE = T.StructType(
    [
        T.StructField("provider", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("params_json", T.StringType(), True),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("headers_json", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
    ]
)

# HTTP attempt = response grain + retry/provenance fields
# (reference: HttpAttempt, http_client.py:24-35).
HTTP_ATTEMPT = T.StructType(
    list(CAPTURED_RESPONSE.fields)
    + [
        T.StructField("attempt_number", T.IntegerType(), False),
        T.StructField("error_type", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)

# artifacts sink row (reference DDL storage/db.py:19-30; UNIQUE(source_url,
# sha256) becomes the dedup-insert key, FK response_id the join key).
ARTIFACT = T.StructType(
    [
        T.StructField("provider", T.StringType(), False),
        T.StructField("source_url", T.StringType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("blob_path", T.StringType(), True),
        T.StructField("response_id", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# SEC submissions payload: parallel arrays under filings.recent — the
# struct-of-arrays layout (docs/Golden_Record_API_Dossiers.md:174-191).
SEC_SUBMISSIONS = T.StructType(
    [
        T.StructField("cik", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField(
            "filings",
            T.StructType(
                [
                    T.StructField(
                        "recent",
                        T.StructType(
                            [
                                T.StructField(
                                    "accessionNumber", T.ArrayType(T.StringType()), True
                                ),
                                T.StructField(
                                    "primaryDocument", T.ArrayType(T.StringType()), True
                                ),
                                T.StructField("filingDate", T.ArrayType(T.StringType()), True),
                                T.StructField("form", T.ArrayType(T.StringType()), True),
                            ]
                        ),
                        True,
                    )
                ]
            ),
            True,
        ),
    ]
)

# NRC APS search response — BOTH envelope variants and BOTH key casings in
# one schema so a single from_json covers the drift the reference handles
# imperatively (nrc_adams_aps.py:92-111; dossier :600-634).
_NRC_DOC = T.StructType(
    [
        T.StructField("Url", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("AccessionNumber", T.StringType(), True),
        T.StructField("DocumentTitle", T.StringType(), True),
    ]
)
_NRC_RESULT = T.StructType(
    [
        T.StructField("accessionNumber", T.StringType(), True),
        T.StructField("AccessionNumber", T.StringType(), True),
        T.StructField("pdfUrl", T.StringType(), True),
        T.StructField("PdfUrl", T.StringType(), True),
        T.StructField("document", _NRC_DOC, True),
        T.StructField("Document", _NRC_DOC, True),
        T.StructField("Url", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)
NRC_SEARCH = T.StructType(
    [
        T.StructField("count", T.LongType(), True),
        T.StructField("pageNumber", T.LongType(), True),
        T.StructField("results", T.ArrayType(_NRC_RESULT), True),
        T.StructField("Results", T.ArrayType(_NRC_RESULT), True),
        T.StructField("documents", T.ArrayType(_NRC_RESULT), True),
    ]
)

# Normalized emission contract (dossier Appendix A,
# docs/Golden_Record_API_Dossiers.md:796-810).
NORMALIZED_RECORD = T.StructType(
    [
        T.StructField("_schema_version", T.StringType(), False),
        T.StructField("provider", T.StringType(), False),
        T.StructField("accession_number", T.StringType(), True),
        T.StructField("docket_number", T.StringType(), True),
        T.StructField("document_date", T.DateType(), True),
        T.StructField("date_added_timestamp", T.TimestampType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("fetched_at", T.TimestampType(), True),
        T.StructField("retention_allowed", T.BooleanType(), True),
    ]
)
