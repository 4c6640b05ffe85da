"""Secret redaction projection (SURVEY.md F15; run_capture.py:11-22,229-244).

The reference recursively walks dicts/lists replacing values whose key
matches a sensitive set (exact names + substrings token/secret/pass).
Spark-first there are two shapes:

- a typed MapType headers column → `transform_values` with a key regex
  (JVM-side, codegen'd);
- a stringified-JSON column → parse to map, redact, re-serialize.

Both keep the exact reference semantics: case-insensitive key match,
value replaced with ***REDACTED***.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# exact names: the reference's SENSITIVE_KEYS verbatim (run_capture.py:11-22)
# minus token/password/secret, which the substring triggers (:235-237) already
# cover. Round-4 verdict: the earlier hand-written list missed the reference's
# underscore variants api_key / x-api_key (and carried extras the reference
# does not redact) — parity is now literal, enforced by
# tests/test_ingest_pipeline.py::test_redaction_parity_with_reference_key_set.
SENSITIVE_EXACT = (
    "authorization",
    "cookie",
    "ocp-apim-subscription-key",
    "x-api-key",
    "x-api_key",
    "api_key",
    "apikey",
)
_SUBSTRINGS = ("token", "secret", "pass")

SENSITIVE_KEY_REGEX = (
    "^(" + "|".join(SENSITIVE_EXACT) + ")$|" + "|".join(_SUBSTRINGS)
)

REDACTED = "***REDACTED***"


def is_sensitive_key(key: Column) -> Column:
    return F.lower(key).rlike(SENSITIVE_KEY_REGEX)


def redact_map(headers: Column) -> Column:
    """Redact a map<string,string> column (typed-headers view)."""
    return F.transform_values(
        headers, lambda k, v: F.when(is_sensitive_key(k), F.lit(REDACTED)).otherwise(v)
    )


def redact_headers_json(headers_json: Column) -> Column:
    """Redact a stringified-JSON headers column: parse → redact → re-emit.

    Key order is normalized via sorted map entries so output is
    deterministic (the reference serializes sort_keys=True,
    run_capture.py:127)."""
    m = F.from_json(headers_json, T.MapType(T.StringType(), T.StringType()))
    redacted = redact_map(m)
    entries = F.array_sort(F.map_entries(redacted))
    return F.to_json(F.map_from_entries(entries))
