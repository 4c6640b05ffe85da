"""Engine settings from environment variables (SURVEY.md §1.3, X14).

Mirrors the reference's declarative env config (settings.py:7-41) and its
string-coercion helpers (http_client.py:56-63) without the pydantic
dependency: every knob has the reference's default, the reference's env
alias, and tolerant parsing (bad values fall back to the default — the
engine must not fail on a malformed env, matching `_safe_json` spirit).

The two documented-but-unconsumed knobs (SEC_MAX_RPS / NRC_MAX_RPS,
BASELINE.md: "never read by code") are intentionally consumed here —
the gap is noted in SURVEY §6 and fixing it is strictly better.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw.strip())
    except ValueError:
        return default


def env_float(name: str, default: float) -> float:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return float(raw.strip())
    except ValueError:
        return default


def env_bool(name: str, default: bool = False) -> bool:
    """Truthy env parse (http_client.py:56): 1/true/yes/on, case-insensitive."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


@dataclass(frozen=True)
class Settings:
    # size gates (settings.py:13-20; http_client.py:57-58)
    max_artifact_bytes: int = field(
        default_factory=lambda: env_int("APP_MAX_ARTIFACT_BYTES", 50 * 1024 * 1024)
    )
    capture_pretty_max_bytes: int = field(
        default_factory=lambda: env_int("APP_CAPTURE_PRETTY_MAX_BYTES", 2_000_000)
    )
    capture_gzip_min_bytes: int = field(
        default_factory=lambda: env_int("APP_CAPTURE_GZIP_MIN_BYTES", 5_000_000)
    )
    # timeouts (http_client.py:60-63)
    pdf_read_timeout_seconds: float = field(
        default_factory=lambda: env_float("APP_PDF_READ_TIMEOUT_SECONDS", 180.0)
    )
    read_timeout_seconds: float = field(
        default_factory=lambda: env_float("APP_READ_TIMEOUT_SECONDS", 60.0)
    )
    connect_timeout_seconds: float = field(
        default_factory=lambda: env_float("APP_CONNECT_TIMEOUT_SECONDS", 10.0)
    )
    # rate limits (.env.example:15-17 — documented in the reference but
    # unconsumed there; consumed here)
    sec_max_rps: float = field(default_factory=lambda: env_float("SEC_MAX_RPS", 10.0))
    nrc_max_rps: float = field(default_factory=lambda: env_float("NRC_MAX_RPS", 3.0))
    # mode flags (cli.py:29)
    live: bool = field(default_factory=lambda: env_bool("APP_LIVE", False))


def load_settings() -> Settings:
    return Settings()
