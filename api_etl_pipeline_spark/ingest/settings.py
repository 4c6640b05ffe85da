"""Engine settings from environment variables (SURVEY.md §1.3, X14).

Mirrors the reference's declarative env config (settings.py:7-41) and its
string-coercion helpers (http_client.py:56-63) without the pydantic
dependency: every knob has the reference's default, the reference's env
alias, tolerant parsing (bad values fall back to the default — the
engine must not fail on a malformed env, matching `_safe_json` spirit),
and — round 14 — the reference's `.env`-file layer (settings.py:8:
`env_file=".env"`) with pydantic-settings precedence: process env >
`<cwd>/.env` > field default.

The two documented-but-unconsumed knobs (SEC_MAX_RPS / NRC_MAX_RPS,
BASELINE.md: "never read by code") are intentionally consumed here —
the gap is noted in SURVEY §6 and fixing it is strictly better.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path


def dotenv_values(path: str | os.PathLike | None = None) -> dict[str, str]:
    """Parse a `.env` file (reference settings.py:8 —
    `SettingsConfigDict(env_file=".env")`): KEY=VALUE lines, full-line
    `#` comments, blank lines, an optional `export ` prefix, and
    single/double quote stripping — the python-dotenv subset the
    reference's pydantic-settings layer actually exercises. A missing
    or unreadable file is an empty mapping (pydantic-settings treats
    env_file as optional). Defaults to `<cwd>/.env`, matching the
    reference's cwd-relative resolution."""
    p = Path(path) if path is not None else Path.cwd() / ".env"
    out: dict[str, str] = {}
    try:
        text = p.read_text()
    except OSError:
        return out
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):].lstrip()
        key, _, value = line.partition("=")
        key = key.strip()
        if not key:
            continue
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        out[key] = value
    return out


def _env_raw(name: str) -> str | None:
    """Layered lookup with the reference's pydantic-settings precedence
    (env vars beat the dotenv file, which beats field defaults). The
    dotenv file is re-read per lookup — load_settings() is a cold-path
    config read, and staleness would be worse than the microseconds."""
    raw = os.environ.get(name)
    if raw is not None:
        return raw
    return dotenv_values().get(name)


def env_int(name: str, default: int) -> int:
    raw = _env_raw(name)
    if raw is None:
        return default
    try:
        return int(raw.strip())
    except ValueError:
        return default


def env_float(name: str, default: float) -> float:
    raw = _env_raw(name)
    if raw is None:
        return default
    try:
        return float(raw.strip())
    except ValueError:
        return default


def env_bool(name: str, default: bool = False) -> bool:
    """Truthy env parse (http_client.py:56): 1/true/yes/on, case-insensitive."""
    raw = _env_raw(name)
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
