"""Live HTTP source architecture (SURVEY.md §2.1 S2/S3, §2.9 T6, §3.2).

Spark has no HTTP data source; the reference's rate-limited, retried,
capture-everything GET/POST client (http_client.py:121-313) maps to a
`mapInPandas` stage: each partition of the plan table drives its own
client loop and EMITS THE ATTEMPT LOG AS ROWS (the reference's observer
callback, U2, becomes a first-class output — the `attempts` DataFrame is
the provenance grain from which `responses` derives).

Faithfully mirrored semantics:
- bounded retry: exactly `max_attempts` (default 3), immediate re-try
  (http_client.py:163,260); retryable = 429/403/5xx (F7, :111-112);
  transport errors emit status-0 attempts with error_type and retry;
- exponential backoff with jitter is available (X10, retry_policy.py:13 —
  declared-but-unused in the reference; here it's wired but defaults to
  the reference's no-backoff behavior);
- size cap: body > max_artifact_bytes → error attempt, no retry (F9);
- rate limiting: token buckets per host (10 rps sec.gov, 5 rps default)
  and per (subscription_key, host) (3 rps) — rate_limiter.py:6-58.

Scale note: buckets live per partition (executors share no memory). For
a global limit of R rps across P concurrent partitions, configure each
bucket at R/P — or front the fetch with a single-partition repartition
when the API, not the cluster, is the bottleneck. Live transports (httpx)
are injected; tests use deterministic fake transports, keeping this
module fully exercised without network.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

# transport: (method, url, headers) -> (status_code, headers, body)
Transport = Callable[[str, str, dict], tuple[int, dict, bytes]]

SEC_HOST_RPS = 10.0  # http_client.py:158
DEFAULT_HOST_RPS = 5.0  # http_client.py:255
APS_KEY_RPS = 3.0  # http_client.py:96-100
MAX_ARTIFACT_BYTES = 50 * 1024 * 1024  # http_client.py:57-58
MAX_ATTEMPTS = 3  # http_client.py:163,260

ATTEMPT_SCHEMA = (
    "item_index bigint, provider string, method string, url string, "
    "attempt_number int, status_code int, error_type string, "
    "error_message string, body binary"
)


def is_retryable_status(status: int) -> bool:
    """F7 (http_client.py:111-112)."""
    return status in (429, 403) or status >= 500


class TokenBucket:
    """Token-bucket limiter (rate_limiter.py:6-24): capacity `burst`,
    refill `rate`/s; acquire blocks until a token is available."""

    def __init__(self, rate: float, burst: float = 1.0, clock=time.monotonic,
                 sleep=time.sleep):
        self.rate = rate
        self.burst = burst
        self.tokens = burst
        self._clock = clock
        self._sleep = sleep
        self._last = clock()

    def acquire(self) -> float:
        now = self._clock()
        self.tokens = min(self.burst, self.tokens + (now - self._last) * self.rate)
        self._last = now
        waited = 0.0
        if self.tokens < 1.0:
            waited = (1.0 - self.tokens) / self.rate
            self._sleep(waited)
            self._last = self._clock()
            self.tokens = 1.0
        self.tokens -= 1.0
        return waited


@dataclass
class RateLimiter:
    """Host-scoped + key-scoped buckets (rate_limiter.py:27-58)."""

    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep
    _host_buckets: dict = field(default_factory=dict)
    _key_buckets: dict = field(default_factory=dict)

    def acquire_host(self, host: str) -> float:
        rps = SEC_HOST_RPS if "sec.gov" in host else DEFAULT_HOST_RPS
        b = self._host_buckets.setdefault(
            host, TokenBucket(rps, clock=self.clock, sleep=self.sleep)
        )
        return b.acquire()

    def acquire_key(self, key: str, host: str) -> float:
        b = self._key_buckets.setdefault(
            (key, host), TokenBucket(APS_KEY_RPS, clock=self.clock, sleep=self.sleep)
        )
        return b.acquire()


def backoff_delays(attempts: int, initial: float = 0.2, maximum: float = 5.0,
                   jitter: Callable[[int], float] | None = None) -> list[float]:
    """X10 (retry_policy.py:13): exponential backoff schedule with optional
    deterministic jitter. The reference declares this and never applies it
    (SURVEY §3.2); fetch_items defaults to no backoff for parity."""
    out = []
    for i in range(attempts):
        base = min(maximum, initial * (2**i))
        out.append(base + (jitter(i) if jitter else 0.0))
    return out


def _append_param(url: str, name: str, value) -> str:
    sep = "&" if "?" in url else "?"
    return f"{url}{sep}{name}={value}"


def _request_with_retry(
    item: dict,
    method: str,
    url: str,
    host: str,
    transport: Transport,
    limiter: RateLimiter,
    *,
    max_attempts: int,
    max_bytes: int,
    backoff: list[float] | None,
    sleep: Callable[[float], None],
    subscription_key: str | None,
) -> tuple[list[dict], bytes | None]:
    """One logical request: the bounded-retry loop for a single URL.
    Returns (attempt rows, final successful body or None)."""
    rows: list[dict] = []
    for attempt in range(1, max_attempts + 1):
        limiter.acquire_host(host)
        if subscription_key and host == "adams-api.nrc.gov":
            limiter.acquire_key(subscription_key, host)
        base = {
            "item_index": item.get("item_index", -1),
            "provider": item.get("provider", ""),
            "method": method,
            "url": url,
            "attempt_number": attempt,
        }
        try:
            status, headers, body = transport(method, url, item.get("headers") or {})
        except Exception as exc:  # transport error: status-0 attempt, retry
            rows.append({**base, "status_code": 0, "error_type": type(exc).__name__,
                         "error_message": str(exc)[:400], "body": None})
            if attempt < max_attempts and backoff:
                sleep(backoff[attempt - 1])
            continue
        if len(body) > max_bytes:  # F9: cap breach — no retry
            rows.append({**base, "status_code": status, "error_type": "ArtifactTooLarge",
                         "error_message": f"{len(body)} > {max_bytes}", "body": None})
            return rows, None
        if is_retryable_status(status):
            rows.append({**base, "status_code": status, "error_type": "RetryableStatus",
                         "error_message": f"HTTP {status}", "body": None})
            if attempt < max_attempts and backoff:
                sleep(backoff[attempt - 1])
            continue
        if status >= 400:  # non-retryable client error — one attempt
            rows.append({**base, "status_code": status, "error_type": "HttpStatusError",
                         "error_message": f"HTTP {status}", "body": None})
            return rows, None
        rows.append({**base, "status_code": status, "error_type": None,
                     "error_message": None, "body": bytes(body)})
        return rows, bytes(body)
    return rows, None  # retries exhausted


def fetch_items(
    items: Iterator[dict],
    transport: Transport,
    *,
    limiter: RateLimiter | None = None,
    max_attempts: int = MAX_ATTEMPTS,
    max_bytes: int = MAX_ARTIFACT_BYTES,
    backoff: list[float] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    subscription_key: str | None = None,
) -> Iterator[dict]:
    """The per-partition client loop: for each plan item emit one row per
    HTTP attempt (successful final attempts carry the body).

    T4 offset pagination (dossier §4.1/§4.2, Golden_Record_API_Dossiers.md:
    685-689 "page by skip until results array is empty" and :703-715 step 3):
    an item may carry a ``paginate`` spec (dict / struct column) with keys
    ``skip_param`` (default "skip"), ``page_size`` (expected page length, may
    be None when the server cap is unknown), ``take_param`` (appended with
    page_size when both set), ``results_key`` (default "results"),
    ``max_pages`` (safety bound, default 1000) and ``start`` (initial skip).
    The loop issues one logical request per page (each through the full
    retry machinery, each page an attempt row with its own skip-qualified
    URL) and stops when the results array is EMPTY or SHORTER than
    page_size. Per the dossier's count-ambiguity warning (:689 — "may be
    total count, page count, or returned count") any ``count``/``total``
    field in the response is deliberately IGNORED; skip advances by the
    RETURNED length, never by trusted metadata. A failed or unparseable
    page ends the chain (its error attempts are already captured).

    Scale shape: a pagination chain is inherently sequential (page N's skip
    depends on page N-1's length) but chains across plan items run in
    parallel, one per partition slot — the per-provider sync-loop grain."""
    limiter = limiter or RateLimiter()
    kw = dict(max_attempts=max_attempts, max_bytes=max_bytes, backoff=backoff,
              sleep=sleep, subscription_key=subscription_key)
    for item in items:
        method, url = item.get("method", "GET"), item["url"]
        host = url.split("://", 1)[-1].split("/", 1)[0]
        paginate = item.get("paginate")
        if not isinstance(paginate, dict):  # None / pandas NaN → single request
            rows, _ = _request_with_retry(item, method, url, host, transport,
                                          limiter, **kw)
            yield from rows
            continue
        skip_param = paginate.get("skip_param") or "skip"
        results_key = paginate.get("results_key") or "results"
        take_param = paginate.get("take_param")
        page_size = paginate.get("page_size")
        page_size = int(page_size) if page_size is not None else None
        max_pages = int(paginate.get("max_pages") or 1000)
        skip = int(paginate.get("start") or 0)
        for _page in range(max_pages):
            page_url = _append_param(url, skip_param, skip)
            if take_param and page_size:
                page_url = _append_param(page_url, take_param, page_size)
            rows, body = _request_with_retry(item, method, page_url, host,
                                             transport, limiter, **kw)
            yield from rows
            if body is None:  # request failed — chain cannot continue
                break
            try:
                import json

                results = json.loads(body).get(results_key) or []
            except Exception:  # unparseable page — stop; attempts captured
                break
            n = len(results)
            if n == 0:  # dossier stop condition 1: empty results array
                break
            if page_size and n < page_size:  # stop condition 2: short page
                break
            skip += n


def http_source(plan_df, transport_factory: Callable[[], Transport], **kwargs):
    """Distributed attempts source: mapInPandas over the plan table. The
    transport factory is called once per partition (connection reuse);
    everything is closure-serialized (no repo install on executors)."""
    import pandas as pd

    def run(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        transport = transport_factory()
        for pdf in pdfs:
            rows = list(fetch_items(pdf.to_dict("records"), transport, **kwargs))
            if rows:
                yield pd.DataFrame(rows)

    return plan_df.mapInPandas(run, schema=ATTEMPT_SCHEMA)


def live_transport_factory(timeout: float = 30.0) -> Callable[[], Transport]:
    """OPTIONAL real-network transport for http_source — the runnable
    counterpart of the reference's live httpx client
    (http_client.py:121-216,218-313). Never used by tests or the driver
    (both inject deterministic fakes); construction is gated behind
    SPARK_GRAFT_LIVE_HTTP=1 so offline runs cannot reach the network by
    accident. Prefers httpx (connection pooling, the reference's
    library); falls back to stdlib urllib so the adapter works on images
    without httpx. Non-2xx statuses are RETURNED, not raised — status
    classification (retry/quarantine) is fetch_items' job."""
    import os

    if os.environ.get("SPARK_GRAFT_LIVE_HTTP") != "1":
        raise RuntimeError(
            "live HTTP transport is disabled; set SPARK_GRAFT_LIVE_HTTP=1 "
            "to allow real network access"
        )

    def factory() -> Transport:
        try:
            import httpx

            client = httpx.Client(timeout=timeout, follow_redirects=True)

            def transport(method: str, url: str, headers: dict):
                r = client.request(method, url, headers=headers or {})
                return r.status_code, dict(r.headers), r.content

            return transport
        except ImportError:
            import urllib.error
            import urllib.request

            def transport(method: str, url: str, headers: dict):
                req = urllib.request.Request(url, headers=headers or {}, method=method)
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        return resp.status, dict(resp.headers), resp.read()
                except urllib.error.HTTPError as e:  # non-2xx: classify, don't raise
                    return e.code, dict(e.headers or {}), e.read() or b""

            return transport

    return factory


def responses_from_attempts(attempts):
    """Derive the responses table (successful capture grain) from the
    attempts log — the reference's CapturedResponse is exactly the
    error-free attempt (http_client.py:147-154)."""
    from pyspark.sql import functions as F

    return attempts.filter(
        F.col("error_type").isNull() & (F.col("status_code") >= 200)
        & (F.col("status_code") < 400)
    )


def stream_download_with_sha256(chunks, target) -> tuple[str, int]:
    """S4 — streaming download with incremental hash (reference
    downloads.py:7-20). Dead code in the reference itself (only
    `sha256_bytes` is ever imported, pipeline.py:4,39); implemented
    here to close the surface row with the same contract, decoupled
    from any HTTP client: `chunks` is any iterator of byte chunks
    (the reference's `response.iter_bytes()`; here, a chunked
    Transport or a file stream), written to `target` while a sha256
    runs incrementally, returning (hex digest, total bytes).
    Reference semantics mirrored exactly: parent directories created,
    empty chunks skipped, digest == sha256 of the whole body.

    Spark placement: this is the EXECUTOR-side spill path for
    artifacts larger than memory — a fetch task hashes while spilling
    to local disk so an oversized body never materializes on the
    heap, and only the (path, sha256, bytes) triple enters the row
    (the S7 content-addressed sink then moves the file by its hash
    prefix). The batch-sized path stays S1+X1 (binaryFile + sha2)."""
    import hashlib
    from pathlib import Path

    target = Path(target)
    target.parent.mkdir(parents=True, exist_ok=True)
    digest = hashlib.sha256()
    total = 0
    with target.open("wb") as handle:
        for chunk in chunks:
            if not chunk:
                continue
            handle.write(chunk)
            digest.update(chunk)
            total += len(chunk)
    return digest.hexdigest(), total
