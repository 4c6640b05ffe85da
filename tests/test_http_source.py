"""HTTP source semantics vs the reference client (http_client.py):
bounded retry, retryable classification, size cap, transport-error
capture, rate limiting — all via deterministic fake transports (no
network), both at the pure-Python grain and through the distributed
mapInPandas path.

Mirrors the reference's hardening tests (tests/test_capture_hardening.py:
retry-on-500 captures the failed attempt then succeeds; timeout captured
with error_type then retried).
"""

from __future__ import annotations

from api_etl_pipeline_spark.ingest.http_source import (
    RateLimiter,
    TokenBucket,
    backoff_delays,
    fetch_items,
    http_source,
    is_retryable_status,
    responses_from_attempts,
)


def _items(n=1, **over):
    return [{"item_index": i, "provider": "t", "url": "https://api.example.gov/x", **over}
            for i in range(n)]


def _no_limit():
    return RateLimiter(clock=lambda: 0.0, sleep=lambda s: None)


def test_retry_on_500_then_success():
    calls = []

    def transport(method, url, headers):
        calls.append(url)
        return (500, {}, b"") if len(calls) == 1 else (200, {}, b"payload")

    rows = list(fetch_items(iter(_items()), transport, limiter=_no_limit()))
    assert [r["status_code"] for r in rows] == [500, 200]
    assert rows[0]["error_type"] == "RetryableStatus" and rows[0]["body"] is None
    assert rows[1]["error_type"] is None and rows[1]["body"] == b"payload"
    assert [r["attempt_number"] for r in rows] == [1, 2]


def test_three_attempts_exhausted():
    rows = list(
        fetch_items(iter(_items()), lambda m, u, h: (503, {}, b""), limiter=_no_limit())
    )
    assert [r["attempt_number"] for r in rows] == [1, 2, 3]
    assert all(r["error_type"] == "RetryableStatus" for r in rows)


def test_transport_error_captured_and_retried():
    calls = []

    def transport(method, url, headers):
        calls.append(1)
        if len(calls) == 1:
            raise TimeoutError("read timed out")
        return 200, {}, b"ok"

    rows = list(fetch_items(iter(_items()), transport, limiter=_no_limit()))
    assert rows[0]["status_code"] == 0
    assert rows[0]["error_type"] == "TimeoutError"
    assert "read timed out" in rows[0]["error_message"]
    assert rows[1]["status_code"] == 200


def test_retryable_classification():
    # F7: 429/403/5xx retry; other 4xx do not (http_client.py:111-112,186)
    assert is_retryable_status(429) and is_retryable_status(403)
    assert is_retryable_status(500) and is_retryable_status(503)
    assert not is_retryable_status(404) and not is_retryable_status(200)
    rows = list(
        fetch_items(iter(_items()), lambda m, u, h: (404, {}, b""), limiter=_no_limit())
    )
    assert len(rows) == 1 and rows[0]["error_type"] == "HttpStatusError"


def test_size_cap_no_retry():
    rows = list(
        fetch_items(
            iter(_items()),
            lambda m, u, h: (200, {}, b"x" * 100),
            limiter=_no_limit(),
            max_bytes=50,
        )
    )
    assert len(rows) == 1
    assert rows[0]["error_type"] == "ArtifactTooLarge" and rows[0]["body"] is None


def test_token_bucket_rates():
    # deterministic clock: 1 token/s bucket must impose 1s spacing
    now = [0.0]
    waits = []

    def clock():
        return now[0]

    def sleep(s):
        waits.append(s)
        now[0] += s

    b = TokenBucket(rate=1.0, burst=1.0, clock=clock, sleep=sleep)
    assert b.acquire() == 0.0  # initial burst token
    w = b.acquire()
    assert abs(w - 1.0) < 1e-9  # refill wait at 1 rps
    assert abs(sum(waits) - 1.0) < 1e-9


def test_rate_limiter_scopes():
    slept = []
    rl = RateLimiter(clock=lambda: 0.0, sleep=lambda s: slept.append(s))
    rl.acquire_host("data.sec.gov")  # burst token, no sleep
    rl.acquire_host("data.sec.gov")  # second immediate call must wait ~1/10s
    assert abs(slept[-1] - 1.0 / 10) < 1e-9
    rl.acquire_host("other.example.gov")
    rl.acquire_host("other.example.gov")
    assert abs(slept[-1] - 1.0 / 5) < 1e-9
    rl.acquire_key("k1", "adams-api.nrc.gov")
    rl.acquire_key("k1", "adams-api.nrc.gov")
    assert abs(slept[-1] - 1.0 / 3) < 1e-9


def test_backoff_schedule():
    # X10: exp backoff 0.2 → 5.0 cap (retry_policy.py:13)
    assert backoff_delays(5) == [0.2, 0.4, 0.8, 1.6, 3.2]
    assert backoff_delays(7)[-1] == 5.0
    import pytest

    with_jitter = backoff_delays(3, jitter=lambda i: 0.01 * i)
    assert with_jitter == pytest.approx([0.2, 0.41, 0.82])


def test_distributed_http_source(spark):
    plan = spark.createDataFrame(
        [(i, "t", "GET", f"https://api.example.gov/doc/{i}") for i in range(20)],
        "item_index long, provider string, method string, url string",
    )

    def transport_factory():
        def transport(method, url, headers):
            i = int(url.rsplit("/", 1)[-1])
            if i % 5 == 0:
                return 500, {}, b""  # fails all 3 attempts
            return 200, {}, f"body-{i}".encode()

        return transport

    attempts = http_source(
        plan.repartition(4),
        transport_factory,
        limiter=RateLimiter(clock=lambda: 0.0, sleep=lambda s: None),
    )
    rows = attempts.collect()
    ok = responses_from_attempts(attempts).collect()
    # 16 items succeed first try; 4 items (i%5==0) emit 3 failed attempts
    assert len(rows) == 16 + 4 * 3
    assert len(ok) == 16
    assert {bytes(r.body).decode() for r in ok} == {f"body-{i}" for i in range(20) if i % 5}


def test_live_transport_is_env_gated(monkeypatch):
    """The real-network adapter must refuse to construct unless
    SPARK_GRAFT_LIVE_HTTP=1 — offline CI can never reach the network by
    accident."""
    import pytest

    from api_etl_pipeline_spark.ingest.http_source import live_transport_factory

    monkeypatch.delenv("SPARK_GRAFT_LIVE_HTTP", raising=False)
    with pytest.raises(RuntimeError, match="SPARK_GRAFT_LIVE_HTTP"):
        live_transport_factory()


def test_live_transport_round_trip_when_network_allowed(monkeypatch):
    """Exercises the adapter for real — skipped wherever the network (or
    the env opt-in) is absent, which includes this offline container."""
    import socket

    import pytest

    from api_etl_pipeline_spark.ingest.http_source import live_transport_factory

    monkeypatch.setenv("SPARK_GRAFT_LIVE_HTTP", "1")
    try:
        socket.create_connection(("example.com", 443), timeout=2).close()
    except OSError:
        pytest.skip("no outbound network in this environment")
    transport = live_transport_factory(timeout=10.0)()
    status, headers, body = transport("GET", "https://example.com/", {})
    assert status == 200 and len(body) > 0
