"""S5 fetcher hardening: retry/backoff contract under injected failures.

No network in this sandbox, so failures are injected (timeout, partial
read, transient 5xx-style errors) into the with_retry wrapper — the piece
of http_fetcher's path that owns failure policy. Pure Python, no Spark.
"""

from __future__ import annotations

import pytest

from ds_raster_pipelines_spark.sources import remote


class _Flaky:
    """Fetcher that fails ``fail_n`` times, then returns ``payload``."""

    def __init__(self, fail_n: int, exc: Exception, payload: bytes = b"ok"):
        self.fail_n = fail_n
        self.exc = exc
        self.payload = payload
        self.calls = 0

    def __call__(self, ref: str) -> bytes:
        self.calls += 1
        if self.calls <= self.fail_n:
            raise self.exc
        return self.payload


@pytest.fixture
def sleeps(monkeypatch):
    """Record backoff sleeps instead of actually sleeping."""
    recorded: list[float] = []
    monkeypatch.setattr(remote.time, "sleep", recorded.append)
    return recorded


def test_retry_recovers_from_transient_timeout(sleeps):
    f = _Flaky(2, TimeoutError("read timed out"))
    wrapped = remote.with_retry(f, attempts=3, backoff_s=0.5)
    assert wrapped("ref://x") == b"ok"
    assert f.calls == 3
    assert sleeps == [0.5, 1.0]  # deterministic exponential backoff


def test_retry_exhausts_and_reraises_last(sleeps):
    f = _Flaky(99, ConnectionResetError("partial read: 1024/4096 bytes"))
    wrapped = remote.with_retry(f, attempts=3, backoff_s=0.25)
    with pytest.raises(ConnectionResetError, match="partial read"):
        wrapped("ref://x")
    assert f.calls == 3  # bounded: exactly `attempts` tries
    assert sleeps == [0.25, 0.5]  # no sleep after the final failure


def test_retry_single_attempt_never_sleeps(sleeps):
    f = _Flaky(99, OSError("boom"))
    with pytest.raises(OSError):
        remote.with_retry(f, attempts=1)("ref://x")
    assert f.calls == 1
    assert sleeps == []


def test_retry_passthrough_on_success(sleeps):
    f = _Flaky(0, RuntimeError("unused"), payload=b"payload-bytes")
    assert remote.with_retry(f, attempts=3)("ref://x") == b"payload-bytes"
    assert f.calls == 1
    assert sleeps == []


def test_file_fetcher_reads_file_uri(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(b"\x00\x01raster")
    assert remote.file_fetcher(str(p)) == b"\x00\x01raster"
    assert remote.file_fetcher(f"file://{p}") == b"\x00\x01raster"


def test_retry_composes_with_error_as_data():
    """fetch_blobs' kernel catches what with_retry finally raises — the
    composed policy is 'retry transient, then record error as a row'.
    Verified at the function level (no Spark): the wrapped fetcher raises
    the LAST error, carrying the terminal cause for the err column."""
    f = _Flaky(99, TimeoutError("slow origin"))
    wrapped = remote.with_retry(f, attempts=2, backoff_s=0)
    try:
        wrapped("ref://x")
    except Exception as e:  # noqa: BLE001 — mirrors the kernel's capture
        row_err = f"{type(e).__name__}: {e}"
    assert row_err == "TimeoutError: slow origin"
