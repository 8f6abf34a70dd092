"""bench.py infrastructure hardening: the _guard retry around transient
remote-compile failures (round-4 session saw 'INTERNAL: remote_compile:
response body closed' twice mid-program; a bench run hitting that must
retry, not record ok=false)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def test_guard_retries_transient_compile_failure(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("INTERNAL: remote_compile: response body closed")
        return {"ok": True}

    out = bench._guard(flaky)
    assert out == {"ok": True}
    assert calls["n"] == 2


def test_guard_does_not_retry_real_errors(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("energy gate failed")

    out = bench._guard(broken)
    assert out["ok"] is False
    assert "energy gate failed" in out["error"]
    assert calls["n"] == 1


def test_guard_gives_up_after_bounded_retries(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def always_transient():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: tunnel down")

    out = bench._guard(always_transient, retries=2)
    assert out["ok"] is False
    assert out["attempts"] == 3
    assert calls["n"] == 3
