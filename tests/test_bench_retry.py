"""The bench driver hook's retry wrapper (bench._run_with_retries).

The harness's TPU relay intermittently refuses backend init and jax
caches the failed backend for the process lifetime, so bench.py re-execs
the measurement in fresh child processes and retries on failure
(NOTES_TPU_ENV.md). These tests pin the wrapper's contract without
touching a device: success passes through, failures retry in NEW
subprocess invocations, a wedged child (TimeoutExpired) counts as a
failure, and a deterministic bug still exits nonzero.
"""

import importlib.util
import pathlib
import subprocess
import types

import pytest

_BENCH_PATH = pathlib.Path(__file__).resolve().parent.parent / "bench.py"


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location("_bench_under_test",
                                                  _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_RESULT = ('{"metric": "realtime_factor", "value": 4.2, '
           '"unit": "x_realtime", "vs_baseline": 44.8}')


class _FakeRun:
    """Scripted subprocess.run replacement: pops one outcome per call.

    An outcome is an int returncode, a (returncode, stdout) pair, or the
    TimeoutExpired class. Plain int returncode 0 implies a result line on
    stdout (a healthy child).
    """

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.calls = []

    def __call__(self, argv, env=None, timeout=None, stdout=None, text=None):
        self.calls.append(dict(argv=argv, env=env, timeout=timeout,
                               stdout=stdout, text=text))
        outcome = self.outcomes.pop(0)
        if outcome is subprocess.TimeoutExpired:
            raise subprocess.TimeoutExpired(argv, timeout)
        if isinstance(outcome, tuple):
            ret, out = outcome
        else:
            ret, out = outcome, (_RESULT + "\n" if outcome == 0 else "")
        return types.SimpleNamespace(returncode=ret, stdout=out)


def _patch(monkeypatch, bench_mod, outcomes):
    fake = _FakeRun(outcomes)
    monkeypatch.setattr(subprocess, "run", fake)
    # no real sleeps between retry attempts
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    return fake


def test_success_first_try(monkeypatch, bench_mod, capsys):
    fake = _patch(monkeypatch, bench_mod, [0])
    assert bench_mod._run_with_retries() == 0
    assert len(fake.calls) == 1
    # the child is marked so it runs the measurement instead of recursing
    assert fake.calls[0]["env"]["_LIBZL_BENCH_CHILD"] == "1"
    # child stdout is captured, and the result line forwarded exactly once
    assert fake.calls[0]["stdout"] is subprocess.PIPE
    assert capsys.readouterr().out == _RESULT + "\n"


def test_teardown_crash_after_result_is_accepted(monkeypatch, bench_mod,
                                                 capsys):
    """A child that prints its result line and then exits nonzero (relay
    threads dying at interpreter teardown) is accepted: one JSON line out,
    no retry."""
    fake = _patch(monkeypatch, bench_mod, [(1, _RESULT + "\n")])
    assert bench_mod._run_with_retries() == 0
    assert len(fake.calls) == 1
    assert capsys.readouterr().out == _RESULT + "\n"


def test_failed_child_stdout_never_reaches_stdout(monkeypatch, bench_mod,
                                                  capsys):
    """Partial/garbage stdout from a failed attempt must not pollute the
    driver's one-JSON-line channel."""
    fake = _patch(monkeypatch, bench_mod,
                  [(1, "half-printed garbage"), 0])
    assert bench_mod._run_with_retries() == 0
    assert len(fake.calls) == 2
    assert capsys.readouterr().out == _RESULT + "\n"


def test_retries_transient_failure(monkeypatch, bench_mod):
    fake = _patch(monkeypatch, bench_mod, [1, 0])
    assert bench_mod._run_with_retries() == 0
    assert len(fake.calls) == 2


def test_timeout_counts_as_failure(monkeypatch, bench_mod):
    fake = _patch(monkeypatch, bench_mod, [subprocess.TimeoutExpired, 0])
    assert bench_mod._run_with_retries() == 0
    assert len(fake.calls) == 2
    assert fake.calls[0]["timeout"] is not None


def test_deterministic_failure_exits_nonzero(monkeypatch, bench_mod):
    fake = _patch(monkeypatch, bench_mod, [1, 1, 1])
    assert bench_mod._run_with_retries(attempts=3) == 1
    assert len(fake.calls) == 3
