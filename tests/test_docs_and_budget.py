"""Docs-build consistency + suite-budget guard mechanics (VERDICT r4
items 6-7): the API reference must track the live package and every
hand-written doc reference must resolve; the duration guard must fail
when a non-ledgered slow test lands in the fast gate.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_docs_check_green():
    """`docs/build_api.py --check` passes at HEAD: generated API pages
    current, all symbol references and relative links resolve. This is
    the in-suite mirror of the CI docs job — a renamed public symbol or
    a stale docs mention fails the fast gate here."""
    sys.path.insert(0, str(REPO / "docs"))
    try:
        import build_api
    finally:
        sys.path.pop(0)
    pages = build_api.generate()
    errors = build_api.check_generated(pages) + build_api.check_docs()
    assert not errors, "\n".join(errors)


def _run_guard(tmp_path, log_text, args=()):
    log = tmp_path / "durations.log"
    log.write_text(log_text)
    return subprocess.run(
        [sys.executable, str(REPO / "tests" / "update_slow_ledger.py"),
         "--check", str(log), *args],
        capture_output=True, text=True)


def test_budget_guard_fails_on_new_slow_test(tmp_path):
    """A 30 s test that is NOT in tests/slow_tests.txt fails --check."""
    r = _run_guard(tmp_path, "\n".join([
        "30.01s call     tests/test_new_thing.py::test_everything",
        "0.50s call     tests/test_fast.py::test_ok",
        "438 passed, 2 skipped in 845.00s (0:14:05)", ""]))
    assert r.returncode == 1, r.stdout + r.stderr
    assert "test_new_thing" in r.stdout


def test_budget_guard_fails_on_wall_overrun(tmp_path):
    r = _run_guard(tmp_path, "\n".join([
        "1.0s call     tests/test_fast.py::test_ok",
        "438 passed in 1200.00s (0:20:00)", ""]))
    assert r.returncode == 1, r.stdout + r.stderr
    assert "wall" in r.stdout or "budget" in r.stdout


def test_budget_guard_fails_on_truncated_log(tmp_path):
    """A crashed pytest leaves an empty/truncated durations log; a green
    guard over zero evidence would mask the crash."""
    r = _run_guard(tmp_path, "")
    assert r.returncode == 1, r.stdout + r.stderr
    assert "truncated" in r.stdout
    # durations present but no summary line (run killed mid-suite)
    r = _run_guard(tmp_path,
                   "1.0s call     tests/test_fast.py::test_ok\n")
    assert r.returncode == 1, r.stdout + r.stderr


def test_budget_guard_passes_ledgered_and_fast(tmp_path):
    # a ledgered slow test + fast tests + in-budget wall -> OK
    ledgered = next(
        line.split("#", 1)[0].strip()
        for line in (REPO / "tests" / "slow_tests.txt").read_text()
        .splitlines()
        if line.strip() and not line.startswith("#"))
    r = _run_guard(tmp_path, "\n".join([
        "120.0s call     %s" % ledgered,
        "0.50s call     tests/test_fast.py::test_ok",
        "438 passed, 2 skipped in 845.00s (0:14:05)", ""]))
    assert r.returncode == 0, r.stdout + r.stderr
