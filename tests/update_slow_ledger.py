"""Maintain + enforce tests/slow_tests.txt from pytest --durations=0 logs.

Regenerate (after a FULL-suite duration run):
    python -m pytest tests/ -q --durations=0 > /tmp/durations.log
    python tests/update_slow_ledger.py /tmp/durations.log [threshold_s]

Enforce (the suite-budget guard, VERDICT r4 item 7 — run by CI on the
fast gate's own --durations=0 output):
    python tests/update_slow_ledger.py --check fast.log [--max-wall 960]

``--check`` fails (exit 1) when
  * any test NOT in the ledger measured >= the threshold — i.e. a new
    slow test silently landed in the fast gate; ledger it (or speed it
    up) to pass, or
  * the run's total wall exceeds ``--max-wall`` seconds (default 960 =
    the documented ~16 min fast-gate budget).

Entries are the 'call' phases above the threshold (default 8 s on the
single-core reference host), written as bare ``file::test`` node ids
(parametrized variants collapse onto their base id — the conftest hook
marks every parametrization). The ledger defines the `slow` tier: the
CI fast gate runs ``-m "not slow"``.
"""
import argparse
import re
import sys
from pathlib import Path

DEFAULT_THRESHOLD_S = 8.0
DEFAULT_MAX_WALL_S = 960.0
LINE = re.compile(r"^\s*([0-9.]+)s\s+call\s+(\S+)")
WALL = re.compile(r"\bin ([0-9.]+)s\b")


def parse_durations(log_path):
    """{base node id: max call seconds} from a pytest --durations log."""
    slow = {}
    wall = None
    for line in Path(log_path).read_text().splitlines():
        m = LINE.match(line)
        if m:
            secs, nodeid = float(m.group(1)), m.group(2)
            base = nodeid.split("[")[0]
            slow[base] = max(slow.get(base, 0.0), secs)
            continue
        m = WALL.search(line)
        if m and ("passed" in line or "failed" in line):
            wall = float(m.group(1))
    return slow, wall


def ledger_entries():
    ledger = Path(__file__).parent / "slow_tests.txt"
    entries = set()
    if ledger.exists():
        for line in ledger.read_text().splitlines():
            entry = line.split("#", 1)[0].strip()
            if entry:
                entries.add(entry)
    return entries


def regenerate(log_path, threshold):
    slow, _ = parse_durations(log_path)
    slow = {k: v for k, v in slow.items() if v >= threshold}
    out = Path(__file__).parent / "slow_tests.txt"
    lines = ["# tests measured >= %.0f s ('call' phase) on the 1-core"
             % threshold,
             "# reference host; regenerate with tests/update_slow_ledger.py",
             "# (see conftest.pytest_collection_modifyitems)"]
    for base, secs in sorted(slow.items(), key=lambda kv: -kv[1]):
        lines.append("%s  # %.0fs" % (base, secs))
    out.write_text("\n".join(lines) + "\n")
    print("wrote %s: %d slow tests" % (out, len(slow)))


def check(log_path, threshold, max_wall):
    durations, wall = parse_durations(log_path)
    if not durations or wall is None:
        # a crashed/OOM-killed pytest leaves a truncated log; a green
        # guard over zero evidence would mask it (review finding)
        print("suite-budget guard FAILED: durations log is empty or "
              "truncated (%d timed tests, wall %s) — did pytest crash?"
              % (len(durations), wall))
        sys.exit(1)
    ledgered = ledger_entries()
    offenders = sorted(
        ((base, secs) for base, secs in durations.items()
         if secs >= threshold and base not in ledgered),
        key=lambda kv: -kv[1])
    failed = False
    if offenders:
        failed = True
        print("suite-budget guard FAILED: %d non-ledgered tests above "
              "the %.0f s fast-gate threshold:" % (len(offenders),
                                                   threshold))
        for base, secs in offenders:
            print("  %6.1fs  %s" % (secs, base))
        print("-> either speed them up or add them to "
              "tests/slow_tests.txt (moves them to the nightly tier)")
    if wall is not None and wall > max_wall:
        failed = True
        print("suite-budget guard FAILED: fast gate took %.0f s "
              "(budget %.0f s)" % (wall, max_wall))
    if failed:
        sys.exit(1)
    print("suite-budget guard OK: %d timed tests, all non-ledgered under "
          "%.0f s%s" % (len(durations), threshold,
                        ", wall %.0f s" % wall if wall is not None else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="pytest --durations=0 output")
    ap.add_argument("threshold", nargs="?", type=float,
                    default=DEFAULT_THRESHOLD_S)
    ap.add_argument("--check", action="store_true",
                    help="enforce instead of regenerate")
    ap.add_argument("--max-wall", type=float, default=DEFAULT_MAX_WALL_S,
                    help="fast-gate total wall budget in seconds "
                         "(--check only)")
    args = ap.parse_args()
    if args.check:
        check(args.log, args.threshold, args.max_wall)
    else:
        regenerate(args.log, args.threshold)


if __name__ == "__main__":
    main()
