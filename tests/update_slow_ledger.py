"""Regenerate tests/slow_tests.txt from a pytest --durations=0 log.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/durations.log
    python tests/update_slow_ledger.py /tmp/durations.log [threshold_s]

Entries are the 'call' phases above the threshold (default 8 s on the
single-core reference host), written as bare ``file::test`` node ids
(parametrized variants collapse onto their base id — the conftest hook
marks every parametrization). The ledger defines the `slow` tier: the
CI fast gate runs ``-m "not slow"``.
"""
import re
import sys
from pathlib import Path

DEFAULT_THRESHOLD_S = 8.0
LINE = re.compile(r"^\s*([0-9.]+)s\s+call\s+(\S+)")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    threshold = (float(sys.argv[2]) if len(sys.argv) > 2
                 else DEFAULT_THRESHOLD_S)
    slow = {}
    for line in Path(sys.argv[1]).read_text().splitlines():
        m = LINE.match(line)
        if not m:
            continue
        secs, nodeid = float(m.group(1)), m.group(2)
        base = nodeid.split("[")[0]
        slow[base] = max(slow.get(base, 0.0), secs)
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


if __name__ == "__main__":
    main()
