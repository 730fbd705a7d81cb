"""Run the FULL slow suite and record the result in VALIDATION.md.

The slow set (pytest -m slow) is the only coverage of the trainer
end-to-end paths, the 2-process multihost layout, the lockstep torch
trajectories, and the real-chip learning regressions (pytest.ini).
This runner makes the "run it before any round handoff" instruction a
one-command artifact: it executes the suite, parses the summary, and
appends a dated row to VALIDATION.md's "Slow-suite record" section.

    python tools/run_slow_suite.py            # full slow suite
    python tools/run_slow_suite.py -k expr    # subset (recorded as such)
"""

import datetime
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Slow-suite record"


def run(extra):
    argv = [sys.executable, "-m", "pytest", "tests/", "-m", "slow",
            "-q", "--no-header"] + extra
    print("+", " ".join(argv), flush=True)
    t0 = time.time()
    proc = subprocess.run(argv, cwd=REPO, text=True,
                          stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-8000:])
    return proc, wall


def parse_summary(out):
    """Last pytest summary line -> dict of counts."""
    counts = {}
    for line in reversed(out.splitlines()):
        m = re.findall(r"(\d+) (passed|failed|skipped|error(?:s)?|"
                       r"deselected|xfailed|xpassed)", line)
        if m and ("passed" in line or "failed" in line or "error" in line):
            for n, kind in m:
                counts[kind.rstrip("s")] = int(n)
            break
    return counts


def record(counts, wall, rc, extra):
    date = datetime.date.today().isoformat()
    mins = int(wall // 60)
    secs = int(wall % 60)
    scope = "full" if not extra else f"subset ({' '.join(extra)})"
    summary = ", ".join(f"{v} {k}" for k, v in sorted(counts.items()))
    line = (f"| {date} | {scope} | {summary or 'NO SUMMARY PARSED'} "
            f"| {mins}:{secs:02d} | rc={rc} |")

    path = os.path.join(REPO, "VALIDATION.md")
    text = open(path).read()
    if MARKER not in text:
        text += (
            f"\n{MARKER}\n\n"
            "One row per recorded run of `python tools/run_slow_suite.py`"
            " (the ONLY trainer-e2e / multihost-2proc / lockstep /"
            " real-chip-regression coverage — run before any round"
            " handoff, and after touching train/, data/*pipeline* or"
            " parallel/).\n\n"
            "| date | scope | result | wall | rc |\n|---|---|---|---|---|\n")
    text = text.rstrip("\n") + "\n" + line + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(f"\nrecorded -> VALIDATION.md: {line}")


def main():
    extra = sys.argv[1:]
    proc, wall = run(extra)
    counts = parse_summary(proc.stdout)
    record(counts, wall, proc.returncode, extra)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
