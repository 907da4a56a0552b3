#!/usr/bin/env python3
"""Post-certification commit detector (VERDICT r12 item 4).

The round-close discipline certifies a double gate (full pytest +
bare-session driver sim + three-SF oracle sweeps + audit) on an EXACT
tree.  Round 12 then landed a bench.py telemetry commit AFTER the
certification record without re-running the gate — harmless that time,
but the discipline says re-run-and-record after ANY post-certification
commit touching non-test source.  This makes the check mechanical
instead of remembered:

    python3 tools/recert_check.py <certified-sha>

exits 0 and prints ``no post-cert source commits`` when every commit
after <certified-sha> touches only test files, docs, or round
artifacts; otherwise it lists the offending commits/files and exits 1,
which means: re-run the gate on HEAD and append the re-certification
to NOTES.

"Source" is everything that can change what the gate measures: the
package, __spark_entry__.py, bench.py, and tools/ (the gate runs
through tools/*.py, so a tools change alters the measurement itself).
Ignored: tests/** (gate re-runs them anyway — a test-only commit can
only make the gate stricter), *.md, and the committed round artifacts.
"""

from __future__ import annotations

import subprocess
import sys

IGNORED_PREFIXES = ("tests/", ".claude/")
IGNORED_SUFFIXES = (".md",)
IGNORED_FILES = {"bench_out.json", ".gitignore"}
IGNORED_GLOBS = ("BENCH_r", "CORRECTNESS_r", "COPYCHECK", "LEAKCHECK", "PROGRESS")


def is_source(path: str) -> bool:
    if any(path.startswith(p) for p in IGNORED_PREFIXES):
        return False
    if any(path.endswith(s) for s in IGNORED_SUFFIXES):
        return False
    base = path.rsplit("/", 1)[-1]
    if base in IGNORED_FILES:
        return False
    if any(base.startswith(g) for g in IGNORED_GLOBS):
        return False
    return True


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    certified = sys.argv[1]
    out = subprocess.check_output(
        ["git", "log", "--format=%H %s", f"{certified}..HEAD"], text=True
    ).strip()
    if not out:
        print(f"no commits after {certified} — certification covers HEAD")
        return 0
    dirty = []
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        files = subprocess.check_output(
            ["git", "show", "--name-only", "--format=", sha], text=True
        ).split()
        src = [f for f in files if is_source(f)]
        if src:
            dirty.append((sha[:10], subject, src))
    if not dirty:
        print(
            f"{len(out.splitlines())} post-cert commit(s), none touching "
            "source — certification still covers HEAD"
        )
        return 0
    print("POST-CERTIFICATION SOURCE COMMITS — re-run the double gate on HEAD:")
    for sha, subject, src in dirty:
        print(f"  {sha} {subject}")
        for f in src:
            print(f"      {f}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
