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

exits 0 and prints ``no post-cert source commits`` when the TREE diff
<certified-sha>..HEAD touches only test files, docs, or round
artifacts; otherwise it lists the changed source paths and exits 1,
which means: re-run the gate on HEAD and append the re-certification
to NOTES.  (Tree diff, not a commit walk: merge commits and paths
with whitespace broke per-commit name parsing — ADVICE r13 item 3;
a change reverted before HEAD correctly passes, since certification
is a property of the tree, not the history.)

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
    # Compare TREES, not commit topology (ADVICE r13 item 3): walking
    # `git show --name-only` per commit mis-splits paths containing
    # whitespace and shows NO file list for merge commits, so a merge
    # bringing in source changes passed silently. One NUL-separated
    # tree diff gives the exact changed-path set regardless of either.
    raw = subprocess.check_output(
        ["git", "diff", "--name-only", "-z", f"{certified}..HEAD"]
    ).decode()
    changed = [p for p in raw.split("\0") if p]
    src = sorted(p for p in changed if is_source(p))
    n = len(out.splitlines())
    if not src:
        print(
            f"{n} post-cert commit(s), none touching "
            "source — certification still covers HEAD"
        )
        return 0
    print("POST-CERTIFICATION SOURCE CHANGES — re-run the double gate on HEAD:")
    print(f"  {n} commit(s) after {certified[:10]}; changed source paths:")
    for f in src:
        print(f"      {f}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
