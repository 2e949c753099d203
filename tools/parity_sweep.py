#!/usr/bin/env python3
"""Per-query oracle parity with a time budget — for generated scale
factors where a handful of DuckDB oracles are O(n^2) brute force
(pair joins / recursive-CTE clustering / levenshtein blocks) and
genuinely intractable oracle-side, while the other ~100 remain fast.

Usage: python3 tools/parity_sweep.py <sfdir> <verify_out_dir> [timeout_s]

Runs tools/parity_check.py one query at a time in a subprocess with a
per-query timeout; a timeout is reported as SKIP (intractable oracle at
this SF), not a failure. Driver-side tooling only.
"""
import json
import os
import subprocess
import sys

def main() -> int:
    # abspath: symlink targets below are resolved relative to the
    # LINK's directory, so a relative outdir would produce dangling
    # links ({outdir}/.sweep/{name}/{name} -> {outdir}/{name}) and a
    # spurious FAIL for every query
    sfdir, outdir = sys.argv[1], os.path.abspath(sys.argv[2])
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    here = os.path.dirname(os.path.abspath(__file__))
    passed, failed, skipped = [], [], []
    for name in sorted(oracle):
        # stage a single-query view of the verify dir (symlinks)
        stage = f"{outdir}/.sweep/{name}"
        os.makedirs(stage, exist_ok=True)
        link = f"{stage}/{name}"
        if not os.path.islink(link):
            os.symlink(f"{outdir}/{name}", link)
        with open(f"{stage}/oracle_sql.json", "w") as f:
            json.dump({name: oracle[name]}, f)
        try:
            r = subprocess.run(
                [sys.executable, f"{here}/parity_check.py", sfdir, stage],
                capture_output=True, text=True, timeout=budget)
            line = (r.stdout.strip().splitlines() or ["?"])[0]
            if r.returncode == 0:
                passed.append(name)
                print(line)
            else:
                failed.append(name)
                print(line)
        except subprocess.TimeoutExpired:
            skipped.append(name)
            print(f"SKIP  {name}: oracle exceeded {budget}s (intractable at this SF)")
    print(f"\n{len(passed)}/{len(passed) + len(failed)} tractable oracles pass; "
          f"{len(skipped)} skipped as oracle-intractable: {skipped}")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main())
