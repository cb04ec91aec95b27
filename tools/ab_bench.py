"""Interleaved A/B bench: run the same query subset alternately from
two checkouts (new = this repo, old = a worktree at the baseline
commit), several alternating reps, and report per-query min + ratio.

Interleaving is the repo's required method for before/after claims on
this noisy-neighbor box (PERF.md round 15): both sides sample the same
host condition, so the ratio cancels drift that wrecks single-run
comparisons.

Run:  python tools/ab_bench.py <query,query,...> [reps] [old_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_side(repo: str, queries: str) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_QUERIES"] = queries
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_BENCH_REPEATS"] = os.environ.get(
        "AB_BENCH_REPEATS", "2"
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        sys.exit(f"bench failed in {repo}:\n{out.stdout[-2000:]}\n"
                 f"{out.stderr[-3000:]}")
    parsed = json.loads(line[-1])
    res = dict(parsed["queries"])
    res["__control__"] = parsed["drift"]["control_sec"]
    return res


def main() -> None:
    queries = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    old_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dhs_old"
    new_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    mins: dict[str, dict[str, float]] = {"new": {}, "old": {}}
    for rep in range(reps):
        order = (("new", new_dir), ("old", old_dir))
        if rep % 2:  # alternate which side goes first: the first run of
            # a rep systematically pays colder page cache / host state
            order = order[::-1]
        for side, repo in order:
            t = run_side(repo, queries)
            for k, v in t.items():
                cur = mins[side].get(k)
                mins[side][k] = v if cur is None else min(cur, v)
            print(f"rep{rep} {side}: " + " ".join(
                f"{k}={v:.2f}" for k, v in sorted(t.items())), flush=True)

    print("\n=== per-query min over interleaved reps ===")
    for k in sorted(mins["new"]):
        n, o = mins["new"][k], mins["old"].get(k)
        if o:
            print(f"{k:28s} old={o:7.3f}  new={n:7.3f}  ratio={n / o:.3f}")


if __name__ == "__main__":
    main()
