"""Back-to-back A/B of named queries: base worktree vs this tree.

Runs tools/time_queries.py in the pinned base worktree, then in this
tree, alternating (B, A, B, A) so host drift cancels to first order;
reports per-query medians and ratios.

Usage: python tools/ab_compare.py <base_worktree> [--runs N] q1 q2 ...
Output: .tmp/ab_compare.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tree: str, names: list[str], runs: int) -> dict[str, float]:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(tree, "tools", "time_queries.py"),
            "--runs",
            str(runs),
            *names,
        ],
        cwd=tree,
        capture_output=True,
        text=True,
        check=True,
    )
    # time_queries prints one JSON line last
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {tree}: {out.stdout[-500:]}")


def main() -> None:
    args = sys.argv[1:]
    base = os.path.abspath(args.pop(0))
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    names = args
    pairs: list[tuple[dict, dict]] = []
    for i in range(2):  # two interleaved passes
        b = _run(base, names, runs)
        a = _run(REPO, names, runs)
        pairs.append((b, a))
        print(f"pass {i}: base={b} head={a}", flush=True)
    result = {}
    for n in names:
        bs = [p[0][n] for p in pairs if n in p[0]]
        hs = [p[1][n] for p in pairs if n in p[1]]
        if not bs or not hs:
            result[n] = {"base": bs, "head": hs, "ratio": None}
            continue
        bm = sorted(bs)[len(bs) // 2]
        hm = sorted(hs)[len(hs) // 2]
        result[n] = {
            "base_runs": bs,
            "head_runs": hs,
            "base": bm,
            "head": hm,
            "speedup": round(bm / hm, 3) if hm else None,
        }
        print(f"{n}: base {bm:.3f}s -> head {hm:.3f}s "
              f"({bm / hm:.2f}x)", flush=True)
    with open(os.path.join(REPO, ".tmp", "ab_compare.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
