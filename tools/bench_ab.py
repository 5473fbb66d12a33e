#!/usr/bin/env python3
"""Interleaved A,B,B,A cross-version bench — the artifact behind any
cross-round performance TOTAL claim.

Why interleaved: ambient machine speed drifts WITHIN a window (measured
across rounds: same code re-read +7%..+29% between windows, and even
back-to-back same-window pairs bias the second run hot). A,B,B,A puts
each version once in slot 1+4 and once in slot 2+3, so a linear drift
cancels in the per-version means; the residual is honest noise.

Usage:
  python3 tools/bench_ab.py <prev_commit> [sf_dir] [out_json]

Runs the FULL graft.Bench suite (never SPARK_GRAFT_BENCH_ONLY — cold-JVM
subset numbers are 30-80% hot, see BENCH_NOTES) in a worktree at
<prev_commit> (A) and in the current repo (B), order A,B,B,A, and writes
out_json (default BENCH_AB.json):

  { prev_commit, head_commit, sf, order, totals: {A:[..],B:[..]},
    mean_total: {A, B, b_over_a},
    gates: {name: {a, b, b_minus_a}},   # per-gate means over both reps
    top_regressions / top_improvements }   # |delta| >= 0.15s
"""
import json, pathlib, subprocess, sys


def run_bench(cwd: str, sf_dir: str) -> dict:
    env = dict(__import__("os").environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    env["SPARK_GRAFT_BENCH_FULL"] = "/dev/null"  # don't clobber the repo artifact
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=3600)
    for line in (out.stdout + out.stderr).splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith('{"metric"'):
            return json.loads(line)
    sys.exit(f"no bench line from {cwd}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    prev = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_AB.json"
    repo = pathlib.Path(__file__).resolve().parent.parent
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=repo,
                          capture_output=True, text=True).stdout.strip()
    tree = f"/tmp/abtree_{prev[:10]}"
    if not pathlib.Path(tree).exists():
        subprocess.run(["git", "worktree", "add", tree, prev], cwd=repo, check=True)

    order = ["A", "B", "B", "A"]
    runs = {"A": [], "B": []}
    for i, side in enumerate(order):
        cwd = tree if side == "A" else str(repo)
        print(f"[ab] run {i + 1}/4 side={side} ({cwd})", flush=True)
        runs[side].append(run_bench(cwd, sf_dir))

    def mean(xs):
        return sum(xs) / len(xs)

    common = set(runs["A"][0]["queries"]) & set(runs["B"][0]["queries"])
    gates = {}
    for g in sorted(common):
        a = mean([r["queries"][g] for r in runs["A"]])
        b = mean([r["queries"][g] for r in runs["B"]])
        gates[g] = {"a": round(a, 3), "b": round(b, 3),
                    "b_minus_a": round(b - a, 3)}
    # totals over COMMON gates only (a new gate on B must not read as a regression)
    tot_a = [round(sum(r["queries"][g] for g in common), 2) for r in runs["A"]]
    tot_b = [round(sum(r["queries"][g] for g in common), 2) for r in runs["B"]]
    deltas = sorted(gates.items(), key=lambda kv: kv[1]["b_minus_a"])
    artifact = {
        "prev_commit": prev, "head_commit": head, "sf": sf_dir,
        "order": order, "common_gates": len(common),
        "totals_common": {"A": tot_a, "B": tot_b},
        "mean_total": {"A": round(mean(tot_a), 2), "B": round(mean(tot_b), 2),
                       "b_over_a": round(mean(tot_b) / mean(tot_a), 4)},
        "top_improvements": [
            {"gate": g, **v} for g, v in deltas if v["b_minus_a"] <= -0.15][:12],
        "top_regressions": [
            {"gate": g, **v} for g, v in reversed(deltas) if v["b_minus_a"] >= 0.15][:12],
        "gates": gates,
    }
    pathlib.Path(out_path).write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"[ab] wrote {out_path}: A={artifact['mean_total']['A']}s "
          f"B={artifact['mean_total']['B']}s "
          f"ratio={artifact['mean_total']['b_over_a']}")


if __name__ == "__main__":
    main()
