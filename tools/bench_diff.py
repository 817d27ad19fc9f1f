#!/usr/bin/env python3
"""Per-query bench diff between two committed bench JSON files.

Usage: python3 tools/bench_diff.py bench_results/bench_r8.json bench_results/bench_r9.json [threshold]

Prints queries whose time changed by more than `threshold` (default
1.5x in either direction, ignoring sub-100ms rows where scheduling
noise dominates), plus the totals. Since r14 each query row is an
object {"sec": wall, "cpu_sec": cpu, "run_sec": run}; when BOTH files
carry cpu_sec the diff compares CPU seconds (load-independent — the
r13 verdict #3 fix for ambient-load re-adjudication), otherwise it
falls back to wall seconds so older number-valued files still compare.
Exit code 0 always — this is a diagnostic, the correctness gate is
check_oracle.py.
"""
import json
import sys

def load(p):
    # Bench emits two JSON lines since r12 (per-query totals + a
    # summary line carrying medians/loadavg); pick the line that
    # actually has the per-query map.
    with open(p) as f:
        lines = [json.loads(l) for l in f.read().strip().splitlines()]
    for j in reversed(lines):
        if j.get("queries"):
            return j
    return lines[-1]

def wall(v):
    return v.get("sec") if isinstance(v, dict) else v

def cpu(v):
    return v.get("cpu_sec") if isinstance(v, dict) else None

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = set(qa) & set(qb)
    use_cpu = shared and all(
        cpu(qa[n]) is not None and cpu(qb[n]) is not None for n in shared)
    basis = "cpu_sec" if use_cpu else "sec (wall)"
    val = cpu if use_cpu else wall
    print(f"basis: {basis}")
    print(f"total: {a.get('core_total', a.get('value')):.1f}s "
          f"({len(qa)} queries) -> {b.get('core_total', b.get('value')):.1f}s "
          f"({len(qb)} queries)")
    if "queries_cpu_total" in a or "queries_cpu_total" in b:
        print(f"queries_cpu_total: {a.get('queries_cpu_total', float('nan')):.1f}s"
              f" -> {b.get('queries_cpu_total', float('nan')):.1f}s")
    for name in sorted(set(qa) | set(qb)):
        ta = val(qa[name]) if name in qa else None
        tb = val(qb[name]) if name in qb else None
        if ta is None and tb is None:
            continue
        if ta is None:
            print(f"  NEW     {name:<28} {tb:8.2f}s")
        elif tb is None:
            print(f"  REMOVED {name:<28} {ta:8.2f}s")
        elif max(ta, tb) >= 0.1 and (tb > ta * thr or ta > tb * thr):
            ratio = f"{tb / ta:5.2f}x" if ta > 0 else "  infx"
            print(f"  {'SLOWER' if tb > ta else 'FASTER':<7} {name:<28} "
                  f"{ta:8.2f}s -> {tb:8.2f}s ({ratio})")

if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass
