#!/usr/bin/env python3
"""Cross-round bench regression guard.

Usage: python3 tools/bench_diff.py <new_bench.json> [prior_bench.json]

Diffs a fresh solo bench record against the prior committed one
(default: BENCH_SELF.json) and flags genuine per-query regressions so
a perf slip surfaces in the builder's review, not in the judge's diff.

"Genuine" is net of host drift: the new record carries a "sentinels"
object (measured/record ratios for queries whose code path is stable
across rounds — see Bench.scala); the median sentinel ratio is the
HOST FACTOR, and a query is flagged only when it exceeds
1.5x * max(1, host_factor) of its prior time AND is >0.4s absolutely
slower. A uniform shift that moves the sentinels too is the host, not
a plan change — the exact failure mode that once produced a 30-query
phantom regression list (BASELINE.md host-drift note).

Exit code: 1 if any query is flagged, else 0.
"""
import json
import statistics
import sys

RATIO = 1.5
ABS_FLOOR = 0.4  # seconds; below this a ratio is noise
HOST_SWING = 1.15


def load_bench(path):
    """Bench prints a full record plus a short summary line; files may
    hold either or both — take the first object carrying per-query data.
    """
    objs = [json.loads(l) for l in open(path) if l.strip()]
    for o in objs:
        if "queries" in o:
            return o
    sys.exit(f"bench_diff: no per-query record in {path}")


def main(new_path, old_path="BENCH_SELF.json"):
    new = load_bench(new_path)
    old = load_bench(old_path)
    nq, oq = new.get("queries", {}), old.get("queries", {})
    shared = sorted(set(nq) & set(oq))
    if not shared:
        print("bench_diff: no shared queries between records")
        return 1

    # host factor from the new record's sentinels (ratios vs the
    # COMMITTED record; only meaningful when old_path is that record,
    # which is the default). A faster host never tightens the threshold.
    sent = new.get("sentinels") or {}
    host = statistics.median(sent.values()) if sent else 1.0
    eff_ratio = RATIO * max(1.0, host)
    if sent:
        print("bench_diff: sentinels "
              + ", ".join(f"{k}={v:.2f}x" for k, v in sorted(sent.items()))
              + f" -> host factor {host:.2f}x, "
              f"flag threshold {eff_ratio:.2f}x")
    else:
        print("bench_diff: no sentinel field in new record "
              f"(flag threshold {eff_ratio:.2f}x, unadjusted)")

    flagged = []
    for name in shared:
        t_new, t_old = nq[name], oq[name]
        if t_new > t_old * eff_ratio and t_new - t_old > ABS_FLOOR:
            flagged.append((name, t_old, t_new))

    tot_old = sum(oq[n] for n in shared)
    tot_new = sum(nq[n] for n in shared)
    swing = tot_new / tot_old if tot_old else float("inf")
    print(f"bench_diff: {len(shared)} shared queries; "
          f"shared-total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({swing:.2f}x; host swing band {1/HOST_SWING:.2f}-{HOST_SWING:.2f}x)")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"bench_diff: {len(only_new)} new queries (not compared): "
              + ", ".join(only_new))

    if flagged:
        print(f"\nbench_diff: {len(flagged)} per-query regressions "
              f"(> {eff_ratio:.2f}x and > {ABS_FLOOR}s):")
        for name, t_old, t_new in sorted(
                flagged, key=lambda f: f[1] - f[2]):
            print(f"  {name}: {t_old:.2f}s -> {t_new:.2f}s "
                  f"({t_new / t_old:.2f}x)")
        print("\nIf deliberate (a correctness cost), document it in "
              "BASELINE.md next to the committed record.")
        return 1
    print("bench_diff: no per-query regressions")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    sys.exit(main(*sys.argv[1:3]))
