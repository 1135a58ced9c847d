#!/usr/bin/env python3
"""Per-query profile from a Spark event log (guide §1 / §7).

Reads a rolling event-log dir (events_*.zstd) or a single file, groups
SparkListenerJobStart/JobEnd by spark.job.description, and prints per
description: job count, summed job wall ms, and (with --gaps) the dead
driver time between consecutive jobs of the same description — fs
round-trips, planning, commit protocol — which Spark jobs never see.

Usage: tools/evprof.py /tmp/graft_spark_events/eventlog_v2_local-*/ [--top N]
"""
import sys, json, glob, os, io


def open_log(path):
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        parts = [path]
    for p in parts:
        if p.endswith(".zstd"):
            try:
                import zstandard
                with open(p, "rb") as fh:
                    dctx = zstandard.ZstdDecompressor()
                    with dctx.stream_reader(fh) as r:
                        for line in io.TextIOWrapper(r, encoding="utf-8"):
                            yield line
            except ImportError:
                import subprocess
                out = subprocess.run(["zstd", "-dc", p], capture_output=True)
                for line in out.stdout.decode().splitlines():
                    yield line
        else:
            with open(p) as fh:
                yield from fh


def detail(path, want):
    """--detail <desc-substring>: per-job listing with inter-job gaps and
    the job's first stage name (what the job was doing)."""
    jobs = {}
    rows = []
    for line in open_log(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            desc = props.get("spark.job.description") or "(unlabeled)"
            stages = ev.get("Stage Infos") or []
            sname = stages[0].get("Stage Name", "?") if stages else "?"
            callsite = props.get("callSite.short", "")
            jobs[ev["Job ID"]] = (desc, ev["Submission Time"], sname, callsite)
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid not in jobs:
                continue
            desc, t0, sname, cs = jobs.pop(jid)
            if want in desc:
                rows.append((t0, ev["Completion Time"], sname, cs))
    rows.sort()
    prev = None
    for t0, t1, sname, cs in rows:
        gap = (t0 - prev) / 1e3 if prev is not None else 0.0
        prev = t1
        print(f"gap {gap:7.3f}s  job {(t1-t0)/1e3:7.3f}s  {cs[:40]:40s} {sname[:70]}")
    print(f"{len(rows)} jobs")


def main():
    if "--detail" in sys.argv:
        i = sys.argv.index("--detail")
        detail(sys.argv[1], sys.argv[i + 1])
        return
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    jobs = {}          # jobId -> (desc, submit_ms)
    agg = {}           # desc -> [njobs, job_ms, first_submit, last_end, gap_ms]
    for line in open_log(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            desc = props.get("spark.job.description") or "(unlabeled)"
            jobs[ev["Job ID"]] = (desc, ev["Submission Time"])
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid not in jobs:
                continue
            desc, t0 = jobs.pop(jid)
            t1 = ev["Completion Time"]
            a = agg.setdefault(desc, [0, 0.0, t0, t1, 0.0])
            if a[0] > 0:
                a[4] += max(0, t0 - a[3])   # driver gap since previous job end
            a[0] += 1
            a[1] += t1 - t0
            a[2] = min(a[2], t0)
            a[3] = max(a[3], t1)
    rows = []
    for desc, (n, jms, t0, t1, gap) in agg.items():
        span = t1 - t0
        rows.append((span, desc, n, jms, gap))
    rows.sort(reverse=True)
    print(f"{'span_s':>8} {'jobs':>5} {'job_s':>8} {'gap_s':>8}  description")
    for span, desc, n, jms, gap in rows[:top]:
        print(f"{span/1e3:8.2f} {n:5d} {jms/1e3:8.2f} {gap/1e3:8.2f}  {desc[:90]}")
    tot_jobs = sum(r[2] for r in rows)
    tot_jms = sum(r[3] for r in rows)
    print(f"\ntotal: {len(rows)} descriptions, {tot_jobs} jobs, "
          f"{tot_jms/1e3:.1f}s summed job time")


if __name__ == "__main__":
    main()
