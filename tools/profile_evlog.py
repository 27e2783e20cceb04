#!/usr/bin/env python3
"""Parse a Spark event log: per-job wall time, gaps between jobs
(driver-side work), and per-stage shuffle/input metrics.

Usage: profile_evlog.py <eventlog file> [--stages]
"""
import json, sys, collections

path = sys.argv[1]
show_stages = "--stages" in sys.argv


def open_evlog(p):
    """Rolling event logs are zstd-compressed; plain logs are text."""
    if p.endswith(".zstd"):
        import io, subprocess
        out = subprocess.run(["zstd", "-dc", p], capture_output=True).stdout
        return io.TextIOWrapper(io.BytesIO(out), errors="replace")
    return open(p, errors="replace")

jobs = {}          # id -> dict(start, end, desc)
stages = {}        # id -> dict(name, submit, complete, metrics)
app_start = app_end = None

for line in open_evlog(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    if not isinstance(e, dict):
        continue
    ev = e.get("Event")
    if ev == "SparkListenerApplicationStart":
        app_start = e["Timestamp"]
    elif ev == "SparkListenerApplicationEnd":
        app_end = e["Timestamp"]
    elif ev == "SparkListenerJobStart":
        jobs[e["Job ID"]] = {
            "start": e["Submission Time"],
            "desc": (e.get("Properties") or {}).get(
                "spark.job.description", "")[:90],
            "end": None,
        }
    elif ev == "SparkListenerJobEnd":
        j = jobs.get(e["Job ID"])
        if j: j["end"] = e["Completion Time"]
    elif ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        stages[si["Stage ID"]] = {
            "name": si["Stage Name"][:80],
            "submit": si.get("Submission Time"),
            "complete": si.get("Completion Time"),
            "tasks": si.get("Number of Tasks") or 0,
        }

done = sorted((j for j in jobs.values() if j["end"]),
              key=lambda j: j["start"])
total_job = sum(j["end"] - j["start"] for j in done)
print(f"jobs: {len(done)}  sum(job wall)={total_job/1000:.2f}s")
if app_start and done:
    span = (done[-1]["end"] - done[0]["start"]) / 1000
    print(f"first-job->last-job span: {span:.2f}s  "
          f"driver gaps: {span - total_job/1000:.2f}s")

# largest jobs
print("\n-- top jobs by duration --")
for j in sorted(done, key=lambda j: j["start"] - j["end"])[:25]:
    print(f"{(j['end']-j['start'])/1000:8.3f}s  {j['desc']}")

# largest gaps between consecutive jobs
print("\n-- top inter-job gaps (driver-side) --")
gaps = []
for a, b in zip(done, done[1:]):
    gaps.append((max(0, b["start"] - a["end"]), a["desc"], b["desc"]))
for g, da, db in sorted(gaps, reverse=True)[:25]:
    print(f"{g/1000:8.3f}s  after[{da[:40]}] before[{db[:40]}]")

if show_stages:
    print("\n-- top stages --")
    ss = [s for s in stages.values() if s["submit"] and s["complete"]]
    for s in sorted(ss, key=lambda s: s["submit"] - s["complete"])[:30]:
        print(f"{(s['complete']-s['submit'])/1000:8.3f}s "
              f"tasks={s['tasks']:4d}  {s['name']}")
