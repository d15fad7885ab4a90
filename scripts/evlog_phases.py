#!/usr/bin/env python
"""Map a Spark event log to the engine's crawl phases and aggregate task
metrics per phase.

The engine tags every job with its phase name via the thread-local
``spark.job.description`` (CrawlEngine._phase), so the event log carries an
exact job→phase map. This script turns that into per-phase:

- job wall (sum of JobStart→JobEnd; overlapped phases double-count wall by
  design — that is what the driver-side phase timers already show),
- task count + sum of executor run / CPU / JVM-GC / deserialize time,
- scheduler-side latency (task launch overhead = run-time-less task wall),
- shuffle read/write bytes + write time,
- input/output bytes.

Usage::

    python scripts/evlog_phases.py /tmp/evlog/lo/<app-id> [more logs...]

Prints one human table per log plus a JSON line for diffing two levels.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def _open_lines(fpath: str):
    if fpath.endswith(".zstd"):
        # rolling event logs compress parts with zstd; stream through the CLI
        # (no python zstd binding in this environment)
        import subprocess

        proc = subprocess.Popen(
            ["zstd", "-dc", fpath], stdout=subprocess.PIPE, text=True
        )
        assert proc.stdout is not None
        yield from proc.stdout
        proc.wait()
    else:
        with open(fpath) as fh:
            yield from fh


def _lines(path: str):
    import os

    if os.path.isdir(path):
        # eventlog_v2 rolling dir: events_<n>_<appid> parts, numeric order
        parts = sorted(
            (f for f in os.listdir(path) if f.startswith("events_")),
            key=lambda f: int(f.split("_")[1]),
        )
        for part in parts:
            yield from _open_lines(os.path.join(path, part))
    else:
        yield from _open_lines(path)


def analyze(path: str) -> dict:
    job_phase: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    job_start: dict[int, int] = {}
    phases: dict[str, dict] = defaultdict(
        lambda: defaultdict(float)
    )

    for line in _lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "(untagged)"
                )
                job_phase[jid] = desc
                job_start[jid] = ev["Submission Time"]
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                ph = job_phase.get(jid, "(untagged)")
                phases[ph]["job_wall_ms"] += ev["Completion Time"] - job_start.get(
                    jid, ev["Completion Time"]
                )
                phases[ph]["jobs"] += 1
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ph = job_phase.get(stage_job.get(sid, -1), "(untagged)")
                p = phases[ph]
                info = ev.get("Task Info", {})
                m = ev.get("Task Metrics") or {}
                p["tasks"] += 1
                task_wall = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                p["task_wall_ms"] += task_wall
                run = m.get("Executor Run Time", 0)
                p["run_ms"] += run
                p["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                p["gc_ms"] += m.get("JVM GC Time", 0)
                p["deser_ms"] += m.get("Executor Deserialize Time", 0)
                p["sched_ms"] += max(0, task_wall - run)
                srm = m.get("Shuffle Read Metrics", {})
                p["shuf_read_mb"] += (
                    srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                ) / 1e6
                p["shuf_fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                swm = m.get("Shuffle Write Metrics", {})
                p["shuf_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                p["shuf_write_ms"] += swm.get("Shuffle Write Time", 0) / 1e6
                p["input_mb"] += (m.get("Input Metrics", {}) or {}).get(
                    "Bytes Read", 0
                ) / 1e6
                p["output_mb"] += (m.get("Output Metrics", {}) or {}).get(
                    "Bytes Written", 0
                ) / 1e6

    return {ph: dict(v) for ph, v in phases.items()}


def main() -> None:
    for path in sys.argv[1:]:
        res = analyze(path)
        print(f"== {path}")
        cols = [
            "jobs", "job_wall_ms", "tasks", "task_wall_ms", "run_ms",
            "cpu_ms", "gc_ms", "deser_ms", "sched_ms", "shuf_read_mb",
            "shuf_write_mb", "shuf_write_ms", "input_mb", "output_mb",
        ]
        hdr = f"{'phase':<16}" + "".join(f"{c:>14}" for c in cols)
        print(hdr)
        for ph in sorted(res, key=lambda p: -res[p].get("job_wall_ms", 0)):
            row = res[ph]
            print(
                f"{ph:<16}"
                + "".join(f"{row.get(c, 0):>14.0f}" for c in cols)
            )
        print(json.dumps({"log": path, "phases": res}))


if __name__ == "__main__":
    main()
