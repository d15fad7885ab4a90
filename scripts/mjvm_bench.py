#!/usr/bin/env python
"""Multi-JVM scaling evidence: the depth-bench crawl on local-cluster
executors (separate JVMs — own heaps, python workers, codegen caches;
shuffle + torrent broadcast cross process boundaries), scaling EXECUTOR
COUNT at fixed executor size, the way a real cluster grows.

Runs 1×4 vs 4×4 executors at a lean and a fat cell via
scripts/depth_worker.py --executors, and rewrites the "## Multi-JVM
evidence" section of BENCH/BASELINE.md (preserving everything else).

This is a shape check against the thread-mode tables (is the efficiency a
single-JVM artifact?), so it runs single trials; the min-of-N noise
protocol lives in scaling_bench/depth_bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "scripts" / "depth_worker.py"
MARKER = "## Multi-JVM evidence"

CORES_PER_EXECUTOR = 4
LEVELS = (1, 4)  # executor counts
CELLS = [(2048, 8), (8192, 8)]  # (cards, depth)


def run_cell(executors: int, cards: int, depth: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, str(WORKER),
            "--cpus", str(CORES_PER_EXECUTOR),
            "--executors", str(executors),
            "--cards", str(cards), "--pages", str(depth),
            "--lookahead", "8", "--weight-kb", "48",
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
        env=dict(os.environ, SPARK_DRIVER_MEM="8g"),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    rows = []
    for cards, depth in CELLS:
        lo = run_cell(LEVELS[0], cards, depth)
        hi = run_cell(LEVELS[1], cards, depth)
        eff = hi["pages_per_sec"] / lo["pages_per_sec"] / (LEVELS[1] / LEVELS[0])
        rows.append((cards, lo, hi, eff))
        print(json.dumps({"cards": cards, "lo": lo, "hi": hi,
                          "mjvm_loop_efficiency": round(eff, 3)}))

    lines = [
        MARKER + ": separate executor processes, same efficiency",
        "",
        "Every thread-mode number above runs local[N] — N task threads in ONE JVM,",
        "which a skeptic can discount (shared heap, no process boundary on shuffle",
        "or broadcast, one codegen cache). `depth_worker --executors N` re-runs the",
        f"same crawl on `local-cluster[N, {CORES_PER_EXECUTOR}, "
        f"{2048 * CORES_PER_EXECUTOR}m]`: N separate executor JVMs, each with its",
        "own heap, python worker pool and codegen cache; torrent broadcast (page",
        "store + per-round prefilter deltas) and every shuffle cross real process",
        "boundaries. Executor count — not thread count — is the scaled axis.",
        "Single trial per cell (shape check vs the thread-mode tables, not a new",
        "headline; whole-stage codegen compiles PER EXECUTOR JVM, so the r6",
        "`ref_lit` fix is what keeps executor-count scaling clean).",
        "",
        "| cell | 1 executor × 4 cores (pages/s) | 4 executors × 4 cores (pages/s) | speedup | loop efficiency |",
        "|---|---|---|---|---|",
    ]
    for cards, lo, hi, eff in rows:
        lines.append(
            f"| cards={cards} | {lo['pages_per_sec']:,.0f} | "
            f"{hi['pages_per_sec']:,.0f} | "
            f"{hi['pages_per_sec'] / lo['pages_per_sec']:.2f}× | **{eff:.2f}** |"
        )
    lines += ["", "```json"]
    for cards, lo, hi, eff in rows:
        for d in (lo, hi):
            lines.append(json.dumps(
                {k: d[k] for k in ("cpus", "executors", "cards", "depth",
                                   "crawl_sec", "crawl_pages", "pages_per_sec")}
            ))
    lines += ["```", ""]
    section = "\n".join(lines)

    path = REPO / "BENCH" / "BASELINE.md"
    text = path.read_text()
    if MARKER in text:
        head, _, rest = text.partition(MARKER)
        # the old section runs to the next "## " heading or EOF
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1:] if nxt != -1 else ""
        text = head + section + tail
    else:
        text = text.rstrip() + "\n\n" + section
    path.write_text(text)


if __name__ == "__main__":
    main()
