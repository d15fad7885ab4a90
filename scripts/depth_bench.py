#!/usr/bin/env python
"""Round-loop amortization evidence (VERDICT r2 #8): crawl the synthetic web
at pagination depth ≫ rounds (lookahead) while sweeping pages-per-round, at
local[4] vs local[16], and show the LOOP's scaling efficiency converging
toward the data plane's as rounds get fatter.

Why this exists: the main scaling table (BENCH/BASELINE.md) reports the
round LOOP at toy load, where a fixed, core-count-invariant driver latency
per round (a handful of Spark actions) dominates wall time and the
efficiency reads low by construction. The claim that this is control-plane
amortization — wall ≈ data-plane time once rounds carry real load — was
argued, not measured. This script measures it: same depth (16 listing pages
per portal, lookahead 8 → ~5 rounds), cards per listing swept 32 → 512, so
pages per round grow ~16× while the round count stays fixed.

Each (level, cards) cell runs in a fresh JVM (scripts/depth_worker.py).
Appends a section to BENCH/BASELINE.md (replacing any previous one).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "scripts" / "depth_worker.py"
MARKER = "## Round-loop amortization at depth"

N_LO, N_HI = 4, 16
CARD_SWEEP = [32, 128, 512]
DEPTH = 16
LOOKAHEAD = 8
WEIGHT_KB = 48


def run_cell(cpus: int, cards: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, str(WORKER), "--cpus", str(cpus),
            "--cards", str(cards), "--pages", str(DEPTH),
            "--lookahead", str(LOOKAHEAD), "--weight-kb", str(WEIGHT_KB),
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    rows = []
    for cards in CARD_SWEEP:
        lo = run_cell(N_LO, cards)
        hi = run_cell(N_HI, cards)
        eff = hi["pages_per_sec"] / (4 * lo["pages_per_sec"])
        rows.append((cards, lo, hi, eff))
        print(json.dumps({"cards": cards, "lo": lo, "hi": hi,
                          "loop_efficiency": round(eff, 3)}))

    lines = [
        MARKER,
        "",
        f"Same crawl at pagination depth {DEPTH} per portal with lookahead "
        f"{LOOKAHEAD} (rounds ≈ depth/lookahead + ramp, measured below), "
        f"~{WEIGHT_KB} KB pages, sweeping cards per listing page so pages "
        "per round grow while the round count stays fixed. As rounds fatten, "
        "the fixed per-round driver latency amortizes and the LOOP's "
        "efficiency converges toward the data plane's (the table above) — "
        "measured, not argued (`scripts/depth_bench.py`, fresh JVM per "
        "cell):",
        "",
        "| cards/listing | pages crawled | rounds | pages/round | "
        f"local[{N_LO}] pages/s | local[{N_HI}] pages/s | loop efficiency |",
        "|---|---|---|---|---|---|---|",
    ]
    for cards, lo, hi, eff in rows:
        ppr = lo["crawl_pages"] / max(lo["rounds"], 1)
        lines.append(
            f"| {cards} | {lo['crawl_pages']:,} | {lo['rounds']} | "
            f"{ppr:,.0f} | {lo['pages_per_sec']:,.1f} | "
            f"{hi['pages_per_sec']:,.1f} | **{eff:.2f}** |"
        )
    lines += [
        "",
        "```json",
        *[json.dumps({"cards": c, "lo": lo, "hi": hi,
                      "loop_efficiency": round(e, 3)})
          for c, lo, hi, e in rows],
        "```",
        "",
    ]

    md_path = REPO / "BENCH" / "BASELINE.md"
    text = md_path.read_text()
    if MARKER in text:
        text = text[: text.index(MARKER)].rstrip() + "\n"
    md_path.write_text(text.rstrip() + "\n\n" + "\n".join(lines))
    print("appended to", md_path)


if __name__ == "__main__":
    main()
