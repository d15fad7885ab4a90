"""Report-integrity guards (r7).

The r6 depth-sweep re-run silently deleted every BENCH/BASELINE.md section
after its own marker (truncate-at-marker + append). These tests pin:

1. the replacement helper touches ONLY its own section — unrelated
   sections before AND after the marker survive a re-render;
2. the shipped report actually contains the sections its prose references
   (the "Multi-JVM evidence" / "Cluster launch shape" sections the r6
   truncation ate, restored in r7).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from depth_bench import MARKER, replace_own_section  # noqa: E402


def test_replace_preserves_unrelated_sections():
    text = (
        "# Title\n\nintro\n\n## Before section\n\nkeep me\n\n"
        f"{MARKER}\n\nOLD depth content\nmore old\n\n"
        "## Multi-JVM evidence: separate executor processes\n\nkeep this\n\n"
        "## Cluster launch shape: spark-submit --py-files\n\nand this\n"
    )
    out = replace_own_section(text, [MARKER, "", "NEW depth content"])
    assert "OLD depth content" not in out
    assert "NEW depth content" in out
    assert "## Before section" in out and "keep me" in out
    assert "## Multi-JVM evidence: separate executor processes" in out
    assert "keep this" in out
    assert "## Cluster launch shape: spark-submit --py-files" in out
    assert "and this" in out
    # exactly one marker occurrence after the rewrite
    assert out.count(MARKER) == 1


def test_replace_when_section_is_last():
    text = f"# T\n\n## Keep\n\nx\n\n{MARKER}\n\nOLD\n"
    out = replace_own_section(text, [MARKER, "", "NEW"])
    assert "OLD" not in out and "NEW" in out and "## Keep" in out


def test_replace_appends_when_absent():
    text = "# T\n\n## Keep\n\nx\n"
    out = replace_own_section(text, [MARKER, "", "NEW"])
    assert "## Keep" in out and out.index("NEW") > out.index("## Keep")


def test_shipped_report_has_all_referenced_sections():
    md = (REPO / "BENCH" / "BASELINE.md").read_text()
    headings = {
        line[3:].strip() for line in md.splitlines() if line.startswith("## ")
    }
    for required in (
        "Multi-JVM evidence: separate executor processes",
        "Cluster launch shape: spark-submit --py-files",
        MARKER[3:],
    ):
        assert required in headings, f"missing section: {required}"
