from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# The reference repo is importable ONLY for its dependency-free oracle modules
# (scrapper/core/dedup.py has no third-party imports); tests compare against it,
# the engine never imports it. Gated: without the checkout the comparison
# tests SKIP (ADVICE r1 — don't hard-require the untrusted path).
import os

REFERENCE = Path(os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference"))


@pytest.fixture(scope="session")
def spark():
    from realestate_scraper_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def reference_normalize_url():
    """The reference's normalize_url, imported as a test oracle (skips when
    the checkout is absent)."""
    if not (REFERENCE / "scrapper").is_dir():
        pytest.skip("reference checkout not found; set SPARK_GRAFT_REFERENCE")
    sys.path.insert(0, str(REFERENCE))
    from scrapper.core.dedup import normalize_url  # dependency-free module

    return normalize_url
