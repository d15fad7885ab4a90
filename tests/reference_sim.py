"""Sequential reference-semantics simulator — the crawl-equivalence oracle.

Re-enacts, single-threaded, exactly what the reference's discover loop does
(documented semantics, independently implemented — NOT copied code):

- pages crawled strictly in pagination order per source, one source at a time
  (scrapper/pipelines/stream.py:144-157 is one `for` loop);
- cards yielded in DOM order within each page (otodom.py:592-614);
- relative hrefs resolved against the page URL with urljoin, exactly the
  reference's join_url (scrapper/core/http.py:113-114);
- every discovered offer URL is normalized and checked against the seen set
  *before* being yielded — duplicates are skipped, the crawl order of the
  survivors is preserved (dedupe-before-fetch, dedup.py:22-27, O1);
- stop conditions: end of pagination (no_links), `max_pages` (L2), and two
  consecutive pages yielding zero new offers (A5, morizon.py:703-709).

Uses the reference's own ``normalize_url`` (imported from the dependency-free
module scrapper/core/dedup.py) so the seen-set semantics are the reference's
by construction, not by reimplementation. The import is gated behind
``$SPARK_GRAFT_REFERENCE`` (default /root/reference): on machines without the
checkout the equivalence tests SKIP instead of erroring, and the untrusted
checkout is only executed when a reference comparison was explicitly asked
for (ADVICE r1).
"""

from __future__ import annotations

import os
import re
import sys

REFERENCE = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")


def load_reference_dedup():
    """(DedupeSet, normalize_url) from the reference checkout, or skip."""
    if not os.path.isdir(os.path.join(REFERENCE, "scrapper")):
        import pytest

        pytest.skip(
            "reference checkout not found; set SPARK_GRAFT_REFERENCE to "
            "enable the crawl-equivalence oracle"
        )
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from scrapper.core.dedup import DedupeSet, normalize_url

    return DedupeSet, normalize_url


_HREF_RE = re.compile(r'<a href="([^"]+)"')
_PAGE_PARAM_RE = re.compile(r"[?&](?:page|strona)=(\d+)")
_INVESTMENT_RE = re.compile(r"/pl/inwestycja/")


def simulate_reference_crawl(
    graph_rows: list[dict],
    seeds: list[tuple[str, str]],
    max_pages: int | None = None,
    no_new_stop: int = 2,
):
    """Returns (ordered yields, seen-set, per-source stop reasons).

    yields: list of dicts (source, url, url_canon, page_idx, slot) in the
    exact sequential order the reference would emit OfferIndex rows.
    """
    DedupeSet, normalize_url = load_reference_dedup()
    pages = {normalize_url(r["url"]): r for r in graph_rows}
    dedupe = DedupeSet()
    yields: list[dict] = []
    stop_reasons: dict[str, str] = {}

    for source, seed_url in seeds:
        current = seed_url
        streak = 0
        while True:
            row = pages.get(normalize_url(current))
            if row is None:
                stop_reasons[source] = "fetch_fail"
                break
            page_idx = row["page_idx"]
            if max_pages is not None and page_idx > max_pages:
                stop_reasons[source] = "max_pages"
                break
            from urllib.parse import urljoin

            # the reference absolutizes every href before classification
            # (join_url, core/http.py:113-114)
            links = [
                urljoin(row["url"], h) for h in _HREF_RE.findall(row["html"])
            ]
            if not links:
                # O9 fallback (morizon.py:672-679): primary template served
                # no links → one retry under the /nieruchomosci/ alternate
                # spelling before the auto-stop rules fire
                alt = row["url"].replace(
                    "https://www.morizon.pl/",
                    "https://www.morizon.pl/nieruchomosci/",
                    1,
                )
                alt_row = pages.get(normalize_url(alt)) if alt != row["url"] else None
                if alt_row is not None:
                    links = [
                        urljoin(alt_row["url"], h)
                        for h in _HREF_RE.findall(alt_row["html"])
                    ]
            next_listing = None
            new_count = 0
            for slot, href in enumerate(links):
                if _PAGE_PARAM_RE.search(href):
                    next_listing = href
                    continue
                if _INVESTMENT_RE.search(href):
                    # depth-first investment expansion at the card position
                    # (otodom.py:539-604): fetch the investment page NOW and
                    # yield its children in order
                    if dedupe.seen_url(href):
                        continue
                    inv = pages.get(normalize_url(href))
                    if inv is None:
                        continue
                    inv_links = [
                        urljoin(inv["url"], h)
                        for h in _HREF_RE.findall(inv["html"])
                    ]
                    for sub_slot, child in enumerate(inv_links):
                        if dedupe.seen_url(child):
                            continue
                        yields.append(
                            {
                                "source": source,
                                "url": child,
                                "url_canon": normalize_url(child),
                                "page_idx": page_idx,
                                "slot": slot,
                                "sub_slot": sub_slot,
                            }
                        )
                        new_count += 1
                    continue
                if dedupe.seen_url(href):
                    continue
                yields.append(
                    {
                        "source": source,
                        "url": href,
                        "url_canon": normalize_url(href),
                        "page_idx": page_idx,
                        "slot": slot,
                        "sub_slot": 0,
                    }
                )
                new_count += 1
            if new_count == 0:
                streak += 1
                if streak >= no_new_stop:
                    stop_reasons[source] = "no_new"
                    break
            else:
                streak = 0
            if next_listing is None:
                stop_reasons[source] = "no_links"
                break
            current = next_listing
    seen = set(dedupe._seen_urls)
    return yields, seen, stop_reasons
