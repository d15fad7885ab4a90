"""Deterministic synthetic corpus — images, offers, photos, site graph.

Replaces the live portals with a seeded, fully reproducible web
(FIXTURES.md §§1-5). The mock fetcher serves HTML rendered from these rows —
the same hermetic-testing pattern as the reference's golden-HTML fixtures
(scrapper/tests/test_otodom_selectors.py:12-45), generated at scale.

Everything is a pure function of (seed, n_pages, cards_per_page); no wall
clock, no RNG outside numpy's seeded generators, no network, no external data.

URL shapes follow the reference's offer-id regexes so F5 extraction is
exercised verbatim:
  otodom     …/pl/oferta/{slug}-ID{id}         (otodom.py:27)
  morizon    …/oferta/{slug}-mzn{7d}           (morizon.py:71-73)
  gratka     …/nieruchomosci/{slug}/ob/{d}     (gratka.py:846-848)
  trojmiasto …/nieruchomosci/{slug}-ogl{6d}.html (trojmiasto.py:59-61)

Adversarial rows (deterministic by offer ordinal):
  - ord %% 17 == 3  → "Zapytaj o cenę" price (hard-null, morizon.py:537-541)
  - ord %% 13 == 5  → missing geo (rejected by completeness gate P2)
  - ord %% 11 == 7  → displayed ppm2 disagrees with price/area by >8%
                      (area back-solve F18, morizon.py:581-593)
  - ord %% 29 == 19 → area missing from the page entirely; with price +
                      displayed ppm2 present the engine must back-solve
                      area = price/ppm2 (the `(ar is None)` branch of
                      morizon.py:591-593), NOT quarantine as incomplete
  - ord %% 41 == 12 → NO price on the page but displayed ppm2 + area present;
                      the engine must derive price = round(ppm2 × area)
                      (F19, otodom.py:158-165), NOT quarantine as no_price
  - every 3rd listing-card href is PATH-RELATIVE (no scheme/host); the link
                      classifier must absolutize against the parent URL
                      (F4, core/http.py:113-114 urljoin) before canonicalizing
  - ord %% 43 == 31 → year_built=1650, outside pydantic's [1800, now+1]
                      range (validate.py:28) → the WHOLE offer is rejected
                      (detail.py:92 Offer(**data) raises → quarantine)
  - ord %% 47 == 9 (css variant) → no geo meta; coordinates only as
                      hydrated map bounds whose CENTRE is the point (F16,
                      morizon.py:115-138)
  - ord %% 19 == 11 → coords outside the PL bbox (P5 → treated as no-geo)
  - ord %%  7 == 2  → URL re-listed on a later page with shuffled query params
                      (F1 canonicalization + O1 dedupe-before-fetch)
  - otodom ord %% 10 == 4 → investment card expanding to 3 sub-offers,
                      depth-first at the card position (SO2, otodom.py:539-604)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from realestate_scraper_spark.functions.images import (
    decode_image,
    encode_image,
    phash64,
)

SOURCES = ("otodom", "morizon", "gratka", "trojmiasto")


def _round2_half_up(x: float) -> float:
    """Spark's ROUND(x, 2) on doubles: BigDecimal(double) + HALF_UP — match
    it exactly (Python's round() is half-even and diverges at .xx5)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))

DOMAINS = {
    "otodom": "www.otodom.pl",
    "morizon": "www.morizon.pl",
    "gratka": "gratka.pl",
    "trojmiasto": "ogloszenia.trojmiasto.pl",
}

CITIES = [
    ("Gdansk", 54.35, 18.65),
    ("Warszawa", 52.23, 21.01),
    ("Krakow", 50.06, 19.94),
    ("Wroclaw", 51.11, 17.03),
    ("Poznan", 52.41, 16.93),
    ("Gdynia", 54.52, 18.53),
    ("Sopot", 54.44, 18.56),
    ("Lodz", 51.76, 19.46),
]

KINDS = ["mieszkanie", "dom", "kawalerka"]

# validate.py:35,47-50 — the reference's one array-typed field; entries carry
# deliberate whitespace padding + empties so the trim/drop validator (F28)
# is exercised, not just carried through.
FEATURE_POOL = ["balkon", "piwnica", "garaż", "winda", "ogródek", "klimatyzacja"]

# Per-domain politeness budget for the token-bucket tests (FIXTURES.md §2).
CRAWL_DELAY_MS = {"otodom": 50, "morizon": 80, "gratka": 80, "trojmiasto": 100}

IMG_SIZES = [(32, 32), (64, 48), (96, 64), (128, 96), (160, 120), (256, 192)]
FMTS = ["jpeg", "png", "webp"]


@dataclass
class SynthOffer:
    ordinal: int
    source: str
    offer_id: str
    url: str
    page_idx: int
    slot: int
    sub_slot: int
    variant: str  # ldjson | nextdata | css
    kind: str
    city: str
    rooms: int
    area_m2: float
    price_amount: float | None
    displayed_ppm2: float | None  # what the page shows (may disagree)
    lat: float | None
    lon: float | None
    inquiry_price: bool
    missing_geo: bool
    out_of_bbox: bool
    ppm2_disagrees: bool
    missing_area: bool = False
    # F19 adversary (otodom.py:158-165): the page shows ppm2 + area but NO
    # price — the engine must derive price = round(ppm2 × area), not
    # quarantine as no_price.
    price_missing: bool = False
    # J8 snap adversary (morizon.py:472-487 _snap_geo_if_far): the page
    # renders WRONG-but-in-bbox geo (~2.5 km off); the OSM streetwise memo
    # (geocode_dim_rows) carries the true point, so an engine given the dim
    # must OVERRIDE the page geo (>800 m rule); without the dim the page
    # value stands (the reference with use_osm_geocode=False).
    geo_snap_wrong: bool = False
    photo_image_ids: list[str] = field(default_factory=list)
    photo_urls: list[str] = field(default_factory=list)
    investment_lead: int | None = None  # lead ordinal of the investment group

    def rendered_geo(self) -> tuple[float | None, float | None]:
        """The (lat, lon) the PAGE shows — the snap adversary renders a
        wrong-but-in-bbox point while keeping ``self.lat/lon`` as the truth
        the OSM dim would return."""
        if self.missing_geo:
            return None, None
        if self.geo_snap_wrong:
            return round(self.lat + 0.02, 6), round(self.lon - 0.015, 6)
        return self.lat, self.lon

    # -- expected engine output (golden), applying reference reconciliation --
    def golden_row(self, osm_snap: bool = False) -> dict | None:
        """Expected offers-table row, or None if the completeness gate (P2)
        must reject this offer (missing/out-of-bbox geo or null price).

        ``osm_snap=True`` models an engine run WITH the OSM streetwise dim:
        snap-adversary rows come back with the dim's true point instead of
        the page's wrong one (morizon.py:472-487).

        Mirrors the reference's reconciliation ORDER (morizon.py:572-593,
        gratka.py:916-933): (1) fill ppm2 from price/RAW area only when the
        page showed none; (2) back-solve area when missing OR >8% off; the
        displayed ppm2 is kept, never recomputed from the corrected area."""
        lat, lon = self.rendered_geo()
        if self.missing_geo or self.out_of_bbox:
            lat = lon = None
        if osm_snap and self.geo_snap_wrong:
            lat, lon = self.lat, self.lon
        price = (
            None
            if (self.inquiry_price or self.price_missing)
            else self.price_amount
        )
        area = None if self.missing_area else self.area_m2
        ppm2 = None if self.inquiry_price else self.displayed_ppm2
        if price is None and ppm2 and area:
            # F19 (otodom.py:158-165): price := float(int(round(ppm2*area)))
            # — Python round() is half-even, matched by Spark's rint()
            price = float(int(round(ppm2 * area)))
        if ppm2 is None and price and area:
            ppm2 = _round2_half_up(price / area)
        if price and ppm2 and ppm2 > 0:
            ar_calc = price / ppm2
            if area is None or abs(area - ar_calc) / ar_calc > 0.08:
                # F18 back-solve incl. the missing-area branch
                area = _round2_half_up(ar_calc)
        if not self.year_built_valid():
            # pydantic range violation rejects the WHOLE offer
            # (detail.py:92 Offer(**data) raises → quarantine)
            return None
        if price is None or lat is None or lon is None:
            return None  # P2 completeness gate (detail.py:21,30-31)
        return {
            "offer_id": self.offer_id,
            "source": self.source,
            "url": self.url,
            "price_amount": float(price),
            "price_currency": "PLN",
            "price_per_m2": ppm2,
            "city": self.city,
            "lat": lat,
            "lon": lon,
            "area_m2": float(area),
            "rooms": int(self.rooms),
        }

    # ---------------- validated-model fields (validate.py:25-40) ----------
    def year_built(self) -> int | None:
        if self.ordinal % 43 == 31:
            return 1650  # adversarial: outside [1800, now+1] → offer rejected
        return 1950 + self.ordinal % 70

    def year_built_valid(self) -> bool:
        yb = self.year_built()
        return yb is None or 1800 <= yb <= 2100

    def posted_at_iso(self) -> str:
        """Deterministic timestamp `2024-01-01 + ord%360 days, ord%24 h`."""
        import datetime as _dt

        d = _dt.datetime(2024, 1, 1) + _dt.timedelta(
            days=self.ordinal % 360, hours=self.ordinal % 24
        )
        return d.strftime("%Y-%m-%d %H:%M:%S")

    def updated_at_iso(self) -> str:
        import datetime as _dt

        d = _dt.datetime.strptime(
            self.posted_at_iso(), "%Y-%m-%d %H:%M:%S"
        ) + _dt.timedelta(days=self.ordinal % 5)
        return d.strftime("%Y-%m-%d %H:%M:%S")

    def features_raw(self) -> list[str]:
        """As rendered on the page: padded + empty entries (F28 adversary)."""
        picked = [
            f" {FEATURE_POOL[i]} " if i % 2 == 0 else FEATURE_POOL[i]
            for i in range(len(FEATURE_POOL))
            if (self.ordinal >> i) & 1
        ]
        return picked + ["", "  "]

    def features_golden(self) -> list[str]:
        """After the validator's strip + drop-empty (validate.py:47-50)."""
        return [s.strip() for s in self.features_raw() if s and s.strip()]

    # ------------------------- wide storage fields (storage.py:13-20) ----
    def title(self) -> str:
        return f"{self.kind} {self.city} {self.area_m2}m2"

    def district(self) -> str:
        return f"Dzielnica{self.ordinal % 7}"

    def street(self) -> str:
        # snap adversaries get a street UNIQUE per ordinal so the OSM memo
        # keyed (city, street) never collides with an honest offer's key
        # (a collision would snap the honest offer to a foreign point)
        if self.geo_snap_wrong:
            return f"ul. Osobliwa {self.ordinal}"
        return f"ul. Testowa {self.ordinal % 50}"

    def floor(self) -> int:
        return self.ordinal % 10

    def floors(self) -> int:
        return self.floor() + 1 + self.ordinal % 5

    def market_type(self) -> str:
        return "primary" if self.ordinal % 2 == 0 else "secondary"

    def property_type(self) -> str:
        return self.kind

    def caption(self) -> str:
        # FIXTURES.md §1 template
        return f"{self.kind} {self.rooms}-pokoje {self.area_m2}m2 {self.city}"


def _slug(kind: str, city: str, ordinal: int) -> str:
    return f"{kind}-{city.lower()}-{ordinal}"


def _offer_url(source: str, slug: str, ordinal: int) -> str:
    d = DOMAINS[source]
    if source == "otodom":
        return f"https://{d}/pl/oferta/{slug}-ID4{ordinal:05d}"
    if source == "morizon":
        return f"https://{d}/oferta/{slug}-mzn{1000000 + ordinal}"
    if source == "gratka":
        return f"https://{d}/nieruchomosci/{slug}/ob/{20000000 + ordinal}"
    return f"https://{d}/nieruchomosci/{slug}-ogl{100000 + ordinal}.html"


def _offer_id(source: str, ordinal: int) -> str:
    if source == "otodom":
        return f"4{ordinal:05d}"
    if source == "morizon":
        return f"mzn{1000000 + ordinal}"
    if source == "gratka":
        return str(20000000 + ordinal)
    return f"ogl{100000 + ordinal}"


def investment_url(ordinal: int) -> str:
    """Otodom investment (multi-unit development) page — expanded depth-first
    at its card position (SO2, otodom.py:539-604). Only otodom has these."""
    return f"https://{DOMAINS['otodom']}/pl/inwestycja/osiedle-{ordinal}-IN{ordinal:05d}"


def listing_url(source: str, page: int) -> str:
    d = DOMAINS[source]
    if source == "otodom":
        return f"https://{d}/pl/wyniki/sprzedaz/mieszkanie/pomorskie?page={page}"
    if source == "morizon":
        return f"https://{d}/mieszkania/pomorskie/?page={page}"
    if source == "gratka":
        return f"https://{d}/nieruchomosci/mieszkania/pomorskie?page={page}"
    return f"https://{d}/nieruchomosci/s,mieszkania.html?strona={page}"


def make_offers(
    seed: int = 42, n_pages: int = 6, cards_per_page: int = 8
) -> list[SynthOffer]:
    rng = np.random.default_rng(seed)
    offers: list[SynthOffer] = []
    ordinal = 0
    for source in SOURCES:
        for page in range(1, n_pages + 1):
            slot = 0
            for _card in range(cards_per_page):
                is_investment = source == "otodom" and ordinal % 10 == 4
                n_subs = 3 if is_investment else 1
                lead_ordinal = ordinal
                for sub in range(n_subs):
                    city, clat, clon = CITIES[int(rng.integers(len(CITIES)))]
                    kind = KINDS[ordinal % len(KINDS)]
                    rooms = int(rng.integers(1, 6))
                    area = float(np.round(rng.uniform(18, 140), 1))
                    price = float(np.round(rng.uniform(200_000, 1_900_000), -3))
                    true_ppm2 = round(price / area, 2)
                    disagrees = ordinal % 11 == 7
                    displayed_ppm2 = (
                        round(true_ppm2 * 1.25, 2) if disagrees else true_ppm2
                    )
                    out_bbox = ordinal % 19 == 11
                    lat = float(np.round(clat + rng.uniform(-0.05, 0.05), 6))
                    lon = float(np.round(clon + rng.uniform(-0.05, 0.05), 6))
                    if out_bbox:
                        lat, lon = 61.2, 7.1  # Norway — outside PL bbox
                    slug = _slug(kind, city, ordinal)
                    o = SynthOffer(
                        ordinal=ordinal,
                        source=source,
                        offer_id=_offer_id(source, ordinal),
                        url=_offer_url(source, slug, ordinal),
                        page_idx=page,
                        slot=slot,
                        sub_slot=sub if is_investment else 0,
                        variant=["ldjson", "nextdata", "css"][ordinal % 3],
                        kind=kind,
                        city=city,
                        rooms=rooms,
                        area_m2=area,
                        price_amount=price,
                        displayed_ppm2=displayed_ppm2,
                        lat=lat,
                        lon=lon,
                        inquiry_price=ordinal % 17 == 3,
                        missing_geo=ordinal % 13 == 5,
                        out_of_bbox=out_bbox,
                        ppm2_disagrees=disagrees,
                        missing_area=ordinal % 29 == 19,
                        price_missing=ordinal % 41 == 12,
                        # morizon-only, like the reference's snap; keep it
                        # off the missing/out-of-bbox/no-address rows so
                        # each adversary isolates one semantic (%31==17 css
                        # pages omit the address block — no city+street, so
                        # the reference would never geocode them)
                        geo_snap_wrong=(
                            source == "morizon"
                            and ordinal % 23 == 16
                            and ordinal % 13 != 5
                            and ordinal % 19 != 11
                            and ordinal % 31 != 17
                        ),
                        investment_lead=lead_ordinal if is_investment else None,
                    )
                    n_photos = ordinal % 5
                    for k in range(n_photos):
                        img_id = f"img{ordinal:06d}_{k}"
                        o.photo_image_ids.append(img_id)
                        # image_id embedded in the URL so the engine links
                        # photos→images relationally (regexp_extract, F5).
                        o.photo_urls.append(
                            f"https://img.{DOMAINS[source]}/{o.offer_id}/{img_id}.jpg"
                        )
                    offers.append(o)
                    ordinal += 1
                slot += 1
    return offers


# ------------------------------------------------------------------ images
def image_blob(seed: int, ordinal: int, k: int) -> tuple[bytes, int, int, str]:
    """Deterministic encoded image for photo ``k`` of offer ``ordinal`` —
    (bytes, w, h, fmt). Pure function of the key, so the corpus can be
    synthesized EXECUTOR-SIDE (mapInPandas over tiny spec rows) as well as
    driver-side; both paths are bit-identical."""
    rng = np.random.default_rng((seed, ordinal, k))
    w, h = IMG_SIZES[int(rng.integers(len(IMG_SIZES)))]
    fmt = FMTS[(ordinal + k) % len(FMTS)]
    # gradient + seeded noise — stable, structured content
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1) + yy * 128 // max(h - 1, 1)) % 256
    rgb = np.stack(
        [
            (base + rng.integers(0, 32, (h, w))) % 256,
            (base // 2 + rng.integers(0, 32, (h, w))) % 256,
            (255 - base + rng.integers(0, 32, (h, w))) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    return encode_image(rgb, fmt), int(w), int(h), fmt


def make_image_rows(offers: list[SynthOffer], seed: int = 42) -> list[dict]:
    """The authoritative `images` table (BASELINE.json input_hint shape)."""
    rows = []
    for o in offers:
        for k, img_id in enumerate(o.photo_image_ids):
            data, w, h, fmt = image_blob(seed, o.ordinal, k)
            # phash of the *stored* bytes (post-codec pixels), so the decode
            # UDF's recompute is bit-equal to this oracle value.
            rows.append(
                {
                    "image_id": img_id,
                    "bytes": bytearray(data),
                    "w": w,
                    "h": h,
                    "fmt": fmt,
                    "caption": o.caption(),
                    "phash": phash64(decode_image(data, fmt)),
                }
            )
    return rows


SYNTH_IMAGE_FIELDS = "image_id string, bytes binary"


def synth_image_batches(batches):
    """Executor-side corpus synthesis: spec rows (image_id, seed, ordinal, k)
    → (image_id, bytes) inside the Arrow batch. The driver ships only the
    KB-scale spec table into tasks, never the blobs — kills the
    'task of very large size' staging WARN at any corpus size."""
    import pandas as pd

    for pdf in batches:
        out = {"image_id": [], "bytes": []}
        for image_id, seed, ordinal, k in zip(
            pdf["image_id"], pdf["seed"], pdf["ordinal"], pdf["k"]
        ):
            data, _w, _h, _fmt = image_blob(int(seed), int(ordinal), int(k))
            out["image_id"].append(image_id)
            out["bytes"].append(data)
        yield pd.DataFrame(out)


def image_spec_rows(offers: list[SynthOffer], seed: int = 42) -> list[tuple]:
    """(image_id, seed, ordinal, k) spec rows for synth_image_batches."""
    return [
        (img_id, seed, o.ordinal, k)
        for o in offers
        for k, img_id in enumerate(o.photo_image_ids)
    ]


# -------------------------------------------------------------------- HTML
def _fmt_price_pl(price: float) -> str:
    """`1 234 567 zł` with NBSP thousands separators (F9 adversary)."""
    s = f"{int(price):,}".replace(",", " ")
    return f"{s} zł"


def _fmt_pl_dt(iso: str, seconds: bool = False) -> str:
    """ISO `YYYY-mm-dd HH:MM:SS` → Polish `dd.mm.YYYY HH:MM[:SS]` (F12,
    gratka.py:43-74 date shapes)."""
    import datetime as _dt

    d = _dt.datetime.strptime(iso, "%Y-%m-%d %H:%M:%S")
    return d.strftime("%d.%m.%Y %H:%M:%S" if seconds else "%d.%m.%Y %H:%M")


def render_offer_html(o: SynthOffer) -> str:
    lat, lon = o.rendered_geo()
    # price_missing pages show NO price element at all but keep the displayed
    # ppm2 + area (F19 adversary); inquiry pages show the inquiry text and
    # hide ppm2 too (morizon.py:537-541)
    price_val = (
        None if (o.inquiry_price or o.price_missing) else o.price_amount
    )
    if o.inquiry_price:
        price_txt = "Zapytaj o cenę"
    elif o.price_missing:
        price_txt = ""
    else:
        price_txt = _fmt_price_pl(o.price_amount)
    imgs = o.photo_urls
    if o.variant == "ldjson":
        ld = {
            "@type": "Offer",
            "name": o.title(),
            "price": price_val,
            "priceCurrency": "PLN",
            "geo": None if lat is None else {"latitude": lat, "longitude": lon},
            "address": {"addressLocality": o.city},
            "floorSize": None if o.missing_area else {"value": o.area_m2},
            "numberOfRooms": o.rooms,
            "pricePerM2": o.displayed_ppm2 if not o.inquiry_price else None,
            "image": imgs,
            "district": o.district(),
            "street": o.street(),
            "floor": o.floor(),
            "floors": o.floors(),
            "marketType": o.market_type(),
            "propertyType": o.property_type(),
            # F11 ISO-T format; F28 features with padding/empties as-is
            "datePosted": o.posted_at_iso().replace(" ", "T"),
            "dateUpdated": o.updated_at_iso().replace(" ", "T"),
            "yearBuilt": o.year_built(),
            "features": o.features_raw(),
        }
        body = (
            f'<script type="application/ld+json">{json.dumps(ld)}</script>'
            f'<h1>{o.kind} {o.city}</h1>'
        )
    elif o.variant == "nextdata":
        nd = {
            "props": {
                "pageProps": {
                    "ad": {
                        "target": {
                            "Price": price_val,
                            "Price_per_m": o.displayed_ppm2
                            if not o.inquiry_price
                            else None,
                            "Area": None if o.missing_area else o.area_m2,
                            "Rooms_num": o.rooms,
                            "City": o.city,
                            "Title": o.title(),
                            "District": o.district(),
                            "Street": o.street(),
                            "Floor_no": o.floor(),
                            "Building_floors_num": o.floors(),
                            "MarketType": o.market_type(),
                            "ProperType": o.property_type(),
                            # F12 Polish dd.mm.yyyy HH:MM format
                            "DatePosted": _fmt_pl_dt(o.posted_at_iso()),
                            "DateUpdated": _fmt_pl_dt(o.updated_at_iso()),
                            "Build_year": o.year_built(),
                            "Features": o.features_raw(),
                        },
                        "location": (
                            None
                            if lat is None
                            else {"coordinates": {"latitude": lat, "longitude": lon}}
                        ),
                        "images": [{"large": u} for u in imgs],
                    }
                }
            }
        }
        body = (
            f'<script id="__NEXT_DATA__" type="application/json">'
            f"{json.dumps(nd)}</script>"
        )
    else:  # css fallback — regex-extractable markup with srcset photos
        # ord%31==17 pages omit the address block: city is recoverable only
        # from the URL slug (F8, morizon.py:245-286 token fallback)
        photo_tags = "".join(
            f'<img srcset="{u}?w=400 400w, {u}?w=800 800w, {u}?w=1200 1200w">'
            for u in imgs
        )
        if lat is None:
            geo_meta = ""
        elif o.ordinal % 47 == 9:
            # F16 adversary: NO geo meta — coordinates recoverable only as
            # the centre of hydrated map bounds (morizon.py:26-30,115-138)
            geo_meta = (
                f'<script>{{"latitude":17,"longitude":18}}, '
                f"{lat + 0.01:.6f}, {lon - 0.01:.6f}, "
                f'{{"latitude":19,"longitude":20}}, '
                f"{lat - 0.01:.6f}, {lon + 0.01:.6f}</script>"
            )
        else:
            geo_meta = f'<meta name="geo" content="{lat};{lon}">'
        ppm2_txt = (
            ""
            if o.inquiry_price
            else f'<span class="ppm2">{o.displayed_ppm2:.2f} zł/m²</span>'
        )
        area_txt = f"{o.area_m2:.1f}".replace(".", ",")
        if o.missing_area:
            # the `(ar is None)` F18 branch: no structured area span AND no
            # free-text m² candidates — area must come from price/ppm2
            area_span = ""
        elif o.ordinal % 37 == 23:
            # W5 (morizon.py:299-309): area appears only in free text among
            # other m² figures; the parser must pick the largest PLAUSIBLE
            # candidate (10..1000 m²) — the 1200 m² lot is out of window,
            # the 8 m² cellar is smaller.
            area_span = (
                f"<p>piwnica 8 m², mieszkanie {area_txt} m², "
                f"działka 1200 m²</p>"
            )
        else:
            area_span = f'<span class="area">{area_txt} m²</span>'
        address = (
            "" if o.ordinal % 31 == 17 else f'<div class="address">{o.city}</div>'
        )
        feats = "".join(
            f'<li class="feature">{f}</li>' for f in o.features_raw()
        )
        wide = (
            f'<h1 class="title">{o.title()}</h1>'
            f'<span class="district">{o.district()}</span>'
            f'<span class="street">{o.street()}</span>'
            f'<span class="floor">{o.floor()}/{o.floors()}</span>'
            f'<span class="market">{o.market_type()}</span>'
            f'<span class="ptype">{o.property_type()}</span>'
            f'<span class="posted">{_fmt_pl_dt(o.posted_at_iso(), seconds=True)}</span>'
            f'<span class="updated">{_fmt_pl_dt(o.updated_at_iso(), seconds=True)}</span>'
            f'<span class="year">{o.year_built()}</span>'
            f'<ul class="features">{feats}</ul>'
        )
        body = (
            f'<strong class="price">{price_txt}</strong>'
            f'{ppm2_txt}'
            f'{area_span}'
            f'<span class="rooms">{o.rooms} pokoje</span>'
            f'{address}'
            f"{wide}{geo_meta}{photo_tags}"
        )
    return f"<html><head><title>{o.offer_id}</title></head><body>{body}</body></html>"


def _relist_variant(url: str) -> str:
    """Re-listed URL spelled differently but canonical-equal (F1 test):
    trailing slash + fragment — both erased by normalize_url semantics
    (scrapper/core/dedup.py:7-14), so O1 dedupe must drop it pre-fetch."""
    return f"{url}/#relist"


def _maybe_relative(i: int, u: str) -> str:
    """Every 3rd card href is rendered PATH-RELATIVE (F4 adversary): real
    portals mix absolute and relative hrefs; the reference absolutizes with
    urljoin (core/http.py:113-114). child_urls stay absolute — only the HTML
    differs, so the engine's absolutize+canonicalize must land on the same
    canonical URL the reference-sim derives from child_urls."""
    if i % 3 != 2:
        return u
    from urllib.parse import urlsplit

    p = urlsplit(u)
    rel = p.path or "/"
    if p.query:
        rel += f"?{p.query}"
    if p.fragment:
        rel += f"#{p.fragment}"
    return rel


def render_listing_html(source: str, page: int, card_urls: list[str]) -> str:
    cards = "".join(
        f'<article data-cy="listing-item"><a href="{_maybe_relative(i, u)}">oferta</a></article>'
        for i, u in enumerate(card_urls)
    )
    return f"<html><body><div class='listing' data-page='{page}'>{cards}</div></body></html>"


# -------------------------------------------------------------- site graph
def alt_listing_url(url: str) -> str:
    """Morizon's alternate listing spelling (morizon.py:631-635): the
    ``/nieruchomosci/``-prefixed path serving the same results."""
    return url.replace(
        "https://www.morizon.pl/", "https://www.morizon.pl/nieruchomosci/", 1
    )


def make_site_graph(
    offers: list[SynthOffer],
    n_pages: int,
    flaky_mod: int | None = None,
    retry_after_mod: int | None = None,
    page_weight_kb: int = 0,
    alt_listing_mod: int | None = None,
) -> list[dict]:
    """Listing + offer pages; child_urls in DOM order = reference crawl order.
    Each domain also serves /robots.txt (engine bootstraps its rules table
    from these pages — crawl/engine.py seed()).

    ``page_weight_kb`` > 0 pads every offer page to a representative real
    page size (portals ship 100-500 KB of markup, the synth bodies are ~3 KB)
    — the filler is generated EXECUTOR-side by the fetch stage from this
    number, so the driver-held page store stays small. Benign letters-only
    text: no digits, no m², no hrefs — it cannot perturb any parser regex,
    it only makes the scan cost realistic. Used by the scaling bench."""
    rows: list[dict] = []
    robots_texts = make_robots_txt(offers)
    for source in SOURCES:
        domain = DOMAINS[source]
        rows.append(
            {
                "url": f"https://{domain}/robots.txt",
                "kind": "robots",
                "source": source,
                "page_idx": 0,
                "child_urls": [],
                "html": robots_texts[domain],
                "crawl_delay_ms": CRAWL_DELAY_MS[source],
                "robots_allow": True,
            }
        )
    by_key: dict[tuple[str, int], list[SynthOffer]] = {}
    for o in offers:
        by_key.setdefault((o.source, o.page_idx), []).append(o)

    for source in SOURCES:
        for page in range(1, n_pages + 1):
            page_offers = sorted(
                by_key.get((source, page), []), key=lambda o: (o.slot, o.sub_slot)
            )
            child: list[str] = []
            seen_inv: set[int] = set()
            for o in page_offers:
                if o.investment_lead is not None:
                    # one card per investment group → the investment page
                    if o.investment_lead not in seen_inv:
                        seen_inv.add(o.investment_lead)
                        child.append(investment_url(o.investment_lead))
                else:
                    child.append(o.url)
            # ord%7==2 offers get re-listed on the NEXT page with shuffled
            # query params — must canonicalize+dedupe, never refetch (O1).
            if page > 1:
                prev = sorted(
                    by_key.get((source, page - 1), []),
                    key=lambda o: (o.slot, o.sub_slot),
                )
                child.extend(
                    _relist_variant(o.url) for o in prev if o.ordinal % 7 == 2
                )
            if page < n_pages:
                child.append(listing_url(source, page + 1))
            # O9 variant (morizon.py:672-679): every alt_listing_mod-th
            # morizon page serves an EMPTY shell under the primary template
            # — the real cards exist only under the /nieruchomosci/ alt
            # spelling, so a crawler without the fallback stops with
            # no_new/no_links mid-pagination.
            alt_served = (
                alt_listing_mod is not None
                and source == "morizon"
                and page % alt_listing_mod == 0
            )
            rows.append(
                {
                    "url": listing_url(source, page),
                    "kind": "listing",
                    "source": source,
                    "page_idx": page,
                    "child_urls": [] if alt_served else child,
                    "html": render_listing_html(source, page, [])
                    if alt_served
                    else render_listing_html(source, page, child),
                    "crawl_delay_ms": CRAWL_DELAY_MS[source],
                    "robots_allow": True,
                }
            )
            if alt_served:
                rows.append(
                    {
                        "url": alt_listing_url(listing_url(source, page)),
                        "kind": "listing",
                        "source": source,
                        "page_idx": page,
                        "child_urls": child,
                        "html": render_listing_html(source, page, child),
                        "crawl_delay_ms": CRAWL_DELAY_MS[source],
                        "robots_allow": True,
                    }
                )
        # investment pages (second hop): children in (sub_slot) order
        if source == "otodom":
            groups: dict[int, list[SynthOffer]] = {}
            for o in offers:
                if o.source == "otodom" and o.investment_lead is not None:
                    groups.setdefault(o.investment_lead, []).append(o)
            for lead, subs in sorted(groups.items()):
                subs = sorted(subs, key=lambda o: o.sub_slot)
                child_urls = [o.url for o in subs]
                rows.append(
                    {
                        "url": investment_url(lead),
                        "kind": "investment",
                        "source": "otodom",
                        "page_idx": subs[0].page_idx,
                        "child_urls": child_urls,
                        "html": render_listing_html("otodom", subs[0].page_idx, child_urls),
                        "crawl_delay_ms": CRAWL_DELAY_MS["otodom"],
                        "robots_allow": True,
                    }
                )
        for o in [o for o in offers if o.source == source]:
            rows.append(
                {
                    "url": o.url,
                    "kind": "offer",
                    "source": source,
                    "page_idx": o.page_idx,
                    "child_urls": [],
                    "html": render_offer_html(o),
                    "crawl_delay_ms": CRAWL_DELAY_MS[source],
                    "robots_allow": o.ordinal % 23 != 21,  # a few robots-blocked
                    # hard-failure pages (ST5 retry_failed) ...
                    "flaky": flaky_mod is not None and o.ordinal % flaky_mod == 13,
                    # ... vs Retry-After pages recovered in-run (ST8)
                    "retry_after": retry_after_mod is not None
                    and o.ordinal % retry_after_mod == 7,
                    "page_weight_kb": page_weight_kb,
                }
            )
    return rows


def make_robots_txt(offers: list[SynthOffer]) -> dict[str, str]:
    """Per-domain robots.txt whose Disallow lines exactly reproduce the
    per-URL robots_allow flags in the site graph (ordinal % 23 == 21), plus
    the domain's Crawl-delay — so the rules-table politeness path and the
    page-store flag path must agree."""
    from urllib.parse import urlsplit

    by_domain: dict[str, list[str]] = {DOMAINS[s]: [] for s in SOURCES}
    for o in offers:
        if o.ordinal % 23 == 21:
            parts = urlsplit(o.url)
            by_domain[parts.netloc].append(parts.path)
    texts = {}
    for source in SOURCES:
        domain = DOMAINS[source]
        lines = ["User-agent: *"]
        lines += [f"Disallow: {p}" for p in sorted(by_domain[domain])]
        lines.append(f"Crawl-delay: {CRAWL_DELAY_MS[source] / 1000.0}")
        texts[domain] = "\n".join(lines) + "\n"
    return texts


def geocode_dim_rows(offers: list[SynthOffer]) -> list[tuple]:
    """The streetwise OSM memo (geocache_osm.json stand-in): (city, street,
    dim_lat, dim_lon) rows carrying the TRUE point for every snap-adversary
    offer — exactly the entries Nominatim would have resolved. Honest offers
    miss the dim (unique adversary streets), so the snap can never touch
    them — mirroring `_geocode_osm` returning None on a cache/API miss."""
    return [
        (o.city, o.street(), o.lat, o.lon)
        for o in offers
        if o.geo_snap_wrong
    ]


# ------------------------------------------------------------- Spark entry
def build_corpus(seed: int = 42, n_pages: int = 6, cards_per_page: int = 8):
    """offers, images rows, site_graph rows — the full deterministic corpus."""
    offers = make_offers(seed=seed, n_pages=n_pages, cards_per_page=cards_per_page)
    images = make_image_rows(offers, seed=seed)
    graph = make_site_graph(offers, n_pages=n_pages)
    return offers, images, graph


def seed_urls(n_pages: int = 1) -> list[tuple[str, str]]:
    """(source, url) seed list — page-1 listing URLs per domain, identical for
    reference-vs-engine equivalence runs (FIXTURES.md §2)."""
    return [(s, listing_url(s, p)) for s in SOURCES for p in range(1, n_pages + 1)]
