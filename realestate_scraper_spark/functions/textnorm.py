"""Text normalization — F2 (slugify) and F3 (normalize-for-match).

Pure Spark expressions (whole-stage codegen, no UDF) that are value-equal to
the reference's three normalizers on their Polish-portal domain:

- :func:`slugify_expr` ≡ ``_slug`` (otodom.py:34-38, gratka.py:76-81):
  lower → NFKD → ascii-ignore → non-alnum→'-' → strip('-'). NFKD+ascii
  DROPS ``ł``/``Ł`` (they are standalone letters, not base+combining), so
  "Wrocław" → "wrocaw" — the engine reproduces that exactly, quirk included.
- :func:`city_key_expr` ≡ ``city_key`` (cities_rename.py:23-60): lower →
  fold six Unicode dash variants to '-' → strip combining marks → manual
  ``ł→l`` → collapse spaces (and spaces around '-').
- :func:`norm_match_expr` ≡ ``_norm`` (gratka.py:83-87): like slugify but
  non-alnum → single space, for substring city matching (P9).

Spark has no NFKD primitive; the expressions fold the diacritics the
reference's portals actually emit (Polish alphabet + common Latin-1) with
``translate`` — table-driven, extendable, and O(1) per char JVM-side. At a
true multilingual 100 TB corpus this becomes an ICU pass in a pandas UDF;
for the reference's domain the table IS the NFKD image.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters whose NFKD decomposition starts with an ASCII base letter —
# translate() source/target pairs (lowercase only; apply after lower()).
_ACCENT_SRC = "ąćęńóśźżáàâäãåéèêëíìîïóòôöõúùûüýÿñçšž"
_ACCENT_DST = "acenoszzaaaaaaeeeeiiiiooooouuuuyyncsz"

# Unicode dash variants folded to '-' (cities_rename.py:23-30).
_DASHES = "‐‑‒–—−"


def _fold_accents(c: Column) -> Column:
    return F.translate(c, _ACCENT_SRC, _ACCENT_DST)


def slugify_expr(c: Column | str) -> Column:
    """F2: the reference ``_slug`` — NFKD→ascii semantics: decomposable
    accents fold to their base letter, every OTHER non-ascii char (ł, unicode
    dashes, …) is DELETED by the ascii-ignore step, and only then does
    non-alnum become '-'. ("Kędzierzyn—Koźle" → "kedzierzynkozle": the
    em-dash vanishes, it does not become a hyphen.)"""
    s = F.col(c) if isinstance(c, str) else c
    s = F.lower(F.trim(s))
    s = F.regexp_replace(_fold_accents(s), r"[^\x00-\x7F]", "")
    s = F.regexp_replace(s, "[^a-z0-9]+", "-")
    return F.regexp_replace(s, "(^-+)|(-+$)", "")


def city_key_expr(c: Column | str) -> Column:
    """F3: ``city_key`` (cities_rename.py:33-60) — dash fold, combining-mark
    strip (ł→l manually, matching the reference's explicit fix-up), space
    normalization incl. around '-'."""
    s = F.col(c) if isinstance(c, str) else c
    s = F.lower(F.trim(s))
    s = F.translate(s, _DASHES, "-" * len(_DASHES))
    s = _fold_accents(s)
    s = F.translate(s, "ł", "l")
    s = F.regexp_replace(s, r"\s*-\s*", "-")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def norm_match_expr(c: Column | str) -> Column:
    """F3 variant: gratka ``_norm`` — non-alnum → single space, for the
    city-match listing filter (P9, gratka.py:89-93)."""
    s = F.col(c) if isinstance(c, str) else c
    s = F.lower(F.trim(s))
    s = F.regexp_replace(_fold_accents(s), r"[^\x00-\x7F]", "")
    s = F.regexp_replace(s, "[^a-z0-9]+", " ")
    return F.trim(s)


# ------------------------------------------------------- python twins
def slugify_py(s: str) -> str:
    """Dependency-free twin of the reference ``_slug`` (gratka.py:76-81) —
    tests assert tri-equality slugify_expr == this == reference."""
    s = (s or "").strip().lower()
    s = unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode("ascii")
    return re.sub(r"[^a-z0-9]+", "-", s).strip("-")


def city_key_py(s: str) -> str:
    """Twin of cities_rename.city_key (cities_rename.py:33-60)."""
    if not s:
        return ""
    s = s.strip().lower()
    s = "".join("-" if ch in _DASHES else ch for ch in s)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.replace("ł", "l")
    s = re.sub(r"\s*-\s*", "-", s)
    return " ".join(s.split())
