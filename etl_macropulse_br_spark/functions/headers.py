"""Fuzzy header resolution — driver-side schema machinery.

The reference infers the ANP CSV schema by normalizing headers
(unicode NFKD, accent strip, lowercase, squash non-alphanumerics)
and resolving each logical role by exact match or token containment,
with a prioritized fallback chain for the price column and a hard
error listing unmapped roles (``transform.py:27-72``).

Column names are metadata, so this is plain driver-side Python over
``df.columns`` producing a ``select(col(orig).alias(std))``
projection — zero executor work, fully compatible with Catalyst
column pruning.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Logical role → candidate normalized header names, most specific
# first. Mirrors the reference's role tables (transform.py:35-63).
ANP_ROLE_CANDIDATES: dict[str, list[str]] = {
    "uf_sigla": ["estado sigla", "sigla uf", "uf", "estado"],
    "product": ["produto"],
    "date_ref": ["data da coleta", "data coleta", "data"],
    "price": [
        "valor de venda",
        "preco medio revenda",
        "preco medio",
        "valor",
        "preco",
    ],
}


def normalize_header(name: str) -> str:
    """NFKD-normalize, strip accents, lowercase, squash non-alnum to
    single spaces (``transform.py:27-33``)."""
    s = unicodedata.normalize("NFKD", str(name))
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    s = s.lower()
    s = re.sub(r"[^a-z0-9]+", " ", s)
    return re.sub(r"\s+", " ", s).strip()


def resolve_columns(
    columns: list[str],
    role_candidates: dict[str, list[str]] | None = None,
) -> dict[str, str]:
    """Map logical roles → actual column names.

    Resolution order per role (``transform.py:35-63``): exact
    normalized match on each candidate in priority order, then
    token-containment. Containment matches each candidate token as a
    SUBSTRING of the whole normalized header — exactly the
    reference's ``pick_contains`` (``transform.py:43-48``:
    ``all(t in nrm for t in all_tokens)``) — so inflected pt-BR
    headers like ``"Datas da Coleta"`` still resolve the date role
    ("data" is a substring of "datas"); set-membership on the
    header's token set would refuse them (the one verified r10
    parity divergence, closed r11). Raises ``ValueError`` listing
    every unmapped role (``transform.py:65-72``).
    """
    role_candidates = role_candidates or ANP_ROLE_CANDIDATES
    normalized = {c: normalize_header(c) for c in columns}
    mapping: dict[str, str] = {}
    for role, candidates in role_candidates.items():
        hit = None
        for cand in candidates:
            for orig, norm in normalized.items():
                if norm == cand and orig not in mapping.values():
                    hit = orig
                    break
            if hit:
                break
        if hit is None:
            for cand in candidates:
                tokens = cand.split()
                for orig, norm in normalized.items():
                    if all(t in norm for t in tokens) and orig not in mapping.values():
                        hit = orig
                        break
                if hit:
                    break
        if hit is not None:
            mapping[role] = hit
    missing = [r for r in role_candidates if r not in mapping]
    if missing:
        raise ValueError(
            f"unmappable columns for roles {missing}; "
            f"available headers: {columns} "
            f"(normalized: {sorted(set(normalized.values()))})"
        )
    return mapping


def select_roles(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Project the resolved columns to their standard names."""
    return df.select(*[F.col(orig).alias(role) for role, orig in mapping.items()])
