"""Country resolution (/root/reference/src/country_finder.rs).

Countries = zones carrying the ``ISO3166-1:alpha2`` tag whose code has a rule
set. A zone's country = over its inclusion ancestors ∪ itself, the country
with the **highest admin_level** (most specific — a dependent territory wins
over its sovereign, country_finder.rs:41-48). Ties resolve to the last
maximal element in ancestor order (Rust ``max_by_key`` semantics).

The country table is tiny (≤ a few hundred rows) → broadcast dict, row-local
lookup (SURVEY §2.3 ST2).
"""

from __future__ import annotations

COUNTRY_CODE_TAG = "ISO3166-1:alpha2"


class CountryFinder:
    def __init__(self, countries: dict[str, tuple[str, int]]):
        """countries: osm_id → (iso_code, admin_level or 0)."""
        self.countries = countries

    @classmethod
    def from_zone_rows(cls, rows, typer) -> "CountryFinder":
        """rows: iterable of (osm_id, tags_items, admin_level)."""
        countries = {}
        for osm_id, tags, admin_level in rows:
            iso = dict(tags or {}).get(COUNTRY_CODE_TAG)
            if iso is None:
                continue
            iso = iso.upper()
            if not typer.contains_rule(iso):
                continue
            countries[osm_id] = (iso, admin_level if admin_level is not None else 0)
        return cls(countries)

    def is_empty(self) -> bool:
        return not self.countries

    def find(self, osm_id: str, ancestors: list[str]) -> str | None:
        best = None
        best_level = -1
        for a in list(ancestors) + [osm_id]:
            c = self.countries.get(a)
            if c is not None and c[1] >= best_level:  # last max wins (max_by_key)
                best, best_level = c[0], c[1]
        return best
