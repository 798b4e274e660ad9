"""libpostal-style zone-typing rules engine.

Re-implements the semantics of the reference's ``ZoneTyper``
(/root/reference/src/zone_typer.rs): per-country YAML rule sets with

- ``admin_level``: map "level-string" → zone type;
- ``overrides.id``: per-osm-id forced type; an explicit ``null`` value
  *suppresses* typing (yields "unknown level", zone_typer.rs:125-136);
- ``overrides.contained_by``: recursive rule sets scoped to zones whose
  inclusion ancestors include a given osm id; the FIRST matching ancestor in
  inclusion-list order wins, and a scoped ruleset that yields nothing falls
  back to the outer ``admin_level`` map (zone_typer.rs:139-158).

Precedence: id override > contained_by override > admin_level map
(zone_typer.rs:103-123; test matrix :421-501).

Rules are data (one ``<cc>.yaml`` per country, rules_dir injectable) — the
reference embeds them at compile time (zone_typer.rs:14); we load once per
typer actor (SURVEY §2.3 ST1). Files that fail to parse are skipped with a
warning, like read_libpostal_yaml_folder (zone_typer.rs:162-189).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from ..model import ZONE_TYPES

logger = logging.getLogger(__name__)

_MISSING = object()


@dataclass
class RuleSet:
    type_by_level: dict[str, str] = field(default_factory=dict)
    id_overrides: dict[str, str | None] = field(default_factory=dict)
    contained_by: dict[str, "RuleSet"] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "RuleSet":
        tbl = {str(k): _check_type(v) for k, v in (d.get("admin_level") or {}).items()}
        overrides = d.get("overrides") or {}
        ids: dict[str, str | None] = {}
        for osm_kind, m in (overrides.get("id") or {}).items():
            _check_kind(osm_kind)
            for osm_id, zt in (m or {}).items():
                ids[f"{osm_kind}:{osm_id}"] = None if zt is None else _check_type(zt)
        contained: dict[str, RuleSet] = {}
        for osm_kind, m in (overrides.get("contained_by") or {}).items():
            _check_kind(osm_kind)
            for osm_id, sub in (m or {}).items():
                contained[f"{osm_kind}:{osm_id}"] = cls.from_dict(sub or {})
        return cls(tbl, ids, contained)

    def get_zone_type(
        self, osm_id: str, admin_level: int | None, ancestors: list[str]
    ) -> str | None:
        """Resolved type, or None when no rule applies / typing suppressed
        (the caller maps None → "unknown level")."""
        o = self._overridden_type(osm_id, admin_level, ancestors)
        if o is not _MISSING:
            return o  # may be None: explicit suppression
        return self.type_by_level.get(str(admin_level if admin_level is not None else 0))

    def _overridden_type(self, osm_id, admin_level, ancestors):
        if osm_id in self.id_overrides:
            return self.id_overrides[osm_id]
        if self.contained_by:
            for anc in ancestors:
                sub = self.contained_by.get(anc)
                if sub is not None:
                    t = sub.get_zone_type(osm_id, admin_level, ancestors)
                    if t is not None:
                        return t
                    break  # first matching ancestor only (find_map)
        return _MISSING


def _check_type(v: str) -> str:
    if v not in ZONE_TYPES:
        raise ValueError(f"unknown zone type {v!r}")
    return v


def _check_kind(k: str) -> None:
    if k not in ("node", "way", "relation"):
        raise ValueError(f"unknown osm kind {k!r}")


class ZoneTyper:
    """Country-code → RuleSet registry loaded from a YAML directory."""

    def __init__(self, rules: dict[str, RuleSet]):
        if not rules:
            raise ValueError(
                "no country rules have been loaded; the rules directory must "
                "contain valid libpostal-style files"
            )
        self.rules = rules

    @classmethod
    def from_dir(cls, rules_dir: str) -> "ZoneTyper":
        import yaml

        rules: dict[str, RuleSet] = {}
        for fn in sorted(os.listdir(rules_dir)):
            if not (fn.endswith(".yaml") or fn.endswith(".yml")):
                continue
            cc = os.path.splitext(fn)[0].upper()
            try:
                with open(os.path.join(rules_dir, fn)) as f:
                    d = yaml.safe_load(f) or {}
                rules[cc] = RuleSet.from_dict(d)
            except Exception as e:  # malformed file → skipped (zone_typer.rs:166-172)
                logger.warning("rules file %s skipped: %s", fn, e)
        return cls(rules)

    def contains_rule(self, country_code: str) -> bool:
        return country_code in self.rules

    def get_zone_type(
        self,
        osm_id: str,
        admin_level: int | None,
        country_code: str,
        ancestors: list[str],
    ) -> tuple[str, str | None]:
        """→ ("ok", type) | ("invalid_country", None) | ("unknown_level", None)
        — the three arms of /root/reference/src/lib.rs:146-181."""
        rs = self.rules.get(country_code)
        if rs is None:
            return "invalid_country", None
        t = rs.get_zone_type(osm_id, admin_level, ancestors)
        if t is None:
            return "unknown_level", None
        return "ok", t
