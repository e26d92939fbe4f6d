"""Pure-Python oracle of the reference semantics (test-only; SURVEY §6.2).

Single-threaded reimplementation of ``mapsme/osm_conflate``'s dataflow:
ref-dedup D1 (``conflate/dataset.py :: read_dataset``), spatial-duplicate
collapse D2 (``check_dataset_for_duplicates``), tag filter F1, greedy
nearest-first one-to-one matching J1+J2
(``conflate/conflate.py :: match_dataset_points_smart``), tag merge with
master-tag precedence X2 (``register_match``), create/delete/retag
J4/J5, audit overrides J6, tile assignment X8 (engine addition).

This module deliberately avoids Spark: it is O(n^2) brute force, used as
the differential-test oracle for the distributed engine.  Determinism
rules (SURVEY §8.5): every ordering uses the total key
``(dist, dataset_id, osm_key)``; spatial dedup iterates ids ascending.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

from .config import ConflateConfig

EARTH_R = 6378137.0


def distance(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """conflate/data.py :: distance — equirectangular meters (SURVEY §2.3)."""
    dx = math.radians(lon1 - lon2) * math.cos(0.5 * math.radians(lat1 + lat2))
    dy = math.radians(lat1 - lat2)
    return EARTH_R * math.sqrt(dx * dx + dy * dy)


@dataclass
class SourcePoint:
    """conflate/data.py :: SourcePoint (SURVEY §2.1)."""

    id: str
    lat: float
    lon: float
    tags: dict = field(default_factory=dict)
    category: Optional[str] = None
    remarks: Optional[str] = None


@dataclass
class OSMPoint:
    """conflate/data.py :: OSMPoint (SURVEY §2.2)."""

    osm_type: str
    osm_id: int
    version: int
    lat: float
    lon: float
    tags: dict = field(default_factory=dict)

    @property
    def key(self) -> str:
        return self.osm_type[0] + str(self.osm_id)

    def is_area(self) -> bool:
        return self.osm_type != "node"


# ---------------------------------------------------------------------------
# D1 — ref-dedup: duplicate dataset ids, keep first occurrence
# ---------------------------------------------------------------------------

def ref_dedup(points: list[SourcePoint]) -> tuple[list[SourcePoint], list[str]]:
    seen: set[str] = set()
    kept, dropped = [], []
    for p in points:
        if p.id in seen:
            dropped.append(p.id)
        else:
            seen.add(p.id)
            kept.append(p)
    return kept, dropped


# ---------------------------------------------------------------------------
# D2 — spatial duplicate collapse within duplicate_distance
# ---------------------------------------------------------------------------

def spatial_dedup(
    points: list[SourcePoint], dd: float
) -> tuple[list[SourcePoint], list[str]]:
    """Iterate ids ascending; drop a point if a KEPT point with smaller id
    lies strictly within ``dd`` meters."""
    kept: list[SourcePoint] = []
    dropped: list[str] = []
    for p in sorted(points, key=lambda q: q.id):
        if any(distance(p.lat, p.lon, q.lat, q.lon) < dd for q in kept):
            dropped.append(p.id)
        else:
            kept.append(p)
    return kept, dropped


# ---------------------------------------------------------------------------
# F1 — OSM tag filter from profile query clauses
# ---------------------------------------------------------------------------

def query_filter(osm: list[OSMPoint], query) -> list[OSMPoint]:
    if not query:
        return list(osm)

    def ok(p: OSMPoint) -> bool:
        for key, op, value in query:
            v = p.tags.get(key)
            if v is None:
                return False
            if op == "=" and v != value:
                return False
            if op == "~" and (value or "") not in v:
                return False
        return True

    return [p for p in osm if ok(p)]


# ---------------------------------------------------------------------------
# F2 — dataset transform DSL
# ---------------------------------------------------------------------------

def transform_tags(tags: dict, transform: dict) -> dict:
    out = dict(tags)
    for key, rule in transform.items():
        if callable(rule):
            if key in out:
                out[key] = rule(out[key])
        elif isinstance(rule, str) and rule.startswith("-"):
            out.pop(key, None)
        elif isinstance(rule, str) and rule.startswith("+"):
            out.setdefault(key, rule[1:])
        else:
            out[key] = str(rule)
    return {k: str(v).strip() for k, v in out.items()}


# ---------------------------------------------------------------------------
# X2 — tag merge with master-tag precedence + ref stamping
# ---------------------------------------------------------------------------

def merge_tags(
    ds_tags: dict, osm_tags: dict, master_tags, ref_key: str, ds_id: str
) -> tuple[dict, bool]:
    merged = dict(osm_tags)
    for k, v in ds_tags.items():
        if k in master_tags or k not in merged:
            merged[k] = v
    merged[ref_key] = ds_id
    return merged, merged != osm_tags


# ---------------------------------------------------------------------------
# J1+J2 — greedy nearest-first one-to-one matching (brute force)
# ---------------------------------------------------------------------------

def greedy_match(
    dataset: list[SourcePoint],
    osm: list[OSMPoint],
    cfg: ConflateConfig,
    audit: Optional[dict] = None,
) -> list[tuple[str, str, float]]:
    """Return matched (dataset_id, osm_key, dist) triples — the exact
    sequential greedy the reference's kd-tree loop produces, with the
    deterministic tie-break (dist, dataset_id, osm_key)."""
    audit = audit or {}
    pairs = []
    for sp in dataset:
        if audit.get(sp.id, {}).get("skip"):
            continue  # J6: audit skip removes the dataset point from matching
        # F3 — per-category max_distance override
        radius = cfg.radius_for(sp.category)
        # U2 — weight hook: higher weight matches first
        negw = -float(cfg.weight(sp.tags)) if cfg.weight is not None else 0.0
        for op in osm:
            d = distance(sp.lat, sp.lon, op.lat, op.lon)
            if d <= radius:
                # J3 — profile matches(osm_tags, ds_tags) candidate veto
                if cfg.matches is not None and not cfg.matches(op.tags, sp.tags):
                    continue
                pairs.append((negw, d, sp.id, op.key))
    pairs.sort()
    used_ds: set[str] = set()
    used_osm: set[str] = set()
    out = []
    for _negw, d, sid, okey in pairs:
        if sid in used_ds or okey in used_osm:
            continue
        used_ds.add(sid)
        used_osm.add(okey)
        out.append((sid, okey, d))
    return out


# ---------------------------------------------------------------------------
# Full conflation — E1 lifecycle equivalent
# ---------------------------------------------------------------------------

def conflate(
    dataset: list[SourcePoint],
    osm: list[OSMPoint],
    cfg: ConflateConfig,
    audit: Optional[dict] = None,
) -> dict:
    """Run the whole reference dataflow; returns dict with
    ``matched_pairs``, ``changes``, ``dropped_dup_ids``, ``dropped_spatial_ids``,
    ``tiles``.  Change rows follow FIXTURES.md §2."""
    audit = audit or {}

    dataset, dropped_dup = ref_dedup(dataset)
    dataset = [
        SourcePoint(
            p.id, p.lat, p.lon,
            transform_tags(p.tags, cfg.transform_dict), p.category, p.remarks,
        )
        for p in dataset
    ]
    # F3: category extra tags (reserved match-param keys excluded)
    cats = cfg.category_tags
    for p in dataset:
        if p.category and p.category in cats:
            for k, v in cats[p.category].items():
                p.tags.setdefault(k, str(v))
    dataset, dropped_spatial = spatial_dedup(dataset, cfg.duplicate_distance)
    osm = query_filter(osm, cfg.query)

    ds_by_id = {p.id: p for p in dataset}
    osm_by_key = {p.key: p for p in osm}

    # vicinity (J5): OSM points within max_distance of ANY dataset point,
    # computed on the raw candidate set (pre-audit, pre-match)
    vicinity: set[str] = set()
    for op in osm:
        for sp in dataset:
            if distance(sp.lat, sp.lon, op.lat, op.lon) <= cfg.radius_for(sp.category):
                vicinity.add(op.key)
                break

    matched = greedy_match(dataset, osm, cfg, audit)
    matched_ds = {m[0] for m in matched}
    matched_osm = {m[1] for m in matched}

    changes = []

    # matched -> modify (X2 merge, X3 move)
    for sid, okey, d in matched:
        sp, op = ds_by_id[sid], osm_by_key[okey]
        merged, changed = merge_tags(
            sp.tags, op.tags, cfg.master_tags, cfg.ref_key, sid
        )
        a = audit.get(sid, {})
        move_allowed = a.get("move", True)
        moved = (
            op.osm_type == "node" and d > cfg.position_tolerance and move_allowed
        )
        lat = sp.lat if moved else op.lat
        lon = sp.lon if moved else op.lon
        # J6 — audit coordinate override pins the final position
        if a.get("fix_lat") is not None and a.get("fix_lon") is not None:
            lat, lon = a["fix_lat"], a["fix_lon"]
            moved = (lat != op.lat) or (lon != op.lon)
        if changed or moved:
            changes.append(
                dict(
                    action="modify",
                    osm_type=op.osm_type,
                    osm_id=op.osm_id,
                    version=op.version,
                    lat=lat,
                    lon=lon,
                    tags=merged,
                    dataset_id=sid,
                    match_dist=d,
                )
            )

    # unmatched dataset -> create (J4)
    for sp in dataset:
        if sp.id in matched_ds:
            continue
        tags = dict(sp.tags)
        tags[cfg.ref_key] = sp.id
        changes.append(
            dict(
                action="create",
                osm_type="node",
                osm_id=None,
                version=1,
                lat=sp.lat,
                lon=sp.lon,
                tags=tags,
                dataset_id=sp.id,
                match_dist=None,
            )
        )

    # unmatched OSM -> delete / retag (J5) with vicinity + audit keep (J6)
    for op in osm:
        if op.key in matched_osm:
            continue
        ref_val = op.tags.get(cfg.ref_key)
        if ref_val is not None:
            if audit.get(ref_val, {}).get("keep"):
                continue
            if cfg.delete_unmatched:
                changes.append(
                    dict(
                        action="delete",
                        osm_type=op.osm_type,
                        osm_id=op.osm_id,
                        version=op.version,
                        lat=op.lat,
                        lon=op.lon,
                        tags=dict(op.tags),
                        dataset_id=ref_val,
                        match_dist=None,
                    )
                )
                continue
            # fall through to retag below when delete_unmatched is False
        elif op.key not in vicinity:
            continue  # far-away untouched (vicinity check)
        renames = cfg.tag_unmatched_dict
        newtags = dict(op.tags)
        touched = False
        for old, new in renames.items():
            if old in newtags:
                newtags[new] = newtags.pop(old)
                touched = True
        if touched:
            changes.append(
                dict(
                    action="retag",
                    osm_type=op.osm_type,
                    osm_id=op.osm_id,
                    version=op.version,
                    lat=op.lat,
                    lon=op.lon,
                    tags=newtags,
                    dataset_id=ref_val,
                    match_dist=None,
                )
            )

    # X8 — z tiles for every dataset point
    n = 1 << cfg.tile_zoom
    tiles = []
    for sp in dataset:
        x = min(max(int(math.floor((sp.lon + 180.0) / 360.0 * n)), 0), n - 1)
        rad = math.radians(sp.lat)
        y = math.floor(
            (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n
        )
        y = min(max(int(y), 0), n - 1)
        tiles.append((sp.id, cfg.tile_zoom, x, y))

    return dict(
        matched_pairs=[
            dict(dataset_id=s, osm_key=o, dist=d) for s, o, d in matched
        ],
        changes=changes,
        dropped_dup_ids=dropped_dup,
        dropped_spatial_ids=dropped_spatial,
        tiles=tiles,
    )
