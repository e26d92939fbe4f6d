"""SRC5 — OSM/Overpass XML ingest to the osm_points table.

Reference: ``conflate/osm.py :: parse_osm`` (SURVEY §3 SRC5) — nodes
keep their own lat/lon; ways/relations are collapsed to their Overpass
``<center>``; ``version`` comes from ``out meta``; untagged elements are
skipped.

This is a one-time ingest job, NOT on the hot path, so an
ElementTree-based ``mapInPandas`` parser is acceptable: each Arrow batch
carries whole XML documents (one per row — e.g. one Overpass response
per bbox split), parsed to osm_points rows.  At 100 TB the osm side is
a pre-materialized parquet/Iceberg table and this module is only the
bootstrap.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OSM_POINTS_SCHEMA = (
    "osm_type string, osm_id long, version int, lat double, lon double, "
    "tags map<string,string>, nds array<bigint>, "
    "members array<struct<mtype string, mref bigint, mrole string>>"
)


def parse_osm_xml(xml_text: str) -> list[dict]:
    """One OSM XML document -> osm point dicts (reference parse_osm)."""
    root = ET.fromstring(xml_text)
    out = []
    for el in root:
        if el.tag not in ("node", "way", "relation"):
            continue
        tags = {
            t.get("k"): t.get("v")
            for t in el.findall("tag")
            if t.get("k") is not None
        }
        if not tags:
            continue  # reference skips untagged elements
        if el.tag == "node":
            lat, lon = el.get("lat"), el.get("lon")
        else:
            center = el.find("center")
            if center is None:
                continue
            lat, lon = center.get("lat"), center.get("lon")
        if lat is None or lon is None:
            continue
        # §2.2 — ways keep their <nd> refs, relations their <member>
        # children, so a modified way/relation can be re-serialized to
        # .osc with its full geometry (round-1 gap: members were dropped
        # and ways serialized like nodes)
        nds = (
            [int(nd.get("ref")) for nd in el.findall("nd")]
            if el.tag == "way" else None
        )
        members = (
            [
                (m.get("type", ""), int(m.get("ref", "0")), m.get("role", ""))
                for m in el.findall("member")
            ]
            if el.tag == "relation" else None
        )
        out.append(
            dict(
                osm_type=el.tag,
                osm_id=int(el.get("id")),
                version=int(el.get("version", "1")),
                lat=float(lat),
                lon=float(lon),
                tags=tags,
                nds=nds,
                members=members,
            )
        )
    return out


def read_osm_xml(xml_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """DataFrame of XML documents -> osm_points DataFrame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc in pdf[xml_col]:
                rows.extend(parse_osm_xml(doc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "osm_type", "osm_id", "version", "lat", "lon", "tags",
                    "nds", "members",
                ],
            )

    return xml_docs.mapInPandas(run, OSM_POINTS_SCHEMA)
