"""R1: OSM XML scan — the reference's entry format
(``ToSidewalk/network.py § parse``, ElementTree over a .osm file — module
level citation; /root/reference was empty this session, SURVEY.md §0).

Spark re-expression: no spark-xml jar is available offline, so the shredder
is a mapInPandas over (doc_id, xml binary) rows — each row an independent
OSM tile document, parsed with ElementTree inside the Arrow batch.  This is
the distributed analog of the reference's per-tile batch driver: tiles are
rows, parallelism is partitioning, no driver-side loop.

Outputs the canonical network tables (SURVEY.md §1.1):
    nodes(node_id, lat, lng, tags)   ways(way_id, node_ids, highway, tags)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

NODE_SCHEMA = T.StructType([
    T.StructField("node_id", T.LongType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lng", T.DoubleType()),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])

WAY_SCHEMA = T.StructType([
    T.StructField("way_id", T.LongType()),
    T.StructField("node_ids", T.ArrayType(T.LongType())),
    T.StructField("highway", T.StringType()),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])


def _parse_tags(elem) -> dict[str, str]:
    return {t.get("k"): t.get("v") for t in elem.findall("tag")}


def parse_osm_nodes(xml_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Shred <node id lat lon> elements out of OSM XML documents."""

    def run(it):
        for pdf in it:
            rows = []
            for blob in pdf[xml_col]:
                root = ET.fromstring(bytes(blob))
                for n in root.findall("node"):
                    rows.append({
                        "node_id": int(n.get("id")),
                        "lat": float(n.get("lat")),
                        "lng": float(n.get("lon")),
                        "tags": _parse_tags(n),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in NODE_SCHEMA.fields])

    return xml_docs.select(xml_col).mapInPandas(run, NODE_SCHEMA)


def parse_osm_ways(xml_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Shred <way><nd ref/><tag/></way> elements; the highway tag is lifted
    to a column (the R1 whitelist filter runs downstream as a plain
    Catalyst filter, fully pushable)."""

    def run(it):
        for pdf in it:
            rows = []
            for blob in pdf[xml_col]:
                root = ET.fromstring(bytes(blob))
                for w in root.findall("way"):
                    tags = _parse_tags(w)
                    rows.append({
                        "way_id": int(w.get("id")),
                        "node_ids": [int(nd.get("ref")) for nd in w.findall("nd")],
                        "highway": tags.get("highway"),
                        "tags": tags,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in WAY_SCHEMA.fields])

    return xml_docs.select(xml_col).mapInPandas(run, WAY_SCHEMA)


def network_to_osm_xml(nodes: DataFrame, ways: DataFrame) -> str:
    """R20 OSM-XML export twin (driver-side small networks only; the
    scalable sink is the GeoJSON feature writer in operators.sidewalks)."""
    parts = ["<?xml version='1.0' encoding='UTF-8'?>", "<osm version='0.6'>"]
    for r in sorted(nodes.collect(), key=lambda r: r.node_id):
        parts.append(f"  <node id='{r.node_id}' lat='{r.lat:.7f}' lon='{r.lng:.7f}'/>")
    for w in sorted(ways.collect(), key=lambda r: r.way_id):
        parts.append(f"  <way id='{w.way_id}'>")
        parts.extend(f"    <nd ref='{n}'/>" for n in w.node_ids)
        if w.highway:
            parts.append(f"    <tag k='highway' v='{w.highway}'/>")
        parts.append("  </way>")
    parts.append("</osm>")
    return "\n".join(parts)
