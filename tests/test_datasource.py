"""Catalog/datasource utility (reference S13) — offline fixtures only."""

from __future__ import annotations

import json

import pytest

from osmdatapy_spark.sources.datasource import Datasource, OSM_datasource, comparable_name

GEO_FIXTURE = json.dumps(
    {
        "features": [
            {
                "properties": {
                    "id": "provence-alpes-cote-d-azur",
                    "name": "Provence-Alpes-Côte-d'Azur",
                    "urls": {"pbf": "https://example.org/paca-latest.osm.pbf"},
                }
            },
            {"properties": {"id": "nourl", "name": "NoUrl", "urls": {}}},
        ]
    }
)


def test_comparable_name():
    assert comparable_name("Provence-Alpes-Côte-d'Azur") == "PROVENCE-ALPES-CÔTE-DAZUR"
    assert comparable_name("L'Aquila") == comparable_name("LAquila")


def test_catalog_resolution():
    ds = OSM_datasource(geofabrik_index=GEO_FIXTURE, bbbike_cities=["Marseille"])
    # case/apostrophe-insensitive place matching
    assert ds.resolve("provence-alpes-côte-d'azur") == [
        "https://example.org/paca-latest.osm.pbf"
    ]
    assert ds.resolve("MARSEILLE") == [
        "https://download.bbbike.org/osm/bbbike/Marseille/Marseille.osm.pbf"
    ]
    with pytest.raises(KeyError):
        ds.resolve("Atlantis")
    # entries without a pbf URL are skipped
    with pytest.raises(KeyError):
        ds.resolve("NoUrl")


def test_download_all_concurrent_with_fallback(tmp_path):
    """Concurrent multi-place fetch (reference asyncio gather semantics):
    every place downloads in parallel via file:// URLs, a dead first URL
    falls back, and a fully-dead place surfaces its error without
    aborting the batch."""
    src_a = tmp_path / "a.bin"
    src_b = tmp_path / "b.bin"
    src_a.write_bytes(b"payload-a")
    src_b.write_bytes(b"payload-b")

    ds = Datasource()
    ds.add("Alpha", src_a.as_uri())
    ds.add("Beta", (tmp_path / "missing.bin").as_uri(), src_b.as_uri())  # fallback
    ds.add("Gamma", (tmp_path / "nope1.bin").as_uri(), (tmp_path / "nope2.bin").as_uri())

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    got = ds.download_all(str(out_dir), ["Alpha", "Beta", "Gamma"], max_workers=3)

    assert got["Alpha"].read_bytes() == b"payload-a"
    assert got["Beta"].read_bytes() == b"payload-b"  # second URL won
    assert isinstance(got["Gamma"], RuntimeError)
