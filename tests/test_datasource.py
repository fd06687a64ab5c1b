"""Catalog/datasource utility (reference S13) — offline fixtures only."""

from __future__ import annotations

import json

import pytest

from osmdatapy_spark.sources.datasource import OSM_datasource, comparable_name

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
