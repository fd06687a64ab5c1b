"""Remote PBF extract catalog + downloader (reference S13,
``osmdatapy/datasource/datasource.py:94-131`` + ``OSMdatasource.py``).

A driver-side utility, deliberately NOT a Spark op (SURVEY §2.1 S13): it
resolves human place names to `.osm.pbf` download URLs from the public
Geofabrik and BBBike catalogs and fetches them to local/shared storage,
where the ``osmpbf`` data source takes over.

Network access is gated: catalog constructors accept pre-fetched index
payloads (tests use fixtures), and ``download`` uses urllib only when
actually called.
"""

from __future__ import annotations

import json
import unicodedata
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

GEOFABRIK_INDEX = "https://download.geofabrik.de/index-v1-nogeom.json"
BBBIKE_BASE = "https://download.bbbike.org/osm/bbbike"


def comparable_name(name: str) -> str:
    """Name normalization for catalog matching (reference
    ``comparable_string``, datasource.py:184-191): NFC-normalize,
    upper-case, strip apostrophes."""
    s = unicodedata.normalize("NFC", name)
    return s.upper().replace("'", "").replace("’", "")


@dataclass
class Datasource:
    """Place-name → URL catalog with fallback URLs (reference
    ``Datasource``, datasource.py:8-141; subclass to add catalogs)."""

    catalog: dict[str, list[str]] = field(default_factory=dict)  # name -> [url, alt...]

    def add(self, name: str, *urls: str) -> None:
        self.catalog[comparable_name(name)] = list(urls)

    def resolve(self, place: str) -> list[str]:
        key = comparable_name(place)
        if key not in self.catalog:
            raise KeyError(f"unknown place {place!r}; {len(self.catalog)} known")
        return self.catalog[key]

    def download(self, path: str, place: str, rename: Optional[str] = None) -> Path:
        """Fetch a place's pbf to ``path`` (first URL that answers wins —
        reference fallback-URL behavior, datasource.py:33-71)."""
        import urllib.request

        urls = self.resolve(place)
        dest = Path(path) / ((rename or comparable_name(place).lower()) + ".osm.pbf")
        last: Exception | None = None
        for url in urls:
            try:
                urllib.request.urlretrieve(url, dest)  # noqa: S310
                return dest
            except Exception as e:
                last = e
        raise RuntimeError(f"all URLs failed for {place!r}") from last

    def download_all(
        self, path: str, places: list[str], max_workers: int = 8
    ) -> dict[str, "Path | Exception"]:
        """Fetch MANY places concurrently (reference fetches extracts with
        asyncio + fallback URLs, datasource/datasource.py:8-71; stdlib
        threads here — downloads are I/O-bound, so threads parallelize them
        identically with no event-loop plumbing).

        Per-place fallback semantics are exactly ``download``'s; failures
        don't abort the batch — the result maps each place to its local
        Path or the exception, and the caller decides (mirrors the
        reference's gather-with-return-exceptions shape)."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            futures = {p: ex.submit(self.download, path, p) for p in places}
            return {p: self._result_or_exc(f) for p, f in futures.items()}

    @staticmethod
    def _result_or_exc(future):
        try:
            return future.result()
        except Exception as e:
            return e


class OSM_datasource(Datasource):
    """Geofabrik + BBBike catalogs (reference ``OSM_datasource``,
    OSMdatasource.py:15-57).

    Pass pre-fetched index payloads for offline use; with none given,
    ``load()`` fetches the public indices.
    """

    def __init__(
        self,
        geofabrik_index: Optional[str] = None,
        bbbike_cities: Optional[list[str]] = None,
    ):
        super().__init__()
        if geofabrik_index is not None:
            self._load_geofabrik(geofabrik_index)
        if bbbike_cities is not None:
            self._load_bbbike(bbbike_cities)

    def _load_geofabrik(self, payload: str) -> None:
        """index-v1-nogeom.json: features[].properties{id, name, urls{pbf}}."""
        data = json.loads(payload)
        for feat in data.get("features", []):
            props = feat.get("properties", {})
            pbf = props.get("urls", {}).get("pbf")
            if pbf and props.get("name"):
                self.add(props["name"], pbf)

    def _load_bbbike(self, cities: list[str]) -> None:
        """BBBike serves {BASE}/{City}/{City}.osm.pbf per city name."""
        for city in cities:
            self.add(city, f"{BBBIKE_BASE}/{city}/{city}.osm.pbf")

    @classmethod
    def load(cls) -> "OSM_datasource":  # pragma: no cover - network path
        import urllib.request

        with urllib.request.urlopen(GEOFABRIK_INDEX) as r:  # noqa: S310
            geo = r.read().decode("utf-8")
        return cls(geofabrik_index=geo)
