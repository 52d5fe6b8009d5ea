"""Catalogue fetch/publish — SURVEY.md §2.1 S9/S10.

The reference pulls its source .mdb from a CKAN data catalogue
(`download.file(resource_show(MDB_RID)$url, tmp); unzip(...)`,
ningaloo-etl.Rmd:47-53) and publishes products back
(`resource_update(RID, path)`, :430-437, upload_workbooks.R:2-4).

These are driver-side, out-of-engine steps (HTTP, not data-parallel): the
engine models them as staging helpers with injectable transports so
pipelines are testable offline, and a `refresh` flag reproduces the
reference's reuse-local-copy behavior (ningaloo-etl.Rmd:41)."""

from __future__ import annotations

import os
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field

# transport(url) -> bytes; injectable for offline tests.
Transport = Callable[[str], bytes]


def _default_transport(url: str) -> bytes:
    from urllib.request import urlopen

    with urlopen(url, timeout=120) as resp:  # noqa: S310
        return resp.read()


@dataclass
class Catalogue:
    """Minimal CKAN-shaped catalogue client: resources are (id → url)."""

    resource_urls: dict[str, str]
    staging_dir: str = "/tmp/ningaloo_staging"
    transport: Transport = _default_transport
    published: dict[str, str] = field(default_factory=dict)

    def fetch(self, resource_id: str, refresh: bool = False) -> str:
        """S10: fetch a resource to local staging; reuse the local copy
        unless ``refresh`` (the reference's refresh_data flag). Zip archives
        are expanded and the directory returned."""
        os.makedirs(self.staging_dir, exist_ok=True)
        dest = os.path.join(self.staging_dir, resource_id)
        if os.path.exists(dest) and not refresh:
            return dest
        blob = self.transport(self.resource_urls[resource_id])
        tmp = dest + ".download"
        with open(tmp, "wb") as f:
            f.write(blob)
        if zipfile.is_zipfile(tmp):
            os.makedirs(dest, exist_ok=True)
            with zipfile.ZipFile(tmp) as z:
                z.extractall(dest)
            os.remove(tmp)
        else:
            os.replace(tmp, dest)
        return dest

    def publish(self, resource_id: str, path: str) -> None:
        """S9: `resource_update(RID, path)` — record the product for upload.
        The default implementation is a dry-run registry (no network);
        deployments override ``push`` with a real CKAN POST."""
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self.published[resource_id] = path
