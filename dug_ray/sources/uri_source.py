"""URI loader dispatch (SURVEY.md §2.1 S2/S3).

The reference routes inputs through two loaders — filesystem walk and an
HTTP fetch that stages each URL under ``data_storage_dir/netloc/path``
before parsing (``/root/reference/src/dug/core/loaders/network_loader.py:
13-31``, dispatch ``loaders/__init__.py``). The Ray-Data-native equivalent
dispatches on URI scheme:

- ``file://`` / bare paths -> ``ray.data.read_parquet`` on the local path;
- object-store schemes (``s3://``, ``gs://``, ``abfs://``, ``hdfs://``) ->
  the URI is handed to ``read_parquet`` unchanged — Arrow's filesystem
  layer streams ranges directly to the workers, so unlike the reference
  nothing is staged through a single downloader (the 100 TB path);
- ``http(s)://`` -> stage-then-read like the reference (one download into
  the storage dir, then a normal local read). This sandbox has no network,
  so the fetch itself is gated behind an import/socket try and surfaces a
  clear error while keeping the dispatch + staging-layout logic real and
  tested.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

import ray.data

OBJECT_STORE_SCHEMES = {"s3", "gs", "gcs", "abfs", "abfss", "az", "hdfs"}


def staged_path(storage_dir: str, uri: str) -> str:
    """Reference staging layout: ``storage_dir/netloc/path`` (network_loader
    .py:25-28). URLs that differ only in query string / fragment must NOT
    collide onto one staged file (the second would silently be served the
    first's bytes), so those components suffix the filename as a hash."""
    p = urlparse(uri)
    base = os.path.join(storage_dir, p.netloc, p.path.lstrip("/"))
    if p.query or p.fragment:
        import hashlib
        tag = hashlib.md5(f"{p.query}#{p.fragment}".encode()).hexdigest()[:12]
        base += f".q{tag}"
    return base


def read_table_uri(uri: str, columns: list[str] | None = None,
                   storage_dir: str = "/tmp/dug_ray_fetch",
                   allow_legacy_staged: bool = False) -> ray.data.Dataset:
    """Scheme-dispatched parquet read (the S2/S3 loader surface).

    ``allow_legacy_staged`` (default OFF) is the one-time cache-migration
    escape hatch for query/fragment URIs staged before the ``.q<hash>``
    suffix landed: it serves the bare ``netloc/path`` file when the
    suffixed one is absent. It is opt-in because the bare path cannot
    distinguish WHICH query variant was staged there (the exact collision
    the suffix prevents) — only enable it for caches known to predate the
    suffix and hold the intended variant."""
    scheme = urlparse(uri).scheme
    if scheme in ("", "file"):
        path = urlparse(uri).path if scheme == "file" else uri
        return ray.data.read_parquet(path, columns=columns)
    if scheme in OBJECT_STORE_SCHEMES:
        return ray.data.read_parquet(uri, columns=columns)
    if scheme in ("http", "https"):
        target = staged_path(storage_dir, uri)
        if not os.path.exists(target):
            p = urlparse(uri)
            legacy = os.path.join(storage_dir, p.netloc, p.path.lstrip("/"))
            if (allow_legacy_staged and legacy != target
                    and os.path.exists(legacy)):
                target = legacy
            else:
                _fetch(uri, target)
        return ray.data.read_parquet(target, columns=columns)
    raise ValueError(f"Cannot find loader for scheme '{scheme}'")


def _fetch(uri: str, target: str) -> None:
    try:
        import urllib.request
        os.makedirs(os.path.dirname(target), exist_ok=True)
        tmp = target + ".tmp"
        with urllib.request.urlopen(uri, timeout=30) as r, open(tmp, "wb") as f:
            f.write(r.read())
        os.replace(tmp, target)
    except OSError as e:
        raise NotImplementedError(
            f"HTTP staging of {uri} needs network access (unavailable in "
            f"this environment); pre-stage the file at {target} instead") from e
