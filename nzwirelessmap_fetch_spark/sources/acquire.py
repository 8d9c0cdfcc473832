"""P1/P2: HTTP source acquisition with Last-Modified version keying.

The reference GETs the source archive and derives the run's version key
from the ``Last-Modified`` response header (fetch.go:35-48: GET +
``lastModifiedTime``; fetch.go:180-187: RFC1123 parse → RFC3339 format).
That key drives the idempotency gate (P3) and every versioned artifact
path.

Source acquisition is a DRIVER-side concern, not a cluster op: one
archive lands in a staging directory, then Spark reads the staged bytes
(sources/zip_staging.py → readers.py). At 100 TB the equivalent is a
fleet of object-store URLs listed into a manifest and read by
``spark.read`` directly — the version-key contract is unchanged.
"""

from __future__ import annotations

import shutil
import urllib.parse
import urllib.request
from dataclasses import dataclass
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from pathlib import Path


@dataclass(frozen=True)
class AcquiredArtifact:
    """One fetched source artifact: where it landed and its version key."""

    local_path: Path
    version: str          # RFC3339, from Last-Modified (fetch.go:48)
    last_modified: datetime


def rfc1123_to_rfc3339(value: str) -> str:
    """RFC1123 header value → RFC3339 version key (fetch.go:180-187).

    ``Mon, 02 Jan 2006 15:04:05 GMT`` → ``2006-01-02T15:04:05Z``.
    """
    return parse_last_modified(value).strftime("%Y-%m-%dT%H:%M:%SZ")


def parse_last_modified(value: str) -> datetime:
    dt = parsedate_to_datetime(value)
    if dt.tzinfo is None:  # RFC1123 dates are GMT; be explicit
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def fetch_artifact(
    url: str, staging_dir: str | Path, filename: str | None = None
) -> AcquiredArtifact:
    """GET ``url`` into ``staging_dir`` and key it by Last-Modified.

    Mirrors fetch.go:35-48: the body streams to disk (no full buffer in
    memory — improving on the reference's ``bytes.Buffer``), and a missing
    ``Last-Modified`` header is a LOUD failure, the same closed-world
    discipline as the ingest type map: a silent fallback key would break
    the idempotency contract (two different snapshots could collide on
    one key).
    """
    staging = Path(staging_dir)
    staging.mkdir(parents=True, exist_ok=True)
    name = filename or (Path(urllib.parse.urlparse(url).path).name or "artifact")
    dest = staging / name

    with urllib.request.urlopen(url) as resp:  # noqa: S310 — caller-supplied source URL
        header = resp.headers.get("Last-Modified")
        if header is None:
            raise ValueError(
                f"source {url!r} sent no Last-Modified header; cannot derive "
                "a version key (supply one explicitly to run_pipeline)"
            )
        last_modified = parse_last_modified(header)
        with open(dest, "wb") as f:
            shutil.copyfileobj(resp, f)

    return AcquiredArtifact(
        local_path=dest,
        version=last_modified.strftime("%Y-%m-%dT%H:%M:%SZ"),
        last_modified=last_modified,
    )
