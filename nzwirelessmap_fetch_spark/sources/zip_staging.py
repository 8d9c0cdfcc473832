"""Zip acquisition + member staging (reference P6/P7, fetch.go:83-124).

Source acquisition is a driver-side concern, not a cluster operator — the
reference does the same (one HTTP GET + an in-memory zip scan). The member
search is a linear scan for an exact name, mirroring ``findPrismMdb``
(fetch.go:278-285) including its not-found error contract.
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path


def find_member(zf: zipfile.ZipFile, name: str) -> zipfile.ZipInfo:
    """Linear scan for an exact member name (fetch.go:278-285 parity)."""
    for info in zf.infolist():
        if info.filename == name:
            return info
    raise FileNotFoundError(f"couldn't find {name} in zip")


def stage_tree(
    zip_path: str | Path, prefix: str, staging_dir: str | Path
) -> Path:
    """P6/P7 generalized to DIRECTORY-shaped database artifacts: an
    embedded Derby (or RocksDB/LevelDB-style) database is a directory of
    files, so the zip member is a tree under ``prefix`` rather than the
    reference's single ``prism.mdb`` file (the degenerate one-member
    case). Extracts the subtree to ``staging_dir`` preserving relative
    layout and returns the staged root. Zip-slip guarded."""
    staging = Path(staging_dir)
    staging.mkdir(parents=True, exist_ok=True)
    root = staging.resolve()
    with zipfile.ZipFile(zip_path) as zf:
        names = [
            n
            for n in zf.namelist()
            if n.startswith(prefix) and not n.endswith("/")
        ]
        if not names:
            raise FileNotFoundError(f"couldn't find {prefix}* in zip")
        for n in names:
            rel = n[len(prefix) :].lstrip("/")
            dest = (staging / rel).resolve()
            if not dest.is_relative_to(root):  # zip-slip
                raise ValueError(f"unsafe zip member path: {n}")
            dest.parent.mkdir(parents=True, exist_ok=True)
            with zf.open(n) as src, open(dest, "wb") as out:
                shutil.copyfileobj(src, out)
    return staging


def stage_member(zip_path: str | Path, member: str, staging_dir: str | Path) -> Path:
    """Extract one member to a real file (the downstream tool in the
    reference requires a real path — fetch.go:96-116; parquet/JDBC readers
    here are the same)."""
    staging = Path(staging_dir)
    staging.mkdir(parents=True, exist_ok=True)
    out = staging / Path(member).name
    with zipfile.ZipFile(zip_path) as zf:
        info = find_member(zf, member)
        with zf.open(info) as src, open(out, "wb") as dst:
            shutil.copyfileobj(src, dst)
    return out
