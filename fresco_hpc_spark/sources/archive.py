"""S13 archive sink: zip + sha256 + manifest packaging of store output
(reference backend/lambda/generate_archives.py:105-238).

The reference's Lambda lists bucket objects, groups them by month
(``YYYY-MM``) and quarter (``YYYY-QN``) of their modification time,
zips each group (flat names, DEFLATE), records a sha256 checksum and
date range per archive, and writes an ``archives/index.json`` manifest.

Spark restatement: the DATA work (producing the files) is Spark's —
``write_chunked_parquet`` / ``export_csv`` — and packaging is a
driver-side METADATA-scale pass over the finished files (a few thousand
chunk files even at 100 TB, streamed one at a time through the zip
writer, so driver memory stays flat). No cloud SDK: paths are plain
directories, so the same code runs against a local staging dir or a
fuse/NFS mount of object storage.
"""

from __future__ import annotations

import hashlib
import json
import zipfile
from collections.abc import Callable
from datetime import datetime, timezone
from pathlib import Path


def _mtime(path: Path) -> datetime:
    return datetime.fromtimestamp(path.stat().st_mtime, tz=timezone.utc)


def month_key(ts: datetime) -> str:
    return ts.strftime("%Y-%m")


def quarter_key(ts: datetime) -> str:
    return f"{ts.year}-Q{(ts.month - 1) // 3 + 1}"


def _sha256_of(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 16), b""):
            h.update(chunk)
    return h.hexdigest()


def _create_archive(
    archive_type: str,
    name: str,
    files: list[Path],
    times: dict[Path, datetime],
    out_root: Path,
) -> dict:
    """One group → ``archives/<type>/<name>.zip`` + manifest entry
    (create_archive, generate_archives.py:106-180): flat arcnames,
    DEFLATE, streaming sha256, min/max mtime as the date range."""
    archive_dir = out_root / "archives" / archive_type
    archive_dir.mkdir(parents=True, exist_ok=True)
    archive_path = archive_dir / f"{name}.zip"
    with zipfile.ZipFile(archive_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(files):
            zf.write(f, f.name)
    dates = [times[f] for f in files]
    return {
        "path": f"archives/{archive_type}/{name}.zip",
        "size": archive_path.stat().st_size,
        "checksum": _sha256_of(archive_path),
        "start": min(dates).isoformat(),
        "end": max(dates).isoformat(),
        "object_count": len(files),
    }


def generate_archives(
    src_dir: str,
    out_dir: str,
    file_glob: str = "**/*",
    monthly: bool = True,
    quarterly: bool = True,
    time_of: Callable[[Path], datetime] = _mtime,
) -> list[dict]:
    """Package every file under ``src_dir`` into monthly and quarterly
    zip archives under ``out_dir/archives/`` and write the
    ``archives/index.json`` manifest; returns the manifest entries.

    ``time_of`` supplies each file's grouping timestamp (default: file
    mtime, the reference's LastModified) — inject a name-derived clock
    for deterministic pipelines/tests.
    """
    src = Path(src_dir)
    out = Path(out_dir)
    files = sorted(p for p in src.glob(file_glob) if p.is_file())
    manifest: list[dict] = []
    if files:
        times = {f: time_of(f) for f in files}
        plans: list[tuple[str, Callable[[datetime], str]]] = []
        if monthly:
            plans.append(("monthly", month_key))
        if quarterly:
            plans.append(("quarterly", quarter_key))
        for archive_type, key_fn in plans:
            groups: dict[str, list[Path]] = {}
            for f in files:
                groups.setdefault(key_fn(times[f]), []).append(f)
            for name in sorted(groups):
                manifest.append(
                    _create_archive(archive_type, name, groups[name], times, out)
                )
    index_dir = out / "archives"
    index_dir.mkdir(parents=True, exist_ok=True)
    (index_dir / "index.json").write_text(json.dumps(manifest, indent=2))
    return manifest
