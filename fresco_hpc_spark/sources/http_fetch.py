"""HTTP ingest path (SURVEY.md §2.1 S5 — the fetch half).

The reference scrapes an HTTP index page for ``YYYY-MM`` folder links and
downloads each folder's CSVs with a thread pool, 3 retries and
exponential backoff per file (extractors/http_extractor.py:111-173), then
feeds the local files to its parser. Spark restatement: the DOWNLOAD is a
driver-side metadata-scale operation (a few files per month folder) into
a landing directory; the PARSE/PROCESS parallelism belongs to Spark — the
returned paths feed one ``read_csv_tolerant`` call, not a per-file loop.

Stdlib only (urllib + html.parser + ThreadPoolExecutor): no ``requests``
dependency, same behavior — streaming writes, UA header, retry with
2^attempt backoff, non-empty verification, per-folder success if at
least one file landed.
"""

from __future__ import annotations

import re
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor, as_completed
from html.parser import HTMLParser
from pathlib import Path

MONTH_LINK_RE = r"^\d{4}-\d{2}/?$"
_UA = {"User-Agent": "fresco-hpc-spark/1.0"}


class _HrefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def discover_http_folders(
    base_url: str,
    folder_pattern: str | None = None,
    timeout: int = 30,
) -> list[str]:
    """Scrape ``base_url``'s index page for folder links matching
    ``folder_pattern`` (default: ``YYYY-MM``), sorted chronologically —
    the reference's FolderDiscovery (http_extractor.py:178-220)."""
    pattern = re.compile(folder_pattern or MONTH_LINK_RE)
    req = urllib.request.Request(base_url, headers=_UA)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        html = resp.read().decode("utf-8", errors="replace")
    parser = _HrefParser()
    parser.feed(html)
    return sorted(
        {h.rstrip("/") for h in parser.hrefs if pattern.match(h)}
    )


def _download_one(
    url: str,
    local_path: Path,
    max_retries: int,
    timeout: int,
    sleep: Callable[[float], None],
) -> bool:
    """One file with retry + exponential backoff (2^attempt seconds) and
    a non-empty-file check — http_extractor.py:119-152 semantics.

    Streams into ``<name>.part`` and renames on success, so the landing
    dir never contains a truncated file under the final name: a consumer
    that globs the landing dir (rather than using the returned paths)
    can't ingest a half-written download."""
    part = local_path.with_name(local_path.name + ".part")
    for attempt in range(max_retries):
        try:
            req = urllib.request.Request(url, headers=_UA)
            local_path.parent.mkdir(parents=True, exist_ok=True)
            with urllib.request.urlopen(req, timeout=timeout) as resp, open(
                part, "wb"
            ) as out:
                while True:
                    chunk = resp.read(8192)
                    if not chunk:
                        break
                    out.write(chunk)
            if part.exists() and part.stat().st_size > 0:
                part.replace(local_path)
                return True
            raise OSError("downloaded file is empty or missing")
        except Exception:
            if attempt < max_retries - 1:
                sleep(float(2**attempt))
            else:
                part.unlink(missing_ok=True)
                return False
    return False


def fetch_http_files(
    base_url: str,
    folders: list[str],
    file_names: list[str],
    landing_dir: str,
    max_workers: int = 4,
    max_retries: int = 3,
    timeout: int = 300,
    sleep: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Download ``folders × file_names`` into ``landing_dir/<folder>/``
    with a bounded thread pool; returns the LOCAL paths that actually
    landed (sorted). Failed files are skipped after retries — the
    reference keeps a folder if at least one of its files downloaded.
    The result list is meant to be passed, whole, to ONE
    ``read_csv_tolerant(spark, paths)`` call: Spark parallelizes the
    parse, the pool only parallelizes the network wait.

    ``sleep`` is injectable so tests can pin the backoff schedule
    without real waiting.
    """
    base = base_url.rstrip("/")
    landing = Path(landing_dir)
    tasks: list[tuple[str, Path]] = []
    for folder in folders:
        for name in file_names:
            tasks.append((f"{base}/{folder}/{name}", landing / folder / name))
    landed: list[str] = []
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {
            pool.submit(
                _download_one, url, path, max_retries, timeout, sleep
            ): path
            for url, path in tasks
        }
        for fut in as_completed(futures):
            if fut.result():
                landed.append(str(futures[fut]))
    return sorted(landed)
