"""S5 HTTP fetch path: a real local HTTP server serves an index page and
month folders; tests cover folder-pattern filtering, retry-with-backoff
on transient 500s, permanent-failure skip, and the landed files feeding
one tolerant CSV read (the reference flow end-to-end)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from fresco_hpc_spark.sources import (
    discover_http_folders,
    fetch_http_files,
    read_csv_tolerant,
)

INDEX_HTML = """
<html><body>
<a href="2024-01/">2024-01/</a>
<a href="2024-02/">2024-02/</a>
<a href="2023-12/">2023-12/</a>
<a href="notes/">notes/</a>
<a href="README.txt">README.txt</a>
</body></html>
"""

CSV_BODY = "node,value\nn1,1.5\nn2,2.5\n"


class _Handler(BaseHTTPRequestHandler):
    # class-level mutable state, reset per server
    fail_first: dict[str, int] = {}
    hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 (stdlib API name)
        path = self.path
        _Handler.hits[path] = _Handler.hits.get(path, 0) + 1
        remaining = _Handler.fail_first.get(path, 0)
        if remaining > 0:
            _Handler.fail_first[path] = remaining - 1
            self.send_response(500)
            self.end_headers()
            return
        if path == "/":
            body = INDEX_HTML.encode()
        elif path.endswith(".csv") and "empty" in path:
            body = b""  # 200 OK but zero bytes: fails the non-empty check
        elif path.endswith(".csv") and "missing" not in path:
            body = CSV_BODY.encode()
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence test output
        pass


@pytest.fixture()
def http_base():
    _Handler.fail_first = {}
    _Handler.hits = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    thread.join(timeout=5)


def test_discover_filters_month_folders(http_base):
    assert discover_http_folders(http_base + "/") == [
        "2023-12",
        "2024-01",
        "2024-02",
    ]
    assert discover_http_folders(http_base + "/", folder_pattern=r"^2024-") == [
        "2024-01",
        "2024-02",
    ]


def test_fetch_retries_transient_failure_with_backoff(http_base, tmp_path):
    _Handler.fail_first["/2024-01/cpu.csv"] = 2  # two 500s, then success
    sleeps: list[float] = []
    landed = fetch_http_files(
        http_base,
        ["2024-01"],
        ["cpu.csv"],
        str(tmp_path),
        max_retries=3,
        sleep=sleeps.append,
    )
    assert landed == [str(tmp_path / "2024-01" / "cpu.csv")]
    assert (tmp_path / "2024-01" / "cpu.csv").read_text() == CSV_BODY
    assert sleeps == [1.0, 2.0]  # 2^0, 2^1 exponential backoff
    assert _Handler.hits["/2024-01/cpu.csv"] == 3


def test_fetch_skips_permanently_failing_file(http_base, tmp_path):
    sleeps: list[float] = []
    landed = fetch_http_files(
        http_base,
        ["2024-01"],
        ["cpu.csv", "missing.csv"],
        str(tmp_path),
        max_retries=3,
        sleep=sleeps.append,
    )
    # folder succeeds if at least one file landed (reference semantics)
    assert landed == [str(tmp_path / "2024-01" / "cpu.csv")]
    assert sleeps == [1.0, 2.0]  # the 404 path exhausted its retries
    assert _Handler.hits["/2024-01/missing.csv"] == 3


def test_failed_fetch_leaves_no_file_in_landing_dir(http_base, tmp_path):
    """A download that always fails the non-empty check must leave
    NOTHING under the final name (or a .part) in the landing dir — a
    consumer globbing the dir would otherwise ingest a truncated file."""
    landed = fetch_http_files(
        http_base,
        ["2024-01"],
        ["empty.csv"],
        str(tmp_path),
        max_retries=2,
        sleep=lambda s: None,
    )
    assert landed == []
    assert not (tmp_path / "2024-01" / "empty.csv").exists()
    assert not (tmp_path / "2024-01" / "empty.csv.part").exists()


def test_fetched_files_feed_one_spark_read(http_base, tmp_path, spark):
    landed = fetch_http_files(
        http_base,
        ["2024-01", "2024-02"],
        ["cpu.csv"],
        str(tmp_path),
        sleep=lambda s: None,
    )
    assert len(landed) == 2
    df = read_csv_tolerant(spark, landed)
    assert df.count() == 4  # 2 data rows x 2 files, header stripped
    assert set(df.columns) >= {"node", "value"}
