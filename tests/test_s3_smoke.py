"""Live s3:// smoke against a MinIO-compatible localhost endpoint
(VERDICT r7 item 5): the driver-side boto3 fetch path exercised for
real — HEAD size guard, GetObject download, sniff → profile round-trip.
The endpoint is a stdlib HTTP server speaking just enough of the S3
REST dialect (path-style HEAD/GET on /bucket/key) for boto3; boto3
routes to it via AWS_ENDPOINT_URL. The s3a (distributed-scan) path
stays jar-blocked in this container — see SCALE.md §27 for the exact
coordinates and the recorded fetch attempt.
"""

from __future__ import annotations

import http.server
import os
import threading

import pytest

boto3 = pytest.importorskip("boto3")

CSV_BODY = b"a,b,c\n1,x,0.5\n2,y,1.5\n3,z,2.5\n"


class _S3Handler(http.server.BaseHTTPRequestHandler):
    objects = {"/demo-bucket/tiny.csv": CSV_BODY}

    def _obj(self):
        return self.objects.get(self.path.split("?")[0])

    def do_HEAD(self):  # noqa: N802 (stdlib casing)
        body = self._obj()
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Content-Type", "binary/octet-stream")
        self.send_header("ETag", '"deadbeef"')
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):  # noqa: N802
        body = self._obj()
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("ETag", '"deadbeef"')
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def s3_endpoint(monkeypatch):
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _S3Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    monkeypatch.setenv("AWS_ENDPOINT_URL", url)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "smoke")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "smoke")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    # force path-style so /bucket/key hits the handler verbatim
    monkeypatch.setenv("AWS_S3_ADDRESSING_STYLE", "path")
    yield url
    srv.shutdown()


def test_s3_fetch_sniff_profile(spark, s3_endpoint):
    from dataprofiler_spark.sources.sniff import read_data
    from dataprofiler_spark.sources.url import clear_fetch_cache

    clear_fetch_cache()
    df, res = read_data(spark, "s3://demo-bucket/tiny.csv")
    assert res.format == "csv" and res.options["header"] is True
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 3


def test_s3_size_guard(s3_endpoint):
    from dataprofiler_spark.sources.url import clear_fetch_cache, url_to_local

    clear_fetch_cache()
    with pytest.raises(ValueError, match="fetch guard"):
        url_to_local("s3://demo-bucket/tiny.csv", max_bytes=4)


def test_s3_missing_object(s3_endpoint):
    from dataprofiler_spark.sources.url import clear_fetch_cache, url_to_local

    clear_fetch_cache()
    with pytest.raises(Exception):  # botocore ClientError (404)
        url_to_local("s3://demo-bucket/absent.csv")
