"""Remote-source fetch: http(s):// and file:// URLs resolved to local
files so the sniffer and Spark scans operate on them transparently.

Reference behavior: dataprofiler/data_readers/data_utils.py:863-1050
(``url_to_bytes`` / ``is_valid_url``): validate the URL, stream the body
in chunks with a size guard, transparently decompress a gzip
Content-Encoding, then hand the bytes to the normal format sniffing
path. Here the fetch lands in a temp file (Spark scans files, not
byte buffers) and is cached per-URL for the process lifetime so
``sniff`` + ``read_data`` on the same URL fetch once.

s3:// is import-gated on boto3 (live-tested against a localhost
MinIO-compatible endpoint in tests/test_s3_smoke.py): the scheme is
recognized and routed, and the error names the missing dependency
instead of failing inside a scan. At cluster scale the right path for
s3 is the Hadoop s3a connector on the Spark classpath (no driver-side
fetch at all) — this helper is the reference-parity single-file path.

s3a:// (and the other distributed-filesystem schemes: hdfs, gs, abfs,
wasb, oss) PASS THROUGH untouched: Spark's Hadoop connectors scan them
executor-side, which is the only sane shape at 100 TB — a driver-side
fetch of an object store is the anti-pattern. ``configure_s3a`` wires
the standard AWS credential env vars (AWS_ACCESS_KEY_ID,
AWS_SECRET_ACCESS_KEY, AWS_SESSION_TOKEN, AWS_ENDPOINT_URL) into the
session's Hadoop configuration; absent env vars leave the provider
chain (instance profile / IRSA) in charge, which is the usual
production setup.
"""

from __future__ import annotations

import os
import tempfile
import urllib.parse
import urllib.request

# Schemes Spark scans natively through Hadoop connectors — never fetch
# these driver-side; sniffing falls back to extension dispatch.
DISTRIBUTED_SCHEMES = ("s3a", "s3n", "hdfs", "gs", "abfs", "abfss",
                       "wasb", "wasbs", "oss")

# 1 GiB guard mirrors the reference's content-length check
# (data_utils.py:1000-1012): a driver-side fetch is for modest files;
# bigger data belongs on a distributed filesystem connector.
MAX_FETCH_BYTES = 1 << 30
_CHUNK = 1 << 20

_fetch_cache: dict[str, str] = {}


def is_url(path: str) -> bool:
    scheme = urllib.parse.urlparse(path).scheme.lower()
    return scheme in ("http", "https", "file", "s3") + DISTRIBUTED_SCHEMES


def is_distributed_uri(path: str) -> bool:
    """True for URIs Spark's Hadoop connectors scan executor-side
    (s3a://, hdfs://, gs://, ...) — these must pass through to
    spark.read untouched."""
    return urllib.parse.urlparse(path).scheme.lower() in DISTRIBUTED_SCHEMES


def configure_s3a(spark, endpoint: str | None = None) -> None:
    """Wire s3a credentials from the standard AWS env vars into the
    session's Hadoop configuration (hadoop-aws documented keys). With no
    env vars set this is a no-op and the default provider chain
    (instance profile, IRSA, ~/.aws) applies — the right production
    default. Call once per session before reading s3a:// paths."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    mapping = {
        "AWS_ACCESS_KEY_ID": "fs.s3a.access.key",
        "AWS_SECRET_ACCESS_KEY": "fs.s3a.secret.key",
        "AWS_SESSION_TOKEN": "fs.s3a.session.token",
        "AWS_ENDPOINT_URL": "fs.s3a.endpoint",
    }
    for env, key in mapping.items():
        val = os.environ.get(env)
        if val:
            hconf.set(key, val)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)
    if os.environ.get("AWS_SESSION_TOKEN"):
        hconf.set("fs.s3a.aws.credentials.provider",
                  "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")


def url_to_local(path: str, max_bytes: int = MAX_FETCH_BYTES,
                 timeout_seconds: float = 60.0) -> str:
    """Resolve a URL to a local filesystem path (fetching if remote).

    Non-URL paths pass through unchanged. Fetches are cached per-URL for
    the process lifetime (tempdir files).
    """
    parsed = urllib.parse.urlparse(path)
    scheme = parsed.scheme.lower()
    if scheme in ("", None) or (len(scheme) == 1 and os.name == "nt"):
        return path  # plain path (single letter = Windows drive)
    if scheme == "file":
        return urllib.request.url2pathname(parsed.path)
    if scheme in DISTRIBUTED_SCHEMES:
        return path  # Spark's Hadoop connector scans it executor-side
    if scheme == "s3":
        return _s3_to_local(parsed, max_bytes)
    if scheme not in ("http", "https"):
        return path
    if path in _fetch_cache and os.path.exists(_fetch_cache[path]):
        return _fetch_cache[path]
    local = None
    try:
        # socket timeout: a hung server must fail the read, not stall
        # the profile forever
        with urllib.request.urlopen(path, timeout=timeout_seconds) as resp:
            length = resp.headers.get("Content-Length")
            if length is not None and int(length) > max_bytes:
                raise ValueError(
                    f"remote file exceeds fetch guard: {length} bytes > "
                    f"{max_bytes} (use a distributed connector)")
            stream = resp
            gzipped = resp.headers.get("Content-Encoding") == "gzip"
            if gzipped:
                import gzip
                stream = gzip.GzipFile(fileobj=resp)
            suffix = os.path.splitext(parsed.path)[1][:16] or ".dat"
            if gzipped and suffix in (".gz", ".gzip"):
                # body arrives decompressed — a .gz filename would make
                # Hadoop's codec re-gunzip plain bytes at scan time
                suffix = os.path.splitext(
                    os.path.splitext(parsed.path)[0])[1][:16] or ".dat"
            fd, local = tempfile.mkstemp(prefix="dps_url_", suffix=suffix)
            out = os.fdopen(fd, "wb")
            total = 0
            with out:
                while True:
                    chunk = stream.read(_CHUNK)
                    if not chunk:
                        break
                    total += len(chunk)
                    if total > max_bytes:
                        raise ValueError(
                            f"remote file exceeds fetch guard after "
                            f"{total} bytes (use a distributed connector)")
                    out.write(chunk)
    except BaseException:
        if local is not None and os.path.exists(local):
            os.unlink(local)
        raise
    _fetch_cache[path] = local
    return local


def _s3_to_local(parsed, max_bytes: int) -> str:
    url = parsed.geturl()
    if url in _fetch_cache and os.path.exists(_fetch_cache[url]):
        return _fetch_cache[url]
    try:
        import boto3  # import-gated; present here (see tests/test_s3_smoke.py)
    except ImportError as e:
        raise ImportError(
            "s3:// sources need either boto3 (driver-side fetch) or the "
            "hadoop-aws s3a connector on the Spark classpath "
            "(distributed scan — preferred at scale)") from e
    suffix = os.path.splitext(parsed.path)[1][:16] or ".dat"
    fd, local = tempfile.mkstemp(prefix="dps_s3_", suffix=suffix)
    os.close(fd)
    try:
        s3 = boto3.client("s3")
        head = s3.head_object(Bucket=parsed.netloc,
                              Key=parsed.path.lstrip("/"))
        if head.get("ContentLength", 0) > max_bytes:
            raise ValueError("s3 object exceeds fetch guard")
        s3.download_file(parsed.netloc, parsed.path.lstrip("/"), local)
    except BaseException:
        os.unlink(local)
        raise
    _fetch_cache[url] = local
    return local


def clear_fetch_cache() -> None:
    for p in _fetch_cache.values():
        if os.path.exists(p):
            os.unlink(p)
    _fetch_cache.clear()
