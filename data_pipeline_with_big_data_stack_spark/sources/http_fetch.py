"""Driver-side HTTP acquisition (SURVEY §2.1 S1) + NetCDF magic checks.

The reference streams remote ``.nc`` files in 8 KB chunks to a landing
dir, skipping empty/failed downloads and counting successes
(``goes_satellite_etl.py:47-118``, chunking :81-88), and validates
NetCDF magic bytes (``CDF``/``\\x89HDF``) in its test scripts
(``test_citic_download_v2.py:69-77``). This is an acquisition step, not
a distributed operator — it runs driver-side (or in a tiny Airflow-like
task) and hands the landing dir to the `binaryFile` scan. Works with
any urllib-supported scheme (https://, file:// for tests).
"""

from __future__ import annotations

import os
import urllib.request
from dataclasses import dataclass

CHUNK_BYTES = 8192
NC_MAGICS = (b"CDF", b"\x89HDF", b"FAKENC1\n")  # real formats + test fixture


@dataclass(frozen=True)
class FetchResult:
    url: str
    path: str | None
    ok: bool
    n_bytes: int
    reason: str = ""


def is_netcdf_bytes(head: bytes) -> bool:
    """Magic-byte validation (`test_citic_download_v2.py:69-77`)."""
    return any(head.startswith(m) for m in NC_MAGICS)


def fetch_file(url: str, dest_dir: str, validate_magic: bool = False) -> FetchResult:
    """Stream one file in CHUNK_BYTES chunks; empty or failed downloads
    are recorded, never raised (the reference skips and counts)."""
    os.makedirs(dest_dir, exist_ok=True)
    name = url.rstrip("/").rsplit("/", 1)[-1] or "download"
    dest = os.path.join(dest_dir, name)
    try:
        with urllib.request.urlopen(url, timeout=60) as resp:
            head = b""
            n = 0
            with open(dest, "wb") as out:
                while True:
                    chunk = resp.read(CHUNK_BYTES)
                    if not chunk:
                        break
                    if n == 0:
                        head = chunk[:8]
                    out.write(chunk)
                    n += len(chunk)
    except Exception as exc:
        return FetchResult(url, None, False, 0, f"fetch failed: {exc}")
    if n == 0:
        os.remove(dest)
        return FetchResult(url, None, False, 0, "empty download")
    if validate_magic and not is_netcdf_bytes(head):
        os.remove(dest)
        return FetchResult(url, None, False, n, "magic-byte check failed")
    return FetchResult(url, dest, True, n)


def fetch_all(
    urls: list[str], dest_dir: str, validate_magic: bool = False
) -> tuple[list[FetchResult], int]:
    """Fetch a manifest of URLs; returns (results, success_count) — the
    reference's downloaded-files counter (:93-98)."""
    results = [fetch_file(u, dest_dir, validate_magic) for u in urls]
    return results, sum(1 for r in results if r.ok)


def parse_webdav_listing(
    xml: str, base_url: str = "", suffix: str = ".nc"
) -> list[str]:
    """S2: extract file URLs from a WebDAV PROPFIND (Depth:1) response.

    The reference parses hrefs with both an XML walk and a regex-findall
    fallback (`test_citic_download_v2.py:344-438`, regex variant
    `:146-158`); this is the regex form — resilient to namespace
    variations — with the reference's dedupe+sort (F19).

    Hrefs stay PERCENT-ENCODED in the returned URLs: a decoded name
    containing ' ', '#', '?' or a literal '%' would produce an invalid
    or ambiguous URL when later fetched ('%20' must not become a space,
    '%23' must not become a fragment separator). Decoding is only used
    for the suffix match, so an escaped extension ('file%2Enc') is still
    recognized. Use ``urllib.parse.unquote`` on the result for display.
    """
    import re
    from urllib.parse import unquote, urljoin

    hrefs = re.findall(r"<[^>]*href[^>]*>([^<]+)</[^>]*href[^>]*>", xml, re.IGNORECASE)
    out = set()
    for h in hrefs:
        h = h.strip()
        if not unquote(h).lower().endswith(suffix.lower()):
            continue
        out.add(urljoin(base_url, h) if base_url else h)
    return sorted(out)
