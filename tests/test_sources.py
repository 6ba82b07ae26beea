"""Source-reader tests: CSV directory, JSON objects, web-log regex,
NetCDF plumbing (fixture format), archive semantics, manifest discovery."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.sources import files as fsrc
from data_pipeline_with_big_data_stack_spark.sources import netcdf as ncsrc


def test_csv_directory(spark, tmp_path):
    (tmp_path / "a.csv").write_text("x,y\n1,foo\n2,bar\n")
    (tmp_path / "b.csv").write_text("x,y\n3,baz\n")
    (tmp_path / "ignore.txt").write_text("not a csv")
    df = fsrc.csv_directory(spark, str(tmp_path))
    rows = df.orderBy("x").collect()
    assert [r["x"] for r in rows] == [1, 2, 3]
    assert {r["source_file"] for r in rows} == {"a.csv", "b.csv"}
    assert all(r["timestamp"] > 0 for r in rows)


def test_json_objects_array_explode(spark, tmp_path):
    (tmp_path / "batch1.json").write_text(
        json.dumps([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    )
    (tmp_path / "batch2.json").write_text(json.dumps([{"id": 3, "v": "c"}]))
    df = fsrc.json_objects(spark, str(tmp_path))
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert rows[0]["file_name"] == "batch1.json"


def test_web_access_logs(spark, tmp_path):
    good = (
        '192.168.1.1 - - [01/Jul/2025:10:00:00 +0000] "GET /api/users HTTP/1.1" '
        '200 1234 "https://example.com" "Mozilla/5.0"'
    )
    dash_size = (
        '10.0.0.2 - - [01/Jul/2025:10:00:01 +0000] "POST /login HTTP/1.1" '
        '302 - "-" "curl/8.0"'
    )
    (tmp_path / "access.log").write_text(f"{good}\n{dash_size}\nmalformed line\n")
    df = fsrc.web_access_logs(spark, str(tmp_path))
    rows = df.orderBy("ip_address").collect()
    assert len(rows) == 2  # malformed line filtered
    r_post = [r for r in rows if r["method"] == "POST"][0]
    assert r_post["status_code"] == 302 and r_post["response_size"] == 0
    r_get = [r for r in rows if r["method"] == "GET"][0]
    assert r_get["url"] == "/api/users" and r_get["response_size"] == 1234
    assert r_get["user_agent"] == "Mozilla/5.0"


def _write_fake_nc(path, n=30, start=1_700_000_000, missing_var=False, sunpy_shape=False):
    vars_ = {
        "xrsa_short": [1e-7 + i * 1e-9 for i in range(n)],  # synonym for xrsa1
        "irradiance_xrsb1": [2e-8] * n,
    }
    if not missing_var:
        vars_["dispersion_angle"] = [float(i) for i in range(n)]
    payload = {"variables": vars_}
    if not sunpy_shape:
        payload["variables"]["time"] = [i * 10 for i in range(n)]
        payload["units"] = "seconds since 2023-11-14 22:13:20"
    path.write_bytes(ncsrc.FAKE_MAGIC + json.dumps(payload).encode())


def test_netcdf_directory_scan(spark, tmp_path):
    _write_fake_nc(tmp_path / "OR_EXIS-L1b-SFXR_G18_s1_e1_c1.nc", n=30)
    _write_fake_nc(tmp_path / "OR_EXIS-L1b-SFXR_G18_s2_e2_c2.nc", n=30)
    df = ncsrc.read_netcdf_directory(spark, str(tmp_path))
    assert df.count() == 60
    prof = df.groupBy("source_file").agg(F.count(F.lit(1)).alias("cnt")).collect()
    assert all(r["cnt"] == 30 for r in prof)  # GOES invariant: 30 rows/file
    row = df.filter(F.col("source_file").contains("s1")).orderBy("time").first()
    # synonym resolution: xrsa_short → irradiance_xrsa1
    assert abs(row["irradiance_xrsa1"] - 1e-7) < 1e-12
    # zero-fill for absent variables
    assert row["irradiance_xrsa2"] == 0.0
    # time decode: units offset applied (2023-11-14 22:13:20 = 1700000000)
    assert row["time"] == 1_700_000_000
    assert row["product_time"] == "s1"


def test_netcdf_sunpy_fallback_shape(spark, tmp_path):
    _write_fake_nc(tmp_path / "OR_X_Y_s3_e3_c3.nc", n=5, sunpy_shape=True)
    df = ncsrc.read_netcdf_directory(spark, str(tmp_path), extraction_ts=1_000_000)
    rows = df.orderBy("time").collect()
    assert len(rows) == 5
    assert rows[-1]["time"] == 1_000_000  # 10 s cadence ending at extraction
    assert rows[0]["time"] == 1_000_000 - 40


def test_netcdf_hdf5_truncated_bytes_raise(spark, tmp_path):
    # NetCDF-4/HDF5 decodes natively (sources/hdf5lite.py, exercised on
    # real + hand-built fixtures in tests/test_hdf5lite.py); a truncated
    # HDF5 header must still surface a decode error, not silent rows
    (tmp_path / "real.nc").write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 100)
    df = ncsrc.read_netcdf_directory(spark, str(tmp_path))
    import pytest

    with pytest.raises(Exception, match="superblock|H5|version"):
        df.collect()


def test_netcdf3_empty_header_yields_zero_rows(spark, tmp_path):
    # a valid classic header with no variables decodes to zero records
    # (not an error) — the scan/flatten plumbing tolerates empty files
    (tmp_path / "empty.nc").write_bytes(
        b"CDF\x01" + b"\x00" * 4 + b"\x00" * 8 + b"\x00" * 8 + b"\x00" * 8
    )
    assert ncsrc.read_netcdf_directory(spark, str(tmp_path)).count() == 0


def test_archive_processed(tmp_path):
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "f1.csv").write_text("x\n1\n")
    moved = fsrc.archive_processed(str(src_dir), str(tmp_path / "done"), ["f1.csv"])
    assert len(moved) == 1
    assert not (src_dir / "f1.csv").exists()
    assert (tmp_path / "done" / "f1.csv").exists()


def test_discover_manifest(spark):
    df = ncsrc.discover_manifest(
        spark, ["b.nc", "a.nc", "a.nc", "skip.txt", "c.nc"]
    )
    assert [r["path"] for r in df.collect()] == ["a.nc", "b.nc", "c.nc"]


def test_netcdf_none_values_zero_filled(spark, tmp_path):
    """Masked-array/JSON-null values must zero-fill per value, not crash
    (reference wraps each float() in try/except -> 0.0)."""
    import json as _json

    payload = {
        "units": "seconds since 2023-04-26 00:00:00",
        "variables": {"time": [0, 10, 20], "xrsa1": [1e-7, None, 3e-7]},
    }
    (tmp_path / "OR_X_G18_sN_eN_cN.nc").write_bytes(
        b"FAKENC1\n" + _json.dumps(payload).encode()
    )
    rows = (
        ncsrc.read_netcdf_directory(spark, str(tmp_path))
        .orderBy("time")
        .select("irradiance_xrsa1")
        .collect()
    )
    assert [r[0] for r in rows] == [1e-7, 0.0, 3e-7]


def test_netcdf_bad_units_falls_back_to_cadence(spark, tmp_path):
    """'unknown' units (the reference's own missing-attr default) must
    fall back to the extraction-anchored 10 s cadence, not crash."""
    import json as _json

    payload = {"units": "unknown", "variables": {"time": [0, 1, 2]}}
    (tmp_path / "OR_X_G18_sU_eU_cU.nc").write_bytes(
        b"FAKENC1\n" + _json.dumps(payload).encode()
    )
    rows = (
        ncsrc.read_netcdf_directory(spark, str(tmp_path), extraction_ts=1_000_000)
        .orderBy("time")
        .collect()
    )
    assert [r["time"] for r in rows] == [999_980, 999_990, 1_000_000]


def test_netcdf_units_variants(spark, tmp_path):
    """Minute/day offset units and trailing ' UTC' zone words decode
    correctly instead of being misread as seconds / crashing."""
    import json as _json

    payload = {
        "units": "minutes since 1970-01-01 00:00:00 UTC",
        "variables": {"time": [0, 1], "xrsa1": [1e-7, 2e-7]},
    }
    (tmp_path / "OR_X_G18_sM_eM_cM.nc").write_bytes(
        b"FAKENC1\n" + _json.dumps(payload).encode()
    )
    rows = ncsrc.read_netcdf_directory(spark, str(tmp_path)).orderBy("time").collect()
    assert [r["time"] for r in rows] == [0, 60]


def test_discover_manifest_empty(spark):
    assert ncsrc.discover_manifest(spark, []).count() == 0


def test_http_fetch_chunked_with_magic_validation(spark, tmp_path):
    """S1: chunked fetch over file:// URLs — success counting, empty-file
    skip, magic validation, then straight into the binaryFile scan."""
    import os

    from data_pipeline_with_big_data_stack_spark.sources import http_fetch

    src = tmp_path / "remote"
    src.mkdir()
    good = src / "OR_X_G18_sA_eA_cA.nc"
    good.write_bytes(
        b"FAKENC1\n"
        + json.dumps(
            {"units": "seconds since 1970-01-01 00:00:00",
             "variables": {"time": [0, 10], "xrsa1": [1e-7, 2e-7]},
             "pad": "x" * 20000}  # force multiple 8 KB chunks
        ).encode()
    )
    (src / "empty.nc").write_bytes(b"")
    (src / "notnc.nc").write_bytes(b"<html>error page</html>")

    landing = str(tmp_path / "landing")
    urls = [f"file://{src}/{n}" for n in ("OR_X_G18_sA_eA_cA.nc", "empty.nc", "notnc.nc")]
    results, n_ok = http_fetch.fetch_all(urls, landing, validate_magic=True)
    assert n_ok == 1
    reasons = {r.url.rsplit('/', 1)[-1]: r.reason for r in results if not r.ok}
    assert reasons["empty.nc"] == "empty download"
    assert "magic" in reasons["notnc.nc"]
    # rejected files are not left in the landing dir
    assert sorted(os.listdir(landing)) == ["OR_X_G18_sA_eA_cA.nc"]
    # and the landing dir feeds the distributed scan
    df = ncsrc.read_netcdf_directory(spark, landing)
    assert df.count() == 2


def test_webdav_listing_parse(spark):
    """S2: PROPFIND XML → deduped, sorted, URL-decoded .nc manifest,
    ready for discover_manifest + the fetch step."""
    from data_pipeline_with_big_data_stack_spark.sources import http_fetch

    xml = """<?xml version="1.0"?>
    <d:multistatus xmlns:d="DAV:">
      <d:response><d:href>/remote.php/dav/files/goes/</d:href></d:response>
      <d:response><d:href>/remote.php/dav/files/goes/OR_EXIS-L1b-SFXR_G18_s1.nc</d:href></d:response>
      <d:response><d:href>/remote.php/dav/files/goes/OR_EXIS%2DL1b_s2.nc</d:href></d:response>
      <d:response><d:href>/remote.php/dav/files/goes/readme.txt</d:href></d:response>
      <d:response><d:href>/remote.php/dav/files/goes/OR_EXIS-L1b-SFXR_G18_s1.nc</d:href></d:response>
    </d:multistatus>"""
    got = http_fetch.parse_webdav_listing(xml, base_url="https://cloud.example.org")
    # hrefs stay percent-encoded in the fetch URLs ('%2D' preserved)
    assert got == [
        "https://cloud.example.org/remote.php/dav/files/goes/OR_EXIS%2DL1b_s2.nc",
        "https://cloud.example.org/remote.php/dav/files/goes/OR_EXIS-L1b-SFXR_G18_s1.nc",
    ]
    # manifest DataFrame twin
    from data_pipeline_with_big_data_stack_spark.sources import netcdf

    assert netcdf.discover_manifest(spark, got).count() == 2


def test_webdav_listing_keeps_hostile_names_encoded():
    """Encoded spaces / '#' / '%' / '?' must survive into the URL —
    decoding them would break or ambiguate the later fetch; an encoded
    extension ('%2Enc') must still match the suffix filter."""
    from data_pipeline_with_big_data_stack_spark.sources import http_fetch

    xml = """
    <d:multistatus xmlns:d="DAV:">
      <d:response><d:href>/dav/sat%20file.nc</d:href></d:response>
      <d:response><d:href>/dav/frag%23mark.nc</d:href></d:response>
      <d:response><d:href>/dav/pct%25sign.nc</d:href></d:response>
      <d:response><d:href>/dav/query%3Fq.nc</d:href></d:response>
      <d:response><d:href>/dav/esc_ext%2Enc</d:href></d:response>
      <d:response><d:href>/dav/plain.txt</d:href></d:response>
    </d:multistatus>"""
    got = http_fetch.parse_webdav_listing(xml, base_url="https://h.example")
    assert got == [
        "https://h.example/dav/esc_ext%2Enc",
        "https://h.example/dav/frag%23mark.nc",
        "https://h.example/dav/pct%25sign.nc",
        "https://h.example/dav/query%3Fq.nc",
        "https://h.example/dav/sat%20file.nc",
    ]


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from data_pipeline_with_big_data_stack_spark.sources.files import read_orc_table, write_orc_table
    from data_pipeline_with_big_data_stack_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events")
    dst = str(tmp_path / "events_orc")
    write_orc_table(events, dst)
    back = read_orc_table(spark, dst)
    assert back.count() == events.count()
    assert back.schema == events.schema
    # predicate + projection reach the ORC scan
    q = back.filter(back.event_type == "view").select("user_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan
    got = {r.event_type for r in back.filter(back.event_type == "view").select("event_type").distinct().collect()}
    assert got == {"view"}
