"""Classic NetCDF-3 decode: the flagship ingest on REAL binary input.

The reader (`sources/netcdf3.py`) and the test writer (`tests/nc3_writer.py`)
are independent implementations of the public Unidata classic-format
spec, so round-trips genuinely exercise the byte layout. The committed
fixtures in `tests/fixtures/` pin the format on disk — a reader
regression can't be masked by a writer change.

Reference shape: 30 records per file, GROUP BY source_file → COUNT(*)=30
(M/GOES_PIPELINE_REPORT.md:285-289); record fields and NaN→0.0 policy
per goes_satellite_etl.py:267-289.
"""

from __future__ import annotations

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.sources.netcdf3 import parse_netcdf3
from data_pipeline_with_big_data_stack_spark.sources.netcdf import read_netcdf_directory
from tests.nc3_writer import write_nc3

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
NAN = float("nan")


def goes_file(n=30, units="seconds since 2023-04-26 00:00:00", version=1) -> bytes:
    """A reference-shaped satellite file: record dim + 1 fixed dim,
    synonym variable names, one missing canonical var (zero-fill path),
    NaNs in the data (NaN→0.0 policy), a char label variable."""
    time = [10.0 * i for i in range(n)]
    return write_nc3(
        dims=[("time", 0), ("strlen", 9)],
        variables=[
            {
                "name": "time",
                "dims": [0],
                "type": 6,
                "attrs": {"units": (2, units)},
                "data": time,
            },
            # synonym names, mixed types
            {"name": "xrsa1", "dims": [0], "type": 6,
             "data": [1e-7 * (i + 1) for i in range(n)]},
            {"name": "xrsb_long", "dims": [0], "type": 5,
             "data": [2.5e-8 * (i + 1) for i in range(n)]},
            {"name": "primary_chan", "dims": [0], "type": 6,
             "data": [NAN if i % 7 == 0 else 3e-8 * i for i in range(n)]},
            {"name": "disp_angle", "dims": [0], "type": 6,
             "data": [12.0 * (i % 30) for i in range(n)]},
            {"name": "int_time", "dims": [0], "type": 4,
             "data": [(i % 9) + 1 for i in range(n)]},
            # char record var: (time, strlen) → one string per record
            {"name": "chan_label", "dims": [0, 1], "type": 2,
             "data": "".join(f"channel_{i % 4}" for i in range(n))},
        ],
        numrecs=n,
        global_attrs={"title": (2, "EXIS L1b SFXR synthetic")},
        version=version,
    )


class TestReaderWriterRoundTrip:
    @pytest.mark.parametrize("version", [1, 2])
    def test_goes_shape_round_trip(self, version):
        variables, var_attrs, gatts = parse_netcdf3(goes_file(version=version))
        assert variables["time"] == [10.0 * i for i in range(30)]
        assert var_attrs["time"]["units"] == "seconds since 2023-04-26 00:00:00"
        assert gatts["title"] == "EXIS L1b SFXR synthetic"
        assert variables["chan_label"][:4] == [
            "channel_0", "channel_1", "channel_2", "channel_3"
        ]
        assert variables["int_time"] == [(i % 9) + 1 for i in range(30)]
        assert math.isnan(variables["primary_chan"][0])
        # float32 round-trips at float32 precision
        assert variables["xrsb_long"][1] == pytest.approx(5e-8, rel=1e-6)

    def test_fixed_vars_and_multiple_record_vars_padding(self):
        # short record var (2 bytes/record) forces the 4-byte record
        # padding path; a second record var checks interleaving
        content = write_nc3(
            dims=[("t", 0), ("k", 3)],
            variables=[
                {"name": "s", "dims": [0], "type": 3, "data": [1, -2, 3, -4]},
                {"name": "v", "dims": [0], "type": 4, "data": [10, 20, 30, 40]},
                {"name": "fixed", "dims": [1], "type": 6, "data": [1.5, 2.5, 3.5]},
            ],
            numrecs=4,
        )
        variables, _, _ = parse_netcdf3(content)
        assert variables["s"] == [1, -2, 3, -4]
        assert variables["v"] == [10, 20, 30, 40]
        assert variables["fixed"] == [1.5, 2.5, 3.5]

    def test_streaming_numrecs_inferred(self):
        content = bytearray(
            write_nc3(
                dims=[("t", 0)],
                variables=[{"name": "v", "dims": [0], "type": 4,
                            "data": [7, 8, 9]}],
                numrecs=3,
            )
        )
        content[4:8] = b"\xff\xff\xff\xff"  # STREAMING marker
        variables, _, _ = parse_netcdf3(bytes(content))
        assert variables["v"] == [7, 8, 9]

    def test_2d_numeric_flattens_row_major(self):
        content = write_nc3(
            dims=[("x", 2), ("y", 3)],
            variables=[{"name": "m", "dims": [0, 1], "type": 4,
                        "data": [1, 2, 3, 4, 5, 6]}],
        )
        variables, _, _ = parse_netcdf3(content)
        assert variables["m"] == [1, 2, 3, 4, 5, 6]

    def test_rejects_non_cdf(self):
        with pytest.raises(ValueError):
            parse_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


class TestPipelineOnRealFormat:
    def test_committed_fixture_through_spark_pipeline(self, spark, tmp_path):
        """The committed CDF fixtures decode through the full distributed
        path with the reference's 30-rows-per-file invariant."""
        src = [f for f in os.listdir(FIXTURE_DIR) if f.endswith(".nc")]
        assert len(src) >= 2
        for f in src:
            shutil.copy(os.path.join(FIXTURE_DIR, f), tmp_path / f)
        df = read_netcdf_directory(spark, str(tmp_path), extraction_ts=1_700_000_000)
        counts = {r["source_file"]: r["n"] for r in
                  df.groupBy("source_file")
                  .agg(F.count("*").alias("n")).collect()}
        assert counts == {f: 30 for f in src}
        rows = df.filter(df.source_file == sorted(src)[0]).orderBy("time").collect()
        # units decode: 10 s cadence from the 2023-04-26 reference time
        base = 1682467200  # 2023-04-26T00:00:00Z
        assert [r["time"] for r in rows] == [base + 10 * i for i in range(30)]
        # synonym resolution + NaN→0.0 + zero-fill of the absent var
        assert rows[1]["irradiance_xrsa1"] == pytest.approx(2e-7)
        assert rows[0]["primary_xrsb"] == 0.0  # was NaN
        assert all(r["irradiance_xrsa2"] == 0.0 for r in rows)  # missing var

    def test_no_units_falls_back_to_cadence(self, spark, tmp_path):
        content = write_nc3(
            dims=[("time", 0)],
            variables=[
                {"name": "time", "dims": [0], "type": 6,
                 "data": [float(i) for i in range(5)]},  # no units attr
                {"name": "xrsa1", "dims": [0], "type": 6,
                 "data": [0.1, 0.2, 0.3, 0.4, 0.5]},
            ],
            numrecs=5,
        )
        (tmp_path / "nounits.nc").write_bytes(content)
        rows = (
            read_netcdf_directory(spark, str(tmp_path), extraction_ts=2_000_000_000)
            .orderBy("time").collect()
        )
        # 'unknown'-units path: extraction-anchored 10 s cadence
        assert [r["time"] for r in rows] == [2_000_000_000 - 10 * i
                                             for i in range(4, -1, -1)]
