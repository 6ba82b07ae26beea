"""Native HDF5 (netCDF-4) decode tests.

Two fixture classes cover the two on-disk layout families:

- the reference repo's real GOES EXIS download (v2 object headers,
  dense fractal-heap links, chunked+deflate+shuffle data) — golden
  values cross-checked against the reference's own report numbers
  (GOES_PIPELINE_REPORT.md:285-289: 30 records per file). Skipped when
  the reference checkout is absent (the file is NOT committed here).
- a hand-built old-style file (v1 headers, symbol-table group,
  contiguous data) from ``h5_mini_writer`` — committed, standalone.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from data_pipeline_with_big_data_stack_spark.sources.hdf5lite import parse_hdf5_netcdf
from data_pipeline_with_big_data_stack_spark.sources.netcdf import read_netcdf_directory
from tests.h5_mini_writer import write_minimal_hdf5

_REF_GLOB = "/root/reference/*/test_downloads/OR_EXIS-L1b-SFXR_*.nc"
_ref_files = sorted(glob.glob(_REF_GLOB))

needs_ref = pytest.mark.skipif(
    not _ref_files, reason="reference GOES fixture not present"
)


# ---------------------------------------------------------------------
# real GOES fixture (new-style layout)
# ---------------------------------------------------------------------


@needs_ref
class TestGoesFixture:
    @pytest.fixture(scope="class")
    def decoded(self):
        with open(_ref_files[0], "rb") as fh:
            return parse_hdf5_netcdf(fh.read())

    def test_thirty_timesteps(self, decoded):
        variables, var_attrs, gatts = decoded
        # the reference's own run reports 30 records per EXIS file
        assert len(variables["time"]) == 30
        for v in (
            "irradiance_xrsa1",
            "irradiance_xrsa2",
            "irradiance_xrsb1",
            "irradiance_xrsb2",
            "primary_xrsb",
            "dispersion_angle",
            "integration_time",
        ):
            assert len(variables[v]) == 30, v

    def test_time_units_and_epoch(self, decoded):
        variables, var_attrs, _ = decoded
        assert var_attrs["time"]["units"] == "seconds since 2000-01-01 12:00:00"
        # first sample: J2000 + 735739259.95 s = 2023-04-26T00:00:59Z,
        # matching the filename's s20231160000599 start stamp
        assert variables["time"][0] == pytest.approx(735739259.947841)

    def test_chunked_deflate_values_sane(self, decoded):
        variables, _, _ = decoded
        xrsb = variables["irradiance_xrsb1"]
        assert all(0 < x < 1e-4 for x in xrsb)  # W/m^2 quiescent X-ray flux
        assert len(set(variables["packet_count"])) == 30  # monotone counter

    def test_global_attrs(self, decoded):
        _, _, gatts = decoded
        assert gatts["time_coverage_start"].startswith("2023-04-26T00:00:59")
        assert "netcdflibversion" in gatts["_NCProperties"]

    def test_phantom_dimensions_excluded(self, decoded):
        variables, _, _ = decoded
        assert "number_of_time_bounds" not in variables
        assert "solar_array_mnemonic_str_len" not in variables


@needs_ref
def test_goes_end_to_end_flatten(spark, tmp_path):
    """The flagship S3 path on REAL reference input: binaryFile scan →
    mapInPandas decode → 30 flat records with reference semantics."""
    shutil.copy(_ref_files[0], tmp_path / os.path.basename(_ref_files[0]))
    df = read_netcdf_directory(spark, str(tmp_path))
    rows = df.orderBy("time").collect()
    assert len(rows) == 30
    # time decode: units-based epoch, J2000 ref (946728000) + offset
    assert rows[0].time == 946728000 + 735739259
    assert rows[0].irradiance_xrsb1 == pytest.approx(8.2882064589e-07, rel=1e-9)
    assert rows[0].source_file.startswith("OR_EXIS-L1b-SFXR_")
    assert rows[0].product_time.startswith("s2023116")


# ---------------------------------------------------------------------
# hand-built old-style fixture (committed, standalone)
# ---------------------------------------------------------------------


class TestOldStyleLayout:
    def test_roundtrip(self):
        buf = write_minimal_hdf5(
            {
                "time": [0.0, 60.0, 120.0],
                "xrsa1": [1e-7, 2e-7, 3e-7],
            },
            units={"time": "minutes since 2020-01-01 00:00:00"},
        )
        variables, var_attrs, _ = parse_hdf5_netcdf(buf)
        assert variables["time"] == [0.0, 60.0, 120.0]
        assert variables["xrsa1"] == [1e-7, 2e-7, 3e-7]
        assert var_attrs["time"]["units"] == "minutes since 2020-01-01 00:00:00"

    def test_flatten_through_engine(self, spark, tmp_path):
        buf = write_minimal_hdf5(
            {"time": [0.0, 10.0], "xrsb1": [5e-7, 6e-7]},
            units={"time": "seconds since 2021-06-01 00:00:00"},
        )
        (tmp_path / "OR_EXIS-L1b-SFXR_G16_s1_e1_c1.nc").write_bytes(buf)
        rows = (
            read_netcdf_directory(spark, str(tmp_path))
            .orderBy("time")
            .collect()
        )
        assert len(rows) == 2
        base = 1622505600  # 2021-06-01T00:00:00Z
        assert [r.time for r in rows] == [base, base + 10]
        assert rows[0].irradiance_xrsb1 == pytest.approx(5e-7)
        # synonym zero-fill for absent channels
        assert rows[0].irradiance_xrsa1 == 0.0


# ---------------------------------------------------------------------
# malformed-input robustness: a distributed parser sees truncated and
# corrupted blobs; it must raise (or skip cleanly), never hang or loop
# ---------------------------------------------------------------------


class TestMalformedInput:
    @pytest.fixture(scope="class")
    def good(self):
        return write_minimal_hdf5(
            {"time": [0.0, 1.0], "x": [1.0, 2.0]},
            units={"time": "seconds since 2020-01-01 00:00:00"},
        )

    def test_truncations_never_hang(self, good):
        # every truncation point either raises or returns a subset
        for cut in range(8, len(good), 7):
            try:
                parse_hdf5_netcdf(good[:cut])
            except Exception:
                pass

    def test_bitflips_never_hang(self, good):
        for pos in range(8, len(good), 11):
            mutated = bytearray(good)
            mutated[pos] ^= 0xFF
            try:
                parse_hdf5_netcdf(bytes(mutated))
            except Exception:
                pass

    @needs_ref
    def test_real_fixture_truncations_never_hang(self):
        with open(_ref_files[0], "rb") as fh:
            buf = fh.read()
        for cut in (16, 1024, 5000, 20000, 90000, len(buf) - 1):
            try:
                parse_hdf5_netcdf(buf[:cut])
            except Exception:
                pass
