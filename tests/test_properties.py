"""Property-based tests (hypothesis) for the pure rewrite/cleanup layers,
plus batched data-property tests for the cleanup semantics in Spark."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.catalog import filter_topics
from data_pipeline_with_big_data_stack_spark.plans.sql_shim import rewrite_druid_sql

_GRAINS = {
    "PT1S": "second", "PT1M": "minute", "PT1H": "hour", "P1D": "day",
    "P1W": "week", "P1M": "month", "P3M": "quarter", "P1Y": "year",
}

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,20}", fullmatch=True)


class TestSqlShimProperties:
    @given(col=_ident, grain=st.sampled_from(sorted(_GRAINS)))
    def test_time_floor_rewrites_to_date_trunc(self, col, grain):
        out = rewrite_druid_sql(f"SELECT TIME_FLOOR({col}, '{grain}') FROM t")
        assert out == f"SELECT date_trunc('{_GRAINS[grain]}', {col}) FROM t"

    @given(col=_ident, grain=st.sampled_from(sorted(_GRAINS)), n=st.integers(1, 4))
    def test_rewrite_is_idempotent_and_total(self, col, grain, n):
        sql = " UNION ALL ".join(
            f"SELECT TIME_FLOOR({col}, '{grain}') FROM t" for _ in range(n)
        )
        once = rewrite_druid_sql(sql)
        assert rewrite_druid_sql(once) == once  # fixpoint
        assert "TIME_FLOOR" not in once

    @given(sql=st.text(alphabet=st.characters(blacklist_characters="'"), max_size=80))
    def test_non_druid_sql_untouched(self, sql):
        if "TIME_FLOOR" in sql.upper() or "TIME_EXTRACT" in sql.upper():
            return
        assert rewrite_druid_sql(sql) == sql


class TestTopicFilterProperties:
    @given(
        topics=st.lists(
            st.from_regex(r"[a-z_]{1,12}", fullmatch=True), max_size=12
        )
    )
    def test_include_all_is_sorted_dedup(self, topics):
        got = filter_topics(topics, ["*"])
        assert got == sorted(set(topics))

    @given(
        topics=st.lists(st.from_regex(r"[a-z_]{1,12}", fullmatch=True), max_size=12),
        patterns=st.lists(st.from_regex(r"[a-z_*]{1,8}", fullmatch=True), max_size=4),
    )
    def test_filter_subset_and_monotone(self, topics, patterns):
        got = filter_topics(topics, patterns)
        assert set(got) <= set(topics)
        wider = filter_topics(topics, patterns + ["*"])
        assert set(got) <= set(wider)


class TestCleanupDataProperties:
    """Batched data-property test: one generated corpus, invariants over
    every row (per-example Spark jobs would be pathologically slow)."""

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.floats(allow_nan=True, allow_infinity=False),
                st.none(),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_zero_fill_semantics(self, spark_global, vals):
        from data_pipeline_with_big_data_stack_spark.operators.cleanup import zero_fill_nan

        df = spark_global.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, x double"
        )
        out = {r["i"]: r["x"] for r in zero_fill_nan(df, ["x"]).collect()}
        for i, v in enumerate(vals):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                assert out[i] == 0.0
            else:
                assert out[i] == v


# session-scoped spark fixture is function-args-incompatible with @given;
# expose it through a module-level alias fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


class TestDecoderProperties:
    """Roundtrip invariants for the native media decoders — any palette,
    any index stream, any PCM params must survive encode→decode exactly
    (GIF/WAV are lossless); arbitrary byte blobs must never decode as a
    valid image silently."""

    @given(
        n_colors_log=st.integers(1, 8),
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        data=st.data(),
    )
    @settings(max_examples=30, deadline=None)
    def test_gif_roundtrip_any_palette(self, n_colors_log, w, h, data):
        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.gif import decode_gif, encode_gif

        n = 1 << n_colors_log
        rng = np.random.RandomState(
            data.draw(st.integers(0, 2**31 - 1), label="seed")
        )
        pal = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(n)]
        idx = bytes(rng.randint(0, n, w * h).astype(np.uint8))
        gw, gh, nf, px = decode_gif(encode_gif(w, h, pal, idx))
        assert (gw, gh, nf) == (w, h, 1)
        exp = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(-1)
        assert np.array_equal(px, exp)

    @given(
        nch=st.integers(1, 2),
        bits=st.sampled_from([8, 16, 32]),
        rate=st.sampled_from([8000, 16000, 44100]),
        n=st.integers(1, 200),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_wav_roundtrip_any_pcm(self, nch, bits, rate, n, seed):
        import io
        import struct
        import wave

        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.wav import decode_wav

        rng = np.random.RandomState(seed)
        lo, hi = (0, 256) if bits == 8 else (-(1 << (bits - 1)), 1 << (bits - 1))
        frames = rng.randint(lo, hi, n * nch)
        buf = io.BytesIO()
        wv = wave.open(buf, "wb")
        wv.setnchannels(nch)
        wv.setsampwidth(bits // 8)
        wv.setframerate(rate)
        fmt = {8: "B", 16: "h", 32: "i"}[bits]
        wv.writeframes(struct.pack(f"<{len(frames)}{fmt}", *frames))
        wv.close()
        grate, gnch, gbits, arr = decode_wav(buf.getvalue())
        assert (grate, gnch, gbits) == (rate, nch, bits)
        assert arr.tolist() == frames.tolist()

    @given(
        w=st.integers(1, 32),
        h=st.integers(1, 32),
        subsample=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_progressive_jpeg_equals_baseline(self, w, h, subsample, seed):
        # same quantization on both paths ⇒ identical decoded pixels;
        # any drift means a scan-accumulation bug in one of the paths
        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(seed)
        flat = rng.randint(0, 256, size=w * h * 3).astype(np.uint8)
        base = np.asarray(decode_jpeg(encode_jpeg(w, h, flat, subsample=subsample))[3])
        prog = np.asarray(
            decode_jpeg(encode_jpeg_progressive(w, h, flat, subsample=subsample))[3]
        )
        assert np.array_equal(base, prog)

    @given(blob=st.binary(min_size=0, max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_garbage_never_decodes_as_media(self, blob):
        import pytest

        from data_pipeline_with_big_data_stack_spark.operators.gif import GifError, decode_gif
        from data_pipeline_with_big_data_stack_spark.operators.jpeg import JpegError, decode_jpeg
        from data_pipeline_with_big_data_stack_spark.operators.wav import WavError, decode_wav
        from data_pipeline_with_big_data_stack_spark.sources.hdf5lite import parse_hdf5_netcdf

        for fn in (decode_gif, decode_jpeg, decode_wav):
            with pytest.raises(Exception):
                fn(blob)
        # hdf5: random blobs lack the magic and must raise H5Error
        with pytest.raises(Exception):
            parse_hdf5_netcdf(blob)


class TestSketchSqlRewrites:
    def test_ds_aggregators_rewrite_and_fixpoint(self):
        sql = (
            "SELECT APPROX_COUNT_DISTINCT_DS_HLL(u, 14), "
            "APPROX_COUNT_DISTINCT_DS_THETA(u), "
            "APPROX_QUANTILE_DS(v, 0.95, 200), "
            "APPROX_QUANTILE(v, 0.5) FROM t"
        )
        out = rewrite_druid_sql(sql)
        assert "hll_sketch_estimate(hll_sketch_agg(u, 14))" in out
        assert "theta_sketch_estimate(theta_sketch_agg(u))" in out
        assert (
            "kll_sketch_get_quantile_double("
            "kll_sketch_agg_double(cast(v as double), 200), "
            "cast(0.95 as double))" in out
        )
        assert "percentile_approx(v, 0.5)" in out
        assert rewrite_druid_sql(out) == out  # fixpoint

    def test_suffix_identifiers_untouched(self):
        sql = "SELECT MY_APPROX_QUANTILE(v, 0.5), APPROX_COUNT_DISTINCT(u) FROM t"
        assert rewrite_druid_sql(sql) == sql

    def test_time_function_rewrites_execute(self, spark):
        # string-level mapping AND actual execution through Spark SQL
        out = rewrite_druid_sql(
            "SELECT TIME_SHIFT(TIMESTAMP '2024-01-01 06:00:00', 'PT1H', -2) AS a, "
            "MILLIS_TO_TIMESTAMP(1704067200000) AS b, "
            "TIMESTAMP_TO_MILLIS(t) AS c "
            "FROM (SELECT TIME_PARSE('2024-01-01T00:00:00') AS t)"
        )
        assert "timestampadd(hour, -2," in out
        assert "timestamp_millis(1704067200000)" in out
        assert "unix_millis(t)" in out and "to_timestamp('2024-01-01" in out
        assert rewrite_druid_sql(out) == out  # fixpoint
        row = spark.sql(out).collect()[0]
        assert row.a.hour == 4 and row.c == 1704067200000
        assert row.b.year == 2024
        # nested arguments stay a diagnosed error, not a silent pass-through
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unsupported argument form"):
            rewrite_druid_sql("SELECT TIME_SHIFT(TIME_PARSE(x), 'PT1H', 1) FROM t")

    def test_unrewritable_argument_forms_fail_at_the_shim(self):
        # nested-expression arguments slip past the simple-argument
        # regexes; the shim must diagnose them instead of handing Spark
        # an unknown function (ADVICE r4)
        for sql in (
            "SELECT APPROX_COUNT_DISTINCT_DS_HLL(coalesce(a, b)) FROM t",
            "SELECT APPROX_QUANTILE_DS(abs(v), 0.5) FROM t",
            "SELECT TIME_FLOOR(coalesce(ts, ts2), 'PT1H') FROM t",
        ):
            with pytest.raises(ValueError, match="unsupported argument form"):
                rewrite_druid_sql(sql)


class TestMisraGriesProperties:
    """Pure-Python invariants of the shared MG update step — the piece
    both the batch fold and the streaming state ride on."""

    @given(
        data=st.lists(
            st.tuples(st.integers(0, 30), st.integers(1, 50)), max_size=200
        ),
        k=st.integers(1, 16),
        n_batches=st.integers(1, 4),
    )
    @settings(max_examples=150, deadline=None)
    def test_bracket_contains_truth_for_any_batching(self, data, k, n_batches):
        import pandas as pd

        from data_pipeline_with_big_data_stack_spark.operators.freq import mg_update

        items = [f"i{i}" for i, w in data for _ in range(1)]
        weights = [w for _, w in data]
        true: dict[str, int] = {}
        for it, w in zip(items, weights):
            true[it] = true.get(it, 0) + w
        counts: dict[str, int] = {}
        err = 0
        # arbitrary batch split must not change the guarantee
        step = max(1, len(items) // n_batches)
        for i in range(0, len(items), step):
            err += mg_update(
                counts,
                pd.Series(items[i : i + step]),
                k,
                weights=pd.Series(weights[i : i + step]),
            )
        assert len(counts) <= k
        for it, t in true.items():
            est = counts.get(it, 0)
            assert est <= t <= est + err, (it, est, t, err)

    @given(
        items=st.lists(st.integers(0, 9), max_size=120),
        k=st.integers(10, 32),
    )
    @settings(max_examples=100, deadline=None)
    def test_exact_below_capacity(self, items, k):
        import pandas as pd

        from data_pipeline_with_big_data_stack_spark.operators.freq import mg_update

        counts: dict[int, int] = {}
        err = mg_update(counts, pd.Series(items, dtype="object"), k)
        assert err == 0
        truth = {}
        for it in items:
            truth[it] = truth.get(it, 0) + 1
        assert counts == truth
