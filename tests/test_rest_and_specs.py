"""REST poll sources (S5-S7, injectable fetcher) and Druid supervisor
spec-JSON compatibility tests."""

from __future__ import annotations

import json

from data_pipeline_with_big_data_stack_spark.schemas import DATASOURCES_BY_NAME, from_druid_json
from data_pipeline_with_big_data_stack_spark.sources import rest

NOW = 1_700_000_000


def test_crypto_prices_record_shape(spark):
    payload = {
        "bitcoin": {"usd": 43250.5, "usd_market_cap": 8.5e11, "usd_24h_change": 2.5},
        "ethereum": {"usd": 2280.1, "usd_market_cap": 2.7e11, "usd_24h_change": -1.2},
        "cardano": {"usd": 0.38, "usd_market_cap": 1.3e10, "usd_24h_change": 0.0},
        "polkadot": {"usd": 5.2, "usd_market_cap": 6.6e9, "usd_24h_change": 4.4},
    }
    df = rest.crypto_prices(spark, lambda url: payload, NOW)
    rows = {r["coin_id"]: r for r in df.collect()}
    assert set(rows) == set(rest.COINS)
    assert rows["bitcoin"]["price_usd"] == 43250.5
    assert rows["bitcoin"]["market_cap"] == int(8.5e11)
    assert rows["ethereum"]["change_24h"] == -1.2
    assert all(r["source"] == "coingecko_api" for r in rows.values())
    # typed per druid-real-crypto-datasource.json
    dt = dict(df.dtypes)
    assert dt["market_cap"] == "bigint" and dt["price_usd"] == "double"


def test_weather_nested_flattening(spark):
    def fetcher(url):
        city = url.split("q=")[1]
        return {
            "main": {"temp": 24.5, "humidity": 78, "pressure": 1013.2},
            "weather": [{"description": f"clouds over {city}"}],
            "wind": {"speed": 3.4},
        }

    df = rest.weather(spark, fetcher, NOW, cities=("Cartago", "Heredia"))
    rows = {r["city"]: r for r in df.collect()}
    assert rows["Cartago"]["temperature"] == 24.5
    assert rows["Cartago"]["humidity"] == 78
    assert rows["Heredia"]["weather"] == "clouds over Heredia"
    assert rows["Heredia"]["wind_speed"] == 3.4


def test_stock_prices_percent_strip_stays_string(spark):
    def fetcher(url):
        sym = url.split("symbol=")[1]
        return {
            "Global Quote": {
                "05. price": "189.95",
                "09. change": "-1.05",
                "10. change percent": "-0.55%",
                "06. volume": "52341100",
            }
        } if sym != "TSLA" else {}

    df = rest.stock_prices(spark, fetcher, NOW)
    rows = {r["symbol"]: r for r in df.collect()}
    assert "TSLA" not in rows  # empty quote skipped, like the reference
    r = rows["AAPL"]
    assert r["price"] == 189.95 and r["volume"] == 52341100
    assert r["change_percent"] == "-0.55"  # stripped of %, still a string
    assert dict(df.dtypes)["change_percent"] == "string"


def test_from_druid_json_roundtrip():
    # a supervisor spec in the reference's file format (same shape as
    # M/druid-goes-satellite-datasource.json, reconstructed not copied)
    spec = {
        "type": "kafka",
        "spec": {
            "ioConfig": {
                "type": "kafka",
                "topic": "goes_satellite_data",
                "useEarliestOffset": True,
            },
            "tuningConfig": {"type": "kafka", "maxRowsPerSegment": 1000000},
            "dataSchema": {
                "dataSource": "goes_satellite_datasource",
                "timestampSpec": {"column": "time", "format": "posix"},
                "dimensionsSpec": {
                    "dimensions": [
                        "product_time",
                        "solar_array_current_channel_index_label",
                        "source_file",
                        {"type": "double", "name": "irradiance_xrsa1"},
                        {"type": "double", "name": "irradiance_xrsa2"},
                        {"type": "double", "name": "irradiance_xrsb1"},
                        {"type": "double", "name": "irradiance_xrsb2"},
                        {"type": "double", "name": "primary_xrsb"},
                        {"type": "double", "name": "dispersion_angle"},
                        {"type": "double", "name": "integration_time"},
                        {"type": "long", "name": "extraction_timestamp"},
                        {"type": "double", "name": "file_size_mb"},
                    ]
                },
                "granularitySpec": {
                    "type": "uniform",
                    "segmentGranularity": "DAY",
                    "queryGranularity": "MINUTE",
                    "rollup": False,
                },
            },
        },
    }
    got = from_druid_json(json.dumps(spec))
    want = DATASOURCES_BY_NAME["goes_satellite_datasource"]
    assert got.name == want.name and got.topic == want.topic
    assert got.timestamp == want.timestamp
    assert got.granularity == want.granularity
    assert got.max_rows_per_segment == want.max_rows_per_segment
    assert [d.name for d in got.dimensions] == [d.name for d in want.dimensions]
    assert [d.type for d in got.dimensions] == [d.type for d in want.dimensions]
    # and it compiles to the same table schema
    assert got.schema() == want.schema()


def test_from_druid_json_rejects_unsupported_granularity():
    import pytest as _pytest

    bad = {
        "spec": {
            "ioConfig": {"topic": "t"},
            "dataSchema": {
                "dataSource": "d",
                "timestampSpec": {"column": "ts", "format": "posix"},
                "dimensionsSpec": {"dimensions": ["k"]},
                "granularitySpec": {
                    "segmentGranularity": "DAY",
                    "queryGranularity": {"type": "duration", "duration": 123},
                    "rollup": False,
                },
            },
        }
    }
    with _pytest.raises(ValueError, match="queryGranularity"):
        from_druid_json(bad)


def test_rest_sources_survive_fetch_failures(spark):
    def flaky(url):
        if "Cartago" in url or "symbol=MSFT" in url:
            raise ConnectionError("boom")
        if "coingecko" in url:
            raise TimeoutError("boom")
        if "symbol=" in url:
            return {"Global Quote": {"05. price": "1.0", "09. change": "0",
                                     "10. change percent": "0%", "06. volume": "1"}}
        return {"main": {"temp": 1.0, "humidity": 1, "pressure": 1.0},
                "weather": [{"description": "x"}], "wind": {"speed": 1.0}}

    assert rest.crypto_prices(spark, flaky, NOW).count() == 0  # whole poll down
    w = rest.weather(spark, flaky, NOW, cities=("Cartago", "Heredia"))
    assert [r["city"] for r in w.collect()] == ["Heredia"]  # failed city skipped
    s = rest.stock_prices(spark, flaky, NOW, symbols=("AAPL", "MSFT"))
    assert [r["symbol"] for r in s.collect()] == ["AAPL"]
