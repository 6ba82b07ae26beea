"""REST API poll sources (SURVEY §2.1 S5-S7).

The reference polls CoinGecko (`real_data_etl.py:20-59`), OpenWeatherMap
(`:61-103`), and Alpha Vantage (`:105-148`) driver-side per DAG run. The
engine keeps the poll driver-side (it IS a driver-side acquisition step —
SURVEY §2.10) but makes the record construction declarative and the HTTP
transport injectable: tests and air-gapped runs pass a fetcher callable
returning the payload dict; production passes a real `urllib`/`requests`
fetch. Field extraction semantics (nested paths, casts, %-strip,
extraction timestamps) follow the reference exactly.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Fetcher = Callable[[str], dict]


def http_json_fetcher(url: str) -> dict:  # pragma: no cover - needs network
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode("utf-8"))


COINS = ("bitcoin", "ethereum", "cardano", "polkadot")
CITIES = ("San Jose", "Cartago", "Alajuela", "Heredia", "Puntarenas")
SYMBOLS = ("AAPL", "GOOGL", "MSFT", "TSLA")

_CRYPTO_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField("coin_id", T.StringType()),
        T.StructField("price_usd", T.DoubleType()),
        T.StructField("market_cap", T.LongType()),
        T.StructField("change_24h", T.DoubleType()),
        T.StructField("source", T.StringType()),
    ]
)


def crypto_prices(
    spark: SparkSession,
    fetcher: Fetcher,
    epoch_now: int,
    coins: tuple[str, ...] = COINS,
) -> DataFrame:
    """S5: /simple/price for the four coin ids — one record per coin
    (`real_data_etl.py:43-50`), typed per
    `M/druid-real-crypto-datasource.json:25-47`."""
    try:
        data = fetcher(
            "https://api.coingecko.com/api/v3/simple/price?ids="
            + ",".join(coins)
            + "&vs_currencies=usd&include_market_cap=true&include_24hr_change=true"
        )
    except Exception:
        # poll failures yield an empty batch, never a dead pipeline —
        # the reference's extractors swallow and log (real_data_etl.py:55)
        data = {}
    rows = []
    for coin in coins:
        if coin not in data:
            continue
        d = data[coin]
        rows.append(
            (
                epoch_now,
                coin,
                float(d.get("usd", 0.0)),
                int(d.get("usd_market_cap", 0)),
                float(d.get("usd_24h_change", 0.0)),
                "coingecko_api",
            )
        )
    return spark.createDataFrame(rows, _CRYPTO_SCHEMA)


_WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("humidity", T.LongType()),
        T.StructField("pressure", T.DoubleType()),
        T.StructField("weather", T.StringType()),
        T.StructField("wind_speed", T.DoubleType()),
    ]
)


def weather(
    spark: SparkSession,
    fetcher: Fetcher,
    epoch_now: int,
    cities: tuple[str, ...] = CITIES,
) -> DataFrame:
    """S6: per-city current weather; nested-JSON flattening
    (`main.temp`, `weather[0].description`, `wind.speed` —
    `real_data_etl.py:86-94`) done with from_json field paths so the
    extraction itself is engine-side and schema-checked."""
    payload_schema = T.StructType(
        [
            T.StructField(
                "main",
                T.StructType(
                    [
                        T.StructField("temp", T.DoubleType()),
                        T.StructField("humidity", T.LongType()),
                        T.StructField("pressure", T.DoubleType()),
                    ]
                ),
            ),
            T.StructField(
                "weather",
                T.ArrayType(
                    T.StructType([T.StructField("description", T.StringType())])
                ),
            ),
            T.StructField(
                "wind", T.StructType([T.StructField("speed", T.DoubleType())])
            ),
        ]
    )
    raw = []
    for city in cities:
        try:  # per-city skip-and-continue (strict upgrade on the
            # reference's whole-poll try/except, real_data_etl.py:68-99)
            raw.append((city, json.dumps(
                fetcher(f"https://api.openweathermap.org/data/2.5/weather?q={city}")
            )))
        except Exception:
            continue
    df = spark.createDataFrame(raw, "city string, payload string")
    p = F.from_json("payload", payload_schema)
    return df.select(
        F.lit(epoch_now).cast("long").alias("timestamp"),
        "city",
        p["main"]["temp"].alias("temperature"),
        p["main"]["humidity"].alias("humidity"),
        p["main"]["pressure"].alias("pressure"),
        p["weather"][0]["description"].alias("weather"),
        p["wind"]["speed"].alias("wind_speed"),
    )


_STOCKS_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("change", T.DoubleType()),
        T.StructField("change_percent", T.StringType()),
        T.StructField("volume", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)


def stock_prices(
    spark: SparkSession,
    fetcher: Fetcher,
    epoch_now: int,
    symbols: tuple[str, ...] = SYMBOLS,
) -> DataFrame:
    """S7: GLOBAL_QUOTE per symbol; numeric-string parsing and %-strip —
    `change_percent` stays a STRING for schema parity with
    `M/druid-stocks-datasource.json:44-46` (the documented quirk); the
    strip is `regexp_replace` engine-side."""
    rows = []
    for sym in symbols:
        try:
            q = fetcher(
                f"https://www.alphavantage.co/query?function=GLOBAL_QUOTE&symbol={sym}"
            ).get("Global Quote", {})
        except Exception:
            continue
        if not q:
            continue
        rows.append(
            (
                epoch_now,
                sym,
                float(q.get("05. price", 0.0)),
                float(q.get("09. change", 0.0)),
                str(q.get("10. change percent", "0%")),
                int(q.get("06. volume", 0)),
                "alpha_vantage",
            )
        )
    df = spark.createDataFrame(rows, _STOCKS_SCHEMA)
    return df.withColumn(
        "change_percent", F.regexp_replace("change_percent", "%", "")
    )
