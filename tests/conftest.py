from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from weather_data_ingestion_gcp_spark.schemas import RAW_API_SCHEMA, WEATHER_SCHEMA  # noqa: E402
from weather_data_ingestion_gcp_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.ui.showConsoleProgress": "false", "spark.driver.memory": "4g"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def raw_api_payload(**over) -> dict:
    """One OpenWeather current-weather payload in the upstream shape
    (field names pre-clean: lon/lat, deg, grnd_level, rain '1h'/'3h')."""
    base = {
        "coord": {"lon": 87.07, "lat": 23.25},
        "weather": [
            {"id": 802, "main": "Clouds", "description": "scattered clouds"},
            {"id": 999, "main": "IGNORED", "description": "only [0] is kept"},
        ],
        "base": "stations",
        "main": {
            "temp": 300.15,
            "feels_like": 303.15,
            "pressure": 1005,
            "humidity": 70,
            "temp_min": 298.15,
            "temp_max": 302.15,
            "sea_level": None,
            "grnd_level": None,
        },
        "visibility": 10000,
        "wind": {"speed": 3.5, "deg": 210, "gust": None},
        "clouds": {"all": 40},
        "rain": None,
        "snow": None,
        "dt": 1656857700,
        "sys": {"country": "IN", "sunrise": 1656808000, "sunset": 1656856000},
        "timezone": 19800,
        "name": "Bankura",
    }
    base.update(over)
    return base


def hourly_rows(days: int = 3, partial_last_day: bool = True) -> list[dict]:
    """Deterministic WEATHER_SCHEMA rows (FIXTURES.md A1): ``days`` days of
    24 hourly obs; the last day stops at 14:00 when partial (non-EOD case);
    rain only on day 2 afternoons (null-ignoring MAX); one duplicated
    (dt, current_time) pair on day 1 (at-least-once T6 discussion)."""
    rows: list[dict] = []
    start = dt.date(2022, 7, 1)
    for d in range(days):
        day = start + dt.timedelta(days=d)
        last_hour = 14 if (partial_last_day and d == days - 1) else 23
        for h in range(0, last_hour + 1):
            temp = 295.15 + d + (h % 12) * 0.5  # Kelvin
            rain = {"rain_1h": 0.5 + h * 0.1, "rain_3h": 1.5} if (d == 1 and h >= 12) else None
            rows.append(
                {
                    "coordinate": {"longitude": 87.07, "latitude": 23.25},
                    "weather": {"id": 802, "main": "Clouds", "description": "scattered"},
                    "base": "stations",
                    "main": {
                        "temp": temp,
                        "feels_like": temp + 2.0,
                        "pressure": 1000 + h % 7,
                        "humidity": 60 + h % 30,
                        "temp_min": temp - 1.0,
                        "temp_max": temp + 1.0,
                        "sea_level": None,
                        "ground_level": None,
                    },
                    "visibility": 10000,
                    "wind": {"speed": 3.0 + h * 0.1, "degree": (h * 15) % 360, "gust": None},
                    "clouds": {"all": (h * 4) % 101},
                    "rain": rain,
                    "snow": None,
                    "dt": day,
                    "current_time": f"{h:02d}:00:05",
                    "sys": {"country": "IN", "sunrise": 1656808000, "sunset": 1656856000},
                    "timezone": 19800,
                    "name": "Bankura",
                }
            )
    rows.append(dict(rows[0]))  # duplicate delivery of day-1 00:00:05
    return rows


@pytest.fixture()
def hourly_df(spark):
    return spark.createDataFrame(hourly_rows(), WEATHER_SCHEMA)


@pytest.fixture()
def raw_api_df(spark):
    return spark.createDataFrame([raw_api_payload()], RAW_API_SCHEMA)
