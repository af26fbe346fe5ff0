"""Runtime configuration — the Spark-side mirror of the reference's
``config_default.toml`` surface (udata_hydra/config_default.toml:20-67).

Only the data-plane keys exist here; Postgres/Redis/RQ/Sentry plumbing has
no Spark counterpart (the lake and the scheduler replace them). Key names
keep the reference's UPPER_SNAKE spelling in TOML so an existing deployment
file ports by deleting the dead sections.

Precedence: dataclass defaults < TOML file (explicit path or
``$SPARK_HYDRA_CONFIG``) < environment (``SPARK_HYDRA_<KEY>``, parsed by
field type — ints as ints, bools as true/false/1/0, tuples as
comma-separated).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Config:
    # crawler (config_default.toml:20-49)
    user_agent: str = "udata-hydra/1.0"
    catalog_url: str = ""
    excluded_patterns: tuple[str, ...] = ("http%geo.data.gouv.fr%", "%?format=shp%")
    no_backoff_domains: tuple[str, ...] = (
        "static.data.gouv.fr",
        "www.data.gouv.fr",
        "inspire.data.gouv.fr",
    )
    backoff_nb_req: int = 180
    backoff_period: int = 360  # seconds
    cool_off_period: int = 86_400  # seconds
    batch_size: int = 40
    check_delays: tuple[int, ...] = (12, 24, 168, 720)  # hours
    sleep_between_batches: int = 60  # seconds
    # ingest guards (config_default.toml:51-56)
    max_filesize_allowed: dict = field(
        default_factory=lambda: {
            "csv": 104_857_600,
            "csvgz": 104_857_600,
            "xls": 52_428_800,
            "xlsx": 13_107_200,
            "ods": 10_485_760,
        }
    )
    # analysis toggles (config_default.toml:59-63)
    csv_analysis: bool = True
    csv_to_db: bool = True
    # webhook (config_default.toml:66-68)
    webhook_enabled: bool = True
    udata_uri: str = ""


def _coerce(current, raw: str):
    if isinstance(current, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, tuple):
        parts = [p.strip() for p in raw.split(",") if p.strip()]
        return tuple(int(p) if p.lstrip("-").isdigit() else p for p in parts)
    return raw


def load_config(
    toml_path: str | None = None, env: dict | None = None
) -> Config:
    """defaults < TOML < environment. Unknown TOML keys are ignored (the
    reference's Postgres/Redis keys port over silently as no-ops)."""
    env = os.environ if env is None else env
    values: dict = {}

    path = toml_path or env.get("SPARK_HYDRA_CONFIG")
    if path:
        import tomllib

        with open(path, "rb") as f:
            doc = tomllib.load(f)
        for f_ in dataclasses.fields(Config):
            key = f_.name.upper()
            if key in doc:
                v = doc[key]
                values[f_.name] = tuple(v) if isinstance(v, list) else v

    for f_ in dataclasses.fields(Config):
        raw = env.get(f"SPARK_HYDRA_{f_.name.upper()}")
        if raw is not None:
            current = values.get(f_.name, f_.default)
            if current is dataclasses.MISSING:
                current = f_.default_factory()  # type: ignore[misc]
            values[f_.name] = _coerce(current, raw)

    return Config(**values)
