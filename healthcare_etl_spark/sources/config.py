"""Connection configuration from the environment (reference parity).

The reference reads its Postgres connection from environment variables
with baked-in defaults (``etl_app/etl_script.py:133-136``: DB_HOST,
DB_PORT, DB_NAME, DB_USER, DB_PASSWORD) so the same image runs in
compose and CI. The engine keeps explicit function arguments as the
primary API (testable, no hidden globals) and provides this adapter for
the env-driven deployment style.
"""

from __future__ import annotations

import os


def jdbc_config_from_env(
    *,
    prefix: str = "DB_",
    env: dict[str, str] | None = None,
) -> tuple[str, dict[str, str]]:
    """Build (jdbc_url, properties) from ``{prefix}HOST/PORT/NAME/USER/
    PASSWORD/DRIVER`` environment variables, defaulting like the
    reference (localhost:5432, postgres driver).

    ``env`` injects a mapping for tests; defaults to ``os.environ``.
    Credentials stay OUT of the URL (they ride the properties dict, so
    they never appear in Spark plan strings or UI pages).
    """
    e = os.environ if env is None else env
    host = e.get(f"{prefix}HOST", "localhost")
    port = e.get(f"{prefix}PORT", "5432")
    name = e.get(f"{prefix}NAME", "postgres")
    user = e.get(f"{prefix}USER", "postgres")
    password = e.get(f"{prefix}PASSWORD", "")
    driver = e.get(f"{prefix}DRIVER", "org.postgresql.Driver")
    url = f"jdbc:postgresql://{host}:{port}/{name}"
    props = {"user": user, "password": password, "driver": driver}
    return url, props
