"""dbt profiles.yml → connection → source-URI resolution.

Spark re-expression of the connection half of the reference's dbt parser
(/root/reference/data_diff/dbt_parser.py:78-145 profiles-dir precedence,
:291-335 get_connection_creds, :337-432 set_connection): read
dbt_project.yml for the profile name, profiles.yml for the target's
credentials, render `{{ env_var(...) }}` templating, and map the
connection to one of this engine's URI schemes (sources/connect.py) so a
dbt model resolves to a DataFrame with no manual --uri flags.

The reference maps credentials to 7 warehouse drivers; a Spark engine
needs only the schemes its connect layer speaks:

  type: duckdb     → duckdb://<path>#<schema.alias>
  type: postgres   → jdbc:postgresql://host:port/dbname (+user/password,
                     dbtable=schema.alias)  [reference :423-431]
  type: spark      → table://<database.schema.alias> (the Spark catalog —
                     what dbt-spark materializes to)
  type: parquet    → parquet://<path>/<schema>/<alias>.parquet (files; the
                     dbt-duckdb "external materialization" layout, kept as
                     a first-class file-native target)

Anything else raises the same way the reference raises
DataDiffDbtConnectionNotImplementedError (:431-432).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import yaml
from pyspark.sql import DataFrame, SparkSession

PROFILES_FILE = "profiles.yml"
PROJECT_FILE = "dbt_project.yml"

_ENV_VAR_RE = re.compile(
    r"""\{\{\s*env_var\(\s*['"](?P<name>[^'"]+)['"]\s*"""
    r"""(?:,\s*['"](?P<default>[^'"]*)['"]\s*)?\)\s*\}\}"""
)


class DbtProfileNotFoundError(KeyError):
    pass


class DbtConnectionNotImplementedError(NotImplementedError):
    pass


def render_env_vars(obj):
    """Resolve the `{{ env_var('NAME'[, 'default']) }}` subset of dbt's
    profile templating (the reference delegates to dbt-core's
    ProfileRenderer, dbt_parser.py:311,335; env_var is the only renderer
    feature profiles.yml documents for credentials)."""
    if isinstance(obj, dict):
        return {k: render_env_vars(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [render_env_vars(v) for v in obj]
    if isinstance(obj, str):

        def sub(m: "re.Match[str]") -> str:
            val = os.environ.get(m.group("name"), m.group("default"))
            if val is None:
                raise DbtProfileNotFoundError(
                    f"env_var '{m.group('name')}' is not set and has no default"
                )
            return val

        return _ENV_VAR_RE.sub(sub, obj)
    return obj


@dataclass
class DbtConnection:
    type: str
    credentials: Dict
    target: str
    profile: str


def default_profiles_dir() -> Path:
    # reference dbt_parser.py:78-82 — ~/.dbt unless a profiles.yml sits in
    # the project dir (legacy layout), unless overridden.
    return Path(os.environ.get("DBT_PROFILES_DIR", Path.home() / ".dbt"))


def load_connection(
    project_dir: str,
    profiles_dir: Optional[str] = None,
    target: Optional[str] = None,
    profile: Optional[str] = None,
) -> DbtConnection:
    """dbt_project.yml `profile:` → profiles.yml profile → target →
    rendered credentials (reference get_connection_creds,
    dbt_parser.py:291-335)."""
    proj = Path(project_dir)
    if profile is None:
        with open(proj / PROJECT_FILE) as f:
            profile = (yaml.safe_load(f) or {}).get("profile")
        if not profile:
            raise DbtProfileNotFoundError(f"no 'profile' in {proj / PROJECT_FILE}")

    if profiles_dir is not None:
        pdir = Path(profiles_dir)
    elif (proj / PROFILES_FILE).exists():  # legacy in-project profiles.yml
        pdir = proj
    else:
        pdir = default_profiles_dir()
    ppath = pdir / PROFILES_FILE
    with open(ppath) as f:
        profiles = yaml.safe_load(f) or {}

    if profile not in profiles:
        raise DbtProfileNotFoundError(f"no profile {profile!r} in {ppath}")
    prof = profiles[profile]
    tgt = target or render_env_vars(prof.get("target"))
    if not tgt:
        raise DbtProfileNotFoundError(f"no target in profile {profile!r} in {ppath}")
    outputs = prof.get("outputs") or {}
    if tgt not in outputs:
        raise DbtProfileNotFoundError(
            f"no credentials for target {tgt!r} in profile {profile!r} in {ppath}"
        )
    creds = render_env_vars(outputs[tgt])
    ctype = (creds.get("type") or "").lower()
    if not ctype:
        raise DbtProfileNotFoundError(f"no type for target {tgt!r} in {ppath}")
    return DbtConnection(type=ctype, credentials=creds, target=tgt, profile=profile)


def uri_for(conn: DbtConnection, path: Tuple[str, ...]) -> Tuple[str, Dict]:
    """(database, schema, alias) relation path → (URI, reader options) for
    sources/connect.read_uri. The relation path comes from the manifest
    (dbt.DbtModel.dev_path / prod_path)."""
    creds = conn.credentials
    if conn.type == "duckdb":
        db = creds.get("path") or ""
        rel = ".".join(p for p in path[-2:] if p) if len(path) > 1 else path[-1]
        return f"duckdb://{db}#{rel}", {}
    if conn.type == "postgres":
        host = creds.get("host", "localhost")
        port = creds.get("port", 5432)
        dbname = creds.get("dbname") or creds.get("database") or ""
        rel = ".".join(p for p in path[-2:] if p) if len(path) > 1 else path[-1]
        opts = {
            "user": creds.get("user"),
            "password": creds.get("password") or creds.get("pass"),
            "dbtable": rel,
        }
        return f"jdbc:postgresql://{host}:{port}/{dbname}", {
            k: v for k, v in opts.items() if v is not None
        }
    if conn.type == "spark":
        return "table://" + ".".join(p for p in path if p), {}
    if conn.type == "parquet":
        # every relation-path part becomes a directory level under the
        # profile's root: (schema, alias) -> <root>/<schema>/<alias>.parquet
        root = creds.get("path") or creds.get("location") or "."
        rel = os.path.join(root, *[p for p in path if p])
        return f"parquet://{rel}.parquet", {}
    raise DbtConnectionNotImplementedError(
        f"profile type {conn.type!r} is not supported for dbt diffs "
        "(supported: duckdb, postgres, spark, parquet)"
    )


def profile_resolver(
    spark: SparkSession, conn: DbtConnection
) -> Callable[[Tuple[str, ...]], DataFrame]:
    """A dbt.dbt_diff-compatible resolver backed by a profiles.yml
    connection: relation path → read_uri DataFrame."""
    from data_diff_spark.sources.connect import read_uri

    def resolve(path: Tuple[str, ...]) -> DataFrame:
        uri, opts = uri_for(conn, path)
        return read_uri(spark, uri, **opts)

    return resolve


def dbt_diff_from_project(
    spark: SparkSession,
    project_dir: str,
    profiles_dir: Optional[str] = None,
    target: Optional[str] = None,
    prod_target: Optional[str] = None,
    manifest_path: Optional[str] = None,
    **dbt_diff_kwargs,
):
    """End-to-end `data-diff --dbt` shape: project dir in, per-model diffs
    out, all connections resolved from profiles.yml (reference dbt_diff,
    dbt.py:71-180, local path). `prod_target` names a second profiles
    target for the prod side (reference uses prod_database/prod_schema
    substitution; a distinct target is the Spark-native equivalent —
    falls back to the same connection with prod_database/prod_schema
    overrides in dbt_diff_kwargs)."""
    from data_diff_spark.dbt import dbt_diff

    mpath = manifest_path or os.path.join(project_dir, "target", "manifest.json")
    dev_conn = load_connection(project_dir, profiles_dir, target)
    dev_resolve = profile_resolver(spark, dev_conn)
    prod_resolve = (
        profile_resolver(spark, load_connection(project_dir, profiles_dir, prod_target))
        if prod_target
        else None
    )
    return dbt_diff(
        spark,
        manifest_path=mpath,
        resolver=dev_resolve,
        prod_resolver=prod_resolve,
        **dbt_diff_kwargs,
    )
