"""profiles.yml → connection → URI resolution (reference
dbt_parser.py:291-432, connection part) and the end-to-end
project-dir-in/diffs-out path with zero manual URI flags."""

import json
import os

import duckdb
import pytest

from data_diff_spark.dbt_profiles import (
    DbtConnection,
    DbtConnectionNotImplementedError,
    DbtProfileNotFoundError,
    dbt_diff_from_project,
    load_connection,
    render_env_vars,
    uri_for,
)

PROFILES = """
jaffle:
  target: "{{ env_var('DBT_TARGET', 'dev') }}"
  outputs:
    dev:
      type: duckdb
      path: "@DUCK@"
    prod:
      type: parquet
      path: "@PQROOT@"
    pg:
      type: postgres
      host: "{{ env_var('PGHOST', 'db.example.com') }}"
      port: 5439
      user: alice
      password: "{{ env_var('NOPE_PG_PASSWORD', 's3cret') }}"
      dbname: analytics
    warehouse:
      type: spark
    exotic:
      type: snowflake
"""

PROJECT = "name: jaffle\nprofile: jaffle\n"


def _manifest(schema):
    def model(name, pk):
        return {
            "resource_type": "model",
            "name": name,
            "alias": name,
            "database": None,
            "schema": schema,
            "columns": {pk: {"meta": {"primary-key": True}}},
            "meta": {},
        }

    return {"nodes": {
        "model.jaffle.users": model("users", "id"),
        "model.jaffle.orders": model("orders", "oid"),
    }}


@pytest.fixture()
def project(tmp_path):
    duck = tmp_path / "dev.duckdb"
    pqroot = tmp_path / "prod"
    proj = tmp_path / "proj"
    (proj / "target").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(PROJECT)
    (proj / "profiles.yml").write_text(
        PROFILES.replace("@DUCK@", str(duck)).replace("@PQROOT@", str(pqroot))
    )
    (proj / "target" / "manifest.json").write_text(json.dumps(_manifest("main")))

    con = duckdb.connect(str(duck))
    con.execute("create table users (id bigint, name varchar)")
    con.execute("insert into users values (1,'a'), (2,'b'), (3,'c')")
    con.execute("create table orders (oid bigint, amt double)")
    con.execute("insert into orders values (10, 5.0), (11, 6.0)")
    con.close()

    os.makedirs(pqroot / "main", exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    # prod differs: users row 3 renamed, orders row 12 extra
    pq.write_table(
        pa.table({"id": [1, 2, 3], "name": ["a", "b", "C"]}),
        pqroot / "main" / "users.parquet",
    )
    pq.write_table(
        pa.table({"oid": [10, 11, 12], "amt": [5.0, 6.0, 7.0]}),
        pqroot / "main" / "orders.parquet",
    )
    return proj


def test_env_var_rendering(monkeypatch):
    monkeypatch.setenv("MYVAR", "hello")
    assert render_env_vars("{{ env_var('MYVAR') }}/x") == "hello/x"
    assert render_env_vars("{{ env_var('NOPE_UNSET', 'dflt') }}") == "dflt"
    assert render_env_vars({"a": ["{{ env_var('MYVAR') }}"]}) == {"a": ["hello"]}
    with pytest.raises(DbtProfileNotFoundError):
        render_env_vars("{{ env_var('NOPE_UNSET') }}")


def test_load_connection_targets(project, monkeypatch):
    conn = load_connection(str(project))  # target from env_var default
    assert conn.type == "duckdb" and conn.target == "dev"
    monkeypatch.setenv("DBT_TARGET", "prod")
    assert load_connection(str(project)).type == "parquet"
    pg = load_connection(str(project), target="pg")
    assert pg.credentials["host"] == "db.example.com"  # env default rendered
    assert pg.credentials["password"] == "s3cret"
    with pytest.raises(DbtProfileNotFoundError):
        load_connection(str(project), target="missing")


def test_uri_mapping(project):
    duck = load_connection(str(project))
    uri, _ = uri_for(duck, ("main", "users"))
    assert uri.endswith(".duckdb#main.users")
    pg = load_connection(str(project), target="pg")
    uri, opts = uri_for(pg, (None, "analytics_schema", "users")[1:])
    assert uri == "jdbc:postgresql://db.example.com:5439/analytics"
    assert opts == {"user": "alice", "password": "s3cret",
                    "dbtable": "analytics_schema.users"}
    wh = load_connection(str(project), target="warehouse")
    assert uri_for(wh, ("cat", "sch", "t"))[0] == "table://cat.sch.t"
    with pytest.raises(DbtConnectionNotImplementedError):
        uri_for(load_connection(str(project), target="exotic"), ("t",))


def test_project_diff_end_to_end(spark, project):
    """Two-model prod(parquet target) vs dev(duckdb target) diff with no
    manual URIs — the reference's `data-diff --dbt` daily-driver flow."""
    results = {r.model: r for r in dbt_diff_from_project(
        spark, str(project), prod_target="prod"
    )}
    assert sorted(results) == ["orders", "users"]
    assert results["users"].skipped is None
    assert results["users"].primary_keys == ["id"]
    # users: id=3 name differs -> one updated row
    assert results["users"].stats["updated"] == 1
    assert results["users"].stats["exclusive_A"] == 0
    # orders: prod (table A) has one extra row
    assert results["orders"].stats["exclusive_A"] == 1
    assert results["orders"].stats["updated"] == 0


def test_project_cli_mode(spark, project, capsys):
    """data-diff --dbt-project-dir DIR --dbt-prod-target prod: the full
    profiles-resolved flow from the command line."""
    from data_diff_spark.cli import main

    rc = main([
        "--dbt-project-dir", str(project), "--dbt-prod-target", "prod",
        "--json",
    ], spark=spark)
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l]
    by_model = {l["model"]: l for l in lines}
    assert by_model["users"]["updated"] == 1
    assert by_model["orders"]["exclusive_A"] == 1
