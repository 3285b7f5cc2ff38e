"""End-to-end playbook tests replicating the reference's app-level
scenarios (internal/app/app_test.go; man-page examples man.txt:261-338):
filter → mapping → flatten → dedup → sink, dry-run, halt/skip + error
file, format round-trips."""

import json
import os

import pytest

from etl_tool_spark.operators.errors import PipelineHaltError
from etl_tool_spark.plans import load_config, run_pipeline
from etl_tool_spark.plans.config import ConfigError


@pytest.fixture()
def workdir(tmp_path):
    csv = tmp_path / "input.csv"
    csv.write_text(
        "user_id,email,status,amount\n"
        " 1 ,A@X.COM,active,50\n"
        "2,b@y.org,inactive,10\n"
        "12.0,C@Z.IO,active,99\n"
        "abc,bad,active,7\n")
    return tmp_path


def test_e2e_filter_map_skip(spark, workdir):
    out = workdir / "out.json"
    errf = workdir / "errors"
    cfg = load_config({
        "source": {"type": "csv", "file": str(workdir / "input.csv")},
        "filter": "status == 'active' && amount > 0",
        "mappings": [
            {"source": "user_id", "target": "uid", "transform": "mustToInt"},
            {"source": "email", "target": "email", "transform": "toLowerCase"},
        ],
        "errorHandling": {"mode": "skip", "errorFile": str(errf)},
        "destination": {"type": "json", "file": str(out)},
    })
    run_pipeline(spark, cfg)
    records = json.loads(out.read_text())
    assert sorted(r["uid"] for r in records) == [1, 12]
    assert all(r["email"] == r["email"].lower() for r in records)
    err_rows = [f for f in os.listdir(errf) if f.endswith(".csv")]
    assert err_rows, "error file written"


def test_e2e_halt(spark, workdir):
    cfg = load_config({
        "source": {"type": "csv", "file": str(workdir / "input.csv")},
        "mappings": [{"source": "user_id", "target": "uid", "transform": "mustToInt"}],
        "errorHandling": {"mode": "halt"},
    })
    with pytest.raises(PipelineHaltError):
        run_pipeline(spark, cfg)


def test_dry_run_no_write(spark, workdir):
    out = workdir / "never.json"
    cfg = load_config({
        "source": {"type": "csv", "file": str(workdir / "input.csv")},
        "filter": "status == 'active'",
        "destination": {"type": "json", "file": str(out)},
    })
    res = run_pipeline(spark, cfg, dry_run=True)
    assert not res.written and not out.exists()
    assert res.output.count() == 3


def test_flatten_dedup_example(spark, tmp_path):
    """man.txt:317-338 shape: flatten a list then dedup on the item."""
    src = tmp_path / "in.json"
    src.write_text(json.dumps([
        {"order": "A", "items": ["x", "y", "x"]},
        {"order": "B", "items": ["x"]},
    ]))
    out = tmp_path / "out.json"
    cfg = load_config({
        "source": {"type": "json", "file": str(src)},
        "flattening": {"sourceField": "items", "targetField": "item"},
        "dedup": {"keys": ["item"], "strategy": "first"},
        "destination": {"type": "json", "file": str(out)},
    })
    run_pipeline(spark, cfg)
    records = json.loads(out.read_text())
    assert sorted(r["item"] for r in records) == ["x", "y"]
    by_item = {r["item"]: r["order"] for r in records}
    assert by_item["x"] == "A"  # first encounter wins


def test_yaml_xml_roundtrip(spark, tmp_path):
    yml = tmp_path / "in.yaml"
    yml.write_text("- {id: 1, name: a}\n- {id: 2, name: b}\n")
    out_xml = tmp_path / "out.xml"
    cfg = load_config({
        "source": {"type": "yaml", "file": str(yml)},
        "destination": {"type": "xml", "file": str(out_xml)},
    })
    run_pipeline(spark, cfg)
    text = out_xml.read_text()
    assert "<records>" in text and text.count("<record>") == 2

    # read the XML back
    from etl_tool_spark.sources.registry import read_source

    df = read_source(spark, "xml", str(out_xml), attach_seq=False)
    assert sorted(r["name"] for r in df.collect()) == ["a", "b"]


def test_env_expansion(tmp_path, monkeypatch):
    monkeypatch.setenv("ETL_IN", str(tmp_path))
    cfg = load_config({"source": {"type": "csv", "file": "$ETL_IN/x.csv"}})
    assert cfg.source.file == f"{tmp_path}/x.csv"
    monkeypatch.delenv("ETL_IN")
    cfg = load_config({"source": {"type": "csv", "file": "$ETL_IN/x.csv"}})
    assert cfg.source.file == "/x.csv"  # unset → "" (util.go:12-34)
    # mixed known + unknown: the unknown var must STILL blank (Go
    # os.ExpandEnv maps unset → ""), even though part of the string expands
    monkeypatch.setenv("ETL_IN", "/data")
    cfg = load_config({"source": {"type": "csv", "file": "$ETL_IN/d/$UNSET.csv"}})
    assert cfg.source.file == "/data/d/.csv"
    # ${V} braces and %V% styles
    cfg = load_config({"source": {"type": "csv", "file": "${ETL_IN}/%ETL_IN%/x"}})
    assert cfg.source.file == "/data//data/x"


def test_filter_eval_errors_reach_error_file(spark, tmp_path):
    """Records whose filter predicate errors (null result) are written to
    the error file under skip mode (app.go:156-161) — not silently
    dropped; halt mode does NOT halt on them."""
    src = tmp_path / "in.csv"
    src.write_text("id,amount\n1,10\n2,xx\n3,30\n")
    err_dir = tmp_path / "errs"
    cfg = load_config({
        "source": {"type": "csv", "file": str(src)},
        "filter": "amount > 5",   # 'xx' → numeric coercion fails → null
        "errorHandling": {"mode": "skip", "errorFile": str(err_dir)},
        "destination": {"type": "csv", "file": str(tmp_path / "out")},
    })
    res = run_pipeline(spark, cfg)
    kept = {r["id"] for r in res.output.collect()}
    assert kept == {"1", "3"}
    errs = res.errors.collect()
    assert len(errs) == 1
    assert errs[0]["id"] == "2"
    assert errs[0]["etl_error_message"] == "filter eval error"
    import glob

    txt = "".join(open(f).read() for f in glob.glob(f"{err_dir}/*.csv"))
    assert "filter eval error" in txt and ",2," in txt or "2," in txt

    # halt mode: filter-eval errors do NOT halt (reference never halts on
    # filter errors, only on processing errors)
    cfg2 = load_config({
        "source": {"type": "csv", "file": str(src)},
        "filter": "amount > 5",
        "errorHandling": {"mode": "halt"},
        "destination": {"type": "csv", "file": str(tmp_path / "out2")},
    })
    res2 = run_pipeline(spark, cfg2)
    assert {r["id"] for r in res2.output.collect()} == {"1", "3"}


def test_loader_validation():
    with pytest.raises(ConfigError, match="command is required"):
        load_config({"source": {"type": "csv", "file": "x"},
                     "destination": {"type": "postgres",
                                     "loader": {"mode": "sql"}}})
    with pytest.raises(ConfigError, match="invalid mode"):
        load_config({"source": {"type": "csv", "file": "x"},
                     "destination": {"type": "postgres",
                                     "loader": {"mode": "copy2"}}})
    with pytest.warns(UserWarning, match="preload is ignored"):
        load_config({"source": {"type": "csv", "file": "x"},
                     "destination": {"type": "postgres",
                                     "loader": {"preload": ["TRUNCATE t"]}}})


def test_validation_catalog(spark):
    bads = [
        ({"source": {"type": "nope", "file": "x"}}, "unsupported type"),
        ({"source": {"type": "csv", "file": "x"},
          "mappings": [{"source": "a", "target": "t", "transform": "hash",
                        "params": {"algorithm": "md5", "fields": ["a"]}}],
          "fipsMode": True}, "FIPS"),
        ({"source": {"type": "csv", "file": "x"},
          "mappings": [{"source": "a", "target": "t",
                        "transform": "validateNumericRange",
                        "params": {"min": 10, "max": 1}}]}, "min > max"),
        ({"source": {"type": "csv", "file": "x"},
          "errorHandling": {"mode": "explode"}}, "mode"),
    ]
    for raw, _hint in bads:
        with pytest.raises(ConfigError):
            load_config(raw)


def test_error_file_stringifies_complex_columns(spark, tmp_path):
    """A failing record whose original row holds an array column must land
    in the CSV error file (stringified), not crash the CSV write — the
    reference's error writer uses the same %v rendering as its data
    writer (csv.go:448-462)."""
    src = tmp_path / "in.json"
    src.write_text(json.dumps([
        {"id": 1, "amount": "7", "tags": ["a", "b"]},
        {"id": 2, "amount": "nope", "tags": ["c"]},
    ]))
    err_dir = tmp_path / "errs"
    out = tmp_path / "out.json"
    cfg = load_config({
        "source": {"type": "json", "file": str(src)},
        "mappings": [
            {"source": "amount", "target": "amount", "transform": "mustToFloat"},
            {"source": "id", "target": "id"},
            {"source": "tags", "target": "tags"},
        ],
        "errorHandling": {"mode": "skip", "errorFile": str(err_dir)},
        "destination": {"type": "json", "file": str(out)},
    })
    run_pipeline(spark, cfg)
    assert [r["id"] for r in json.loads(out.read_text())] == [1]
    body = "".join((err_dir / f).read_text() for f in os.listdir(err_dir)
                   if f.endswith(".csv"))
    assert "nope" in body and "[c]" in body and "mustToFloat" in body


def test_sql_stage_join_two_sources(spark, tmp_path):
    """Spark-native playbook extension: two named sources joined by a
    'sql' stage, with the standard mapping/dedup/load chain on top."""
    orders = tmp_path / "orders.csv"
    orders.write_text("order_id,cust,amount\n1,a,10\n2,b,5\n3,a,7\n")
    custs = tmp_path / "custs.csv"
    custs.write_text("cust,region\na,west\nb,east\n")
    out = tmp_path / "out.csv"
    cfg = load_config({
        "sources": {
            "orders": {"type": "csv", "file": str(orders)},
            "custs": {"type": "csv", "file": str(custs)},
        },
        "sql": """
            SELECT o.order_id, o.amount, c.region
            FROM orders o JOIN custs c ON o.cust = c.cust
        """,
        "mappings": [
            {"source": "order_id", "target": "order_id", "transform": "mustToInt"},
            {"source": "region", "target": "region", "transform": "toUpperCase"},
            {"source": "amount", "target": "amount", "transform": "toInt"},
        ],
        "destination": {"type": "csv", "file": str(out)},
    })
    run_pipeline(spark, cfg)
    import csv as _csv
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    rows = []
    for f in files:
        with open(out / f) as fh:
            rows.extend(_csv.DictReader(fh))
    got = sorted((r["order_id"], r["region"], r["amount"]) for r in rows)
    assert got == [("1", "WEST", "10"), ("2", "EAST", "5"), ("3", "WEST", "7")]


def test_sql_stage_primary_source_is_src_view(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,x\n2,y\n")
    cfg = load_config({
        "source": {"type": "csv", "file": str(src)},
        "sql": "SELECT id, upper(v) AS v FROM src WHERE id <> '2'",
    })
    res = run_pipeline(spark, cfg)
    assert [(r["id"], r["v"]) for r in res.output.collect()] == [("1", "X")]


def test_sql_stage_validation():
    with pytest.raises(ConfigError, match="requires a 'sql' stage"):
        load_config({"sources": {"a": {"type": "csv", "file": "x.csv"}}})
    with pytest.raises(ConfigError, match="not a valid view name"):
        load_config({"sources": {"bad-name": {"type": "csv", "file": "x.csv"}},
                     "sql": "SELECT 1"})
    with pytest.raises(ConfigError, match="requires a 'source'"):
        load_config({"sql": "SELECT 1"})
    with pytest.raises(ConfigError, match="collides with the implicit"):
        load_config({"source": {"type": "csv", "file": "x.csv"},
                     "sources": {"src": {"type": "csv", "file": "y.csv"}},
                     "sql": "SELECT * FROM src"})


def test_streaming_playbook_matches_batch(spark, tmp_path):
    """source.stream: the same playbook semantics through Structured
    Streaming — the streamed output equals the batch run's output."""
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "a.csv").write_text("id,status,amount\n1,active,10\n2,bad,3\n")
    (src_dir / "b.csv").write_text("id,status,amount\n3,active,7\n4,active,x\n")
    base = {
        "filter": "status == 'active'",
        "mappings": [
            {"source": "id", "target": "id", "transform": "mustToInt"},
            {"source": "amount", "target": "amount", "transform": "toFloat"},
        ],
        "errorHandling": {"mode": "skip"},
    }
    stream_out = tmp_path / "out_stream"
    cfg_s = load_config({
        **base,
        "source": {"type": "csv", "file": str(src_dir), "stream": True},
        "destination": {"type": "parquet", "file": str(stream_out),
                        "checkpoint": str(tmp_path / "ckpt")},
    })
    res_s = run_pipeline(spark, cfg_s)
    assert res_s.written

    cfg_b = load_config({
        **base,
        "source": {"type": "csv", "file": str(src_dir)},
    })
    res_b = run_pipeline(spark, cfg_b)
    want = sorted((r["id"], r["amount"]) for r in res_b.output.collect())
    got = sorted((r["id"], r["amount"]) for r in res_s.output.collect())
    assert got == want and len(got) == 3  # id=4 amount 'x' -> toFloat null ok


def test_streaming_playbook_validation():
    src = {"type": "csv", "file": "in.csv", "stream": True}
    with pytest.raises(ConfigError, match="halt mode"):
        load_config({"source": src, "errorHandling": {"mode": "halt"}})
    with pytest.raises(ConfigError, match="dedup"):
        load_config({"source": src, "errorHandling": {"mode": "skip"},
                     "dedup": {"keys": ["id"]}})
    with pytest.raises(ConfigError, match="batch-only"):
        load_config({"source": src, "errorHandling": {"mode": "skip"},
                     "sql": "SELECT * FROM src"})


def test_metrics_from_load_action(spark, workdir):
    out = workdir / "m_out"
    cfg = load_config({
        "source": {"type": "csv", "file": str(workdir / "input.csv")},
        "filter": "status == 'active'",
        "destination": {"type": "parquet", "file": str(out)},
    })
    res = run_pipeline(spark, cfg)
    assert res.metrics == {"rows_out": 3}
    res2 = run_pipeline(spark, cfg, dry_run=True)
    assert res2.metrics == {"rows_out": 3}


def test_partitioned_write_options(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("id,grp\n1,a\n2,b\n3,a\n")
    out = tmp_path / "pq"
    cfg = load_config({
        "source": {"type": "csv", "file": str(src)},
        "destination": {"type": "parquet", "file": str(out),
                        "options": {"partitionBy": "grp",
                                    "maxRecordsPerFile": 1}},
    })
    run_pipeline(spark, cfg)
    assert (out / "grp=a").is_dir() and (out / "grp=b").is_dir()
    back = spark.read.parquet(str(out)).filter("grp = 'a'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == 2


def test_error_count_metric(spark, workdir):
    errf = workdir / "errs2"
    cfg = load_config({
        "source": {"type": "csv", "file": str(workdir / "input.csv")},
        "mappings": [{"source": "user_id", "target": "uid",
                      "transform": "mustToInt"}],
        "errorHandling": {"mode": "skip", "errorFile": str(errf)},
        "destination": {"type": "parquet", "file": str(workdir / "m2_out")},
    })
    res = run_pipeline(spark, cfg)
    # 'abc' fails mustToInt; the errorFile write action reports it
    assert res.metrics["rows_error"] == 1
    assert res.metrics["rows_out"] == 3


def test_quality_gate_passes_and_blocks(spark, tmp_path):
    """The playbook quality gate loads when within budget and aborts
    the load (nothing written) when violations exceed maxFailures."""
    import os

    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline
    from etl_tool_spark.plans.pipeline import QualityError

    src = tmp_path / "in.csv"
    src.write_text("id,status,amount\n1,active,10\n2,active,-3\n3,weird,5\n")

    def pb(max_failures):
        cfg = {
            "source": {"type": "csv", "file": str(src)},
            "mappings": [
                {"source": "id", "target": "id", "transform": "toInt"},
                {"source": "status", "target": "status"},
                {"source": "amount", "target": "amount",
                 "transform": "toFloat"},
            ],
            "quality": {
                "checks": [
                    {"type": "accepted_values", "column": "status",
                     "values": ["active", "inactive"]},
                    {"type": "range", "column": "amount", "min": 0},
                    {"type": "unique", "columns": ["id"]},
                ],
                "maxFailures": max_failures,
            },
            "destination": {"type": "csv",
                            "file": str(tmp_path / f"out{max_failures}.csv")},
        }
        p = tmp_path / f"pb{max_failures}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        return load_config(str(p))

    # 2 violations (weird status, negative amount); budget 5 → loads
    res = run_pipeline(spark, pb(5))
    assert res.written and res.metrics["quality_failures"] == 2
    # budget 0 → aborts, nothing written
    with pytest.raises(QualityError, match="range.amount.=1"):
        run_pipeline(spark, pb(0))
    assert not os.path.exists(tmp_path / "out0.csv")


def test_quality_config_validation(tmp_path):
    import yaml

    from etl_tool_spark.plans import load_config
    from etl_tool_spark.plans.config import ConfigError

    src = tmp_path / "x.csv"
    src.write_text("a\n1\n")
    bad = {
        "source": {"type": "csv", "file": str(src)},
        "mappings": [{"source": "a", "target": "a"}],
        "quality": {"checks": [{"type": "relationship", "column": "a"}]},
    }
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump(bad))
    with pytest.raises(ConfigError, match="unknown or unsupported"):
        load_config(str(p))


def test_streaming_dead_letter_queue(spark, tmp_path):
    """Stream mode with deadLetterDir: clean rows land in the
    destination, errored records (with etl_error_message) land as
    JSON-lines in the DLQ — the streaming analogue of errorFile."""
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "a.csv").write_text("id,amount\n1,10\n2,notnum\n3,30\n")
    cfg = {
        "source": {"type": "csv", "file": str(src_dir / "*.csv"),
                   "stream": True},
        "mappings": [
            {"source": "id", "target": "id", "transform": "toInt"},
            {"source": "amount", "target": "amount",
             "transform": "mustToFloat"},
        ],
        "errorHandling": {"mode": "skip",
                          "deadLetterDir": str(tmp_path / "dlq")},
        "destination": {"type": "csv", "file": str(tmp_path / "out"),
                        "checkpoint": str(tmp_path / "ckpt")},
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    res = run_pipeline(spark, load_config(str(p)))
    assert res.written
    clean_ids = sorted(int(r["id"]) for r in res.output.collect())
    assert clean_ids == [1, 3]
    dlq = spark.read.json(str(tmp_path / "dlq"))
    rows = dlq.collect()
    assert len(rows) == 1
    assert "mustToFloat" in rows[0]["etl_error_message"] or \
        "rule" in rows[0]["etl_error_message"]


def test_incremental_high_water_mark(spark, tmp_path):
    """Repeated playbook runs ingest only rows above the stored mark:
    run 1 loads everything and records max(id); run 2 with new+old rows
    appends only the new ones; a run with nothing new keeps the mark."""
    import json

    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline

    src = tmp_path / "in.csv"
    state = tmp_path / "state.json"
    out = tmp_path / "out"
    cfg = {
        "source": {"type": "csv", "file": str(src),
                   "incremental": {"column": "id", "castTo": "long",
                                   "stateFile": str(state)}},
        "mappings": [{"source": "id", "target": "id", "transform": "toInt"},
                     {"source": "v", "target": "v"}],
        "destination": {"type": "csv", "file": str(out),
                        "options": {"mode": "append"}},
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))

    src.write_text("id,v\n1,a\n2,b\n")
    run_pipeline(spark, load_config(str(p)))
    assert json.load(open(state))["max"] == 2

    src.write_text("id,v\n1,a\n2,b\n3,c\n4,d\n")   # old rows re-present
    res2 = run_pipeline(spark, load_config(str(p)))
    assert res2.metrics["rows_out"] == 2            # only 3 and 4
    assert json.load(open(state))["max"] == 4

    res3 = run_pipeline(spark, load_config(str(p)))  # nothing new
    assert res3.metrics["rows_out"] == 0
    assert json.load(open(state))["max"] == 4
    rows = sorted(int(r["id"]) for r in
                  spark.read.option("header", True).csv(str(out)).collect())
    assert rows == [1, 2, 3, 4]


def test_multiple_destinations_fan_out(spark, tmp_path):
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline

    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n")
    cfg = {
        "source": {"type": "csv", "file": str(src)},
        "mappings": [{"source": "id", "target": "id", "transform": "toInt"},
                     {"source": "v", "target": "v"}],
        "destination": {"type": "parquet", "file": str(tmp_path / "main.pq")},
        "destinations": [
            {"type": "csv", "file": str(tmp_path / "export.csv")},
            {"type": "json", "file": str(tmp_path / "export.json")},
        ],
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    run_pipeline(spark, load_config(str(p)))
    assert spark.read.parquet(str(tmp_path / "main.pq")).count() == 2
    assert spark.read.option("header", True) \
        .csv(str(tmp_path / "export.csv")).count() == 2
    import json

    assert len(json.load(open(tmp_path / "export.json"))) == 2


def test_destinations_only_playbook_writes(spark, tmp_path):
    """A playbook listing every sink under `destinations:` (no primary
    `destination:`) must write them all, not silently dry-run."""
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline

    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n")
    cfg = {
        "source": {"type": "csv", "file": str(src)},
        "mappings": [{"source": "id", "target": "id", "transform": "toInt"},
                     {"source": "v", "target": "v"}],
        "destinations": [
            {"type": "parquet", "file": str(tmp_path / "a.pq")},
            {"type": "csv", "file": str(tmp_path / "b.csv")},
        ],
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    res = run_pipeline(spark, load_config(str(p)))
    assert res.written
    assert spark.read.parquet(str(tmp_path / "a.pq")).count() == 2
    assert spark.read.option("header", True).csv(
        str(tmp_path / "b.csv")).count() == 2


def test_custom_dml_playbook_metrics_do_not_block(spark, tmp_path):
    """run_pipeline over a custom-DML (loader.mode=sql) destination: the
    loader executes via an RDD action, which never fires DataFrame
    observation listeners — metrics must come from the loader counts,
    not an Observation.get that would block forever."""
    import sqlite3

    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline

    db = tmp_path / "t.db"
    sqlite3.connect(db).executescript(
        "CREATE TABLE sink (id INTEGER, v TEXT)")
    src = tmp_path / "in.csv"
    src.write_text("id,v\n1,a\n2,b\n3,c\n")
    cfg = {
        "source": {"type": "csv", "file": str(src)},
        "mappings": [{"source": "id", "target": "id", "transform": "toInt"},
                     {"source": "v", "target": "v"}],
        "destination": {
            "type": "jdbc", "file": "",
            "loader": {"mode": "sql",
                       "command": "INSERT INTO sink VALUES ($1, $2)"},
            "options": {"driver_module": "sqlite3", "url": str(db),
                        "paramstyle": "qmark"}},
        # fan-out must run on the custom-DML path too
        "destinations": [{"type": "parquet",
                          "file": str(tmp_path / "archive.pq")}],
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    res = run_pipeline(spark, load_config(str(p)))
    assert res.written and res.load_processed == 3
    assert res.metrics["rows_out"] == 3
    got = sqlite3.connect(db).execute(
        "SELECT id, v FROM sink ORDER BY id").fetchall()
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert spark.read.parquet(str(tmp_path / "archive.pq")).count() == 3


def test_cdc_destination_batch_playbook(spark, tmp_path):
    """destination type 'cdc': a batch playbook folds its change-log
    frame into the versioned snapshot store (MERGE INTO surface)."""
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline
    from etl_tool_spark.streaming.cdc import list_versions, read_snapshot

    src = tmp_path / "changes.csv"
    src.write_text("id,seq,op,payload\n"
                   "1,10,I,a0\n1,11,U,a1\n2,10,I,b0\n2,12,D,\n")
    snap = str(tmp_path / "snap")
    cfg = {
        "source": {"type": "csv", "file": str(src)},
        "mappings": [
            {"source": "id", "target": "id", "transform": "mustToInt"},
            {"source": "seq", "target": "seq", "transform": "mustToInt"},
            {"source": "op", "target": "op"},
            {"source": "payload", "target": "payload"},
        ],
        "destination": {"type": "cdc", "file": snap,
                        "options": {"keys": ["id"], "buckets": 4}},
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    res = run_pipeline(spark, load_config(str(p)))
    assert res.written
    got = {r["id"]: r["payload"]
           for r in read_snapshot(spark, snap).collect()}
    assert got == {1: "a1"}                       # 2 deleted at seq 12
    assert list_versions(spark, snap) == [1]


def test_cdc_destination_requires_keys(tmp_path):
    import yaml

    from etl_tool_spark.plans import load_config

    cfg = {
        "source": {"type": "csv", "file": "in.csv"},
        "destination": {"type": "cdc", "file": "snap"},
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ConfigError, match="cdc sink requires options.keys"):
        load_config(str(p))


def test_cdc_destination_streaming_playbook(spark, tmp_path):
    """A streaming playbook with a cdc destination: micro-batches merge
    into the snapshot; the result reads back the folded state."""
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline
    from etl_tool_spark.streaming.cdc import list_versions

    src = tmp_path / "changes"
    src.mkdir()
    spark.createDataFrame([(1, 10, "I", "a0"), (2, 10, "I", "b0")],
                          "id long, seq long, op string, payload string") \
         .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([(1, 20, "U", "a1")],
                          "id long, seq long, op string, payload string") \
         .coalesce(1).write.parquet(str(src / "f2"))
    snap = str(tmp_path / "snap")
    cfg = {
        "source": {"type": "parquet", "file": str(src / "*"),
                   "stream": True,
                   "options": {"maxFilesPerTrigger": 1}},
        "destination": {"type": "cdc", "file": snap,
                        "checkpoint": str(tmp_path / "ckpt"),
                        "options": {"keys": ["id"], "buckets": 4}},
        "errorHandling": {"mode": "skip"},
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    res = run_pipeline(spark, load_config(str(p)))
    got = {r["id"]: r["payload"] for r in res.output.collect()}
    assert got == {1: "a1", 2: "b0"}
    assert len(list_versions(spark, snap)) == 2   # one commit per batch


def test_cdc_source_reads_snapshot(spark, tmp_path):
    """source type 'cdc': a playbook consumes the folded snapshot a CDC
    playbook maintains (optionally version-pinned)."""
    import yaml

    from etl_tool_spark.plans import load_config, run_pipeline
    from etl_tool_spark.streaming.cdc import merge_cdc_batch

    snap = str(tmp_path / "snap")
    b1 = spark.createDataFrame(
        [(1, 10, "I", "a0"), (2, 10, "I", "b0")],
        "id long, seq long, op string, payload string")
    merge_cdc_batch(b1, snap, keys=["id"], batch_id=0)
    b2 = spark.createDataFrame(
        [(2, 20, "U", "b1")], "id long, seq long, op string, payload string")
    merge_cdc_batch(b2, snap, keys=["id"], batch_id=1)

    cfg = {
        "source": {"type": "cdc", "file": snap},
        "mappings": [{"source": "id", "target": "id"},
                     {"source": "payload", "target": "payload"}],
        "destination": {"type": "parquet", "file": str(tmp_path / "out.pq")},
    }
    p = tmp_path / "pb.yaml"
    p.write_text(yaml.safe_dump(cfg))
    run_pipeline(spark, load_config(str(p)))
    got = {r["id"]: r["payload"]
           for r in spark.read.parquet(str(tmp_path / "out.pq")).collect()}
    assert got == {1: "a0", 2: "b1"}

    # version pin reads history
    cfg["source"]["options"] = {"version": 1}
    cfg["destination"]["file"] = str(tmp_path / "out1.pq")
    p.write_text(yaml.safe_dump(cfg))
    run_pipeline(spark, load_config(str(p)))
    got1 = {r["id"]: r["payload"]
            for r in spark.read.parquet(str(tmp_path / "out1.pq")).collect()}
    assert got1 == {1: "a0", 2: "b0"}
