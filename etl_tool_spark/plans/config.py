"""YAML playbook model: load → defaults → validate, before any data is
read — mirroring the reference's plan-time semantic analysis
(internal/config/load.go:12-80, internal/config/validation.go:52-795):
expression pre-compilation, regex pre-compilation, enum checks, duplicate
target detection, cross-field rules (min ≤ max, dedup strategyField
requirements, FIPS md5 rejection)."""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any

from etl_tool_spark.expr import ExprError, translate
from etl_tool_spark.functions.registry import TRANSFORMS, _SHORTHAND_PATTERN


class ConfigError(ValueError):
    pass


@dataclass
class EndpointConfig:
    type: str
    file: str | None = None
    query: str | None = None
    options: dict[str, Any] = field(default_factory=dict)
    loader: dict[str, Any] = field(default_factory=dict)
    # Spark-native extension: stream this endpoint with Structured
    # Streaming (source: readStream over the file/dir; destination:
    # checkpointed writeStream)
    stream: bool = False
    checkpoint: str | None = None
    # Spark-native extension: incremental batch ingestion — read only
    # rows with incremental.column strictly above the high-water mark in
    # incremental.stateFile (JSON), and advance the mark after a
    # successful load. The Airbyte/Fivetran-style repeated-batch
    # contract: re-running a playbook ingests only new data.
    incremental: dict[str, Any] = field(default_factory=dict)


@dataclass
class FlatteningConfig:
    sourceField: str
    targetField: str
    includeParent: bool = True
    errorOnNonList: bool = False
    conditionField: str | None = None
    conditionValue: str | None = None


@dataclass
class DedupConfig:
    keys: list[str]
    strategy: str = "first"
    strategyField: str | None = None


@dataclass
class ErrorHandlingConfig:
    mode: str = "halt"  # halt | skip (defaults per load.go:50-60)
    logErrors: bool = True
    errorFile: str | None = None
    # Spark-native extension: streaming dead-letter queue — errored
    # records land as a JSON-lines directory (their own checkpointed
    # writeStream). The reference's errorFile (one CSV document) is
    # batch-only; this is its unbounded-stream analogue.
    deadLetterDir: str | None = None


@dataclass
class QualityConfig:
    """Spark-native extension: a Deequ/dbt-test-style gate between the
    transform chain and the load (operators/quality.py). ``checks`` is
    the run_checks spec list (row-level + unique only — relationship
    checks need a second frame and live in the Python API);
    ``maxFailures`` is the total violation budget before the run
    aborts (QualityError), mirroring halt-mode error handling."""
    checks: list[dict] = field(default_factory=list)
    maxFailures: int = 0


@dataclass
class PlaybookConfig:
    source: EndpointConfig | None = None
    destination: EndpointConfig | None = None
    filter: str | None = None
    mappings: list[dict] = field(default_factory=list)
    flattening: FlatteningConfig | None = None
    dedup: DedupConfig | None = None
    errorHandling: ErrorHandlingConfig = field(default_factory=ErrorHandlingConfig)
    fipsMode: bool = False
    dryRun: bool = False
    # Spark-native extension (SURVEY §7 M5 — ABSENT in the reference):
    # named additional sources registered as temp views, and a SQL stage
    # producing the working frame the standard chain then runs on.
    sources: dict[str, EndpointConfig] = field(default_factory=dict)
    sql: str | None = None
    quality: QualityConfig | None = None
    # Spark-native extension: additional destinations — the SAME clean
    # frame fans out to several sinks (e.g. parquet archive + CSV
    # export). Serial writes of one lazy plan; batch-only.
    destinations: list[EndpointConfig] = field(default_factory=list)


_VALID_TYPES = {"csv", "json", "parquet", "orc", "text", "yaml", "yml", "xml",
                "xlsx", "postgres", "jdbc", "cdc"}
_VALID_DEDUP = {"first", "last", "min", "max"}
_VALID_ERROR_MODES = {"halt", "skip"}


def expand_env(value: str) -> str:
    """$V / ${V} / %V% env expansion, unset → "" (internal/util/util.go:12-34).
    A single env-lookup substitution (not os.path.expandvars, which leaves
    unknown $VARS verbatim — strings mixing known and unknown vars must
    still blank the unknown ones, matching Go's os.ExpandEnv)."""
    def repl_dollar(m: re.Match) -> str:
        return os.environ.get(m.group(1) or m.group(2), "")

    def repl_pct(m: re.Match) -> str:
        return os.environ.get(m.group(1), "")

    out = re.sub(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}|\$([A-Za-z_][A-Za-z0-9_]*)",
                 repl_dollar, value)
    return re.sub(r"%([A-Za-z0-9_]+)%", repl_pct, out)


def _endpoint(raw: dict, which: str) -> EndpointConfig:
    if not isinstance(raw, dict) or "type" not in raw:
        raise ConfigError(f"{which}: missing 'type'")
    t = str(raw["type"]).lower()
    if t not in _VALID_TYPES:
        raise ConfigError(f"{which}: unsupported type {t!r}")
    file = raw.get("file")
    if file:
        file = expand_env(str(file))
    options = dict(raw.get("options") or {})
    for k in ("delimiter", "commentChar", "sheetName", "sheetIndex",
              "xmlRecordTag", "url", "connectionString"):
        if k in raw:
            options[k] = raw[k]
    checkpoint = raw.get("checkpoint")
    if checkpoint:
        checkpoint = expand_env(str(checkpoint))
    inc = dict(raw.get("incremental") or {})
    if inc:
        if not inc.get("column") or not inc.get("stateFile"):
            raise ConfigError(f"{which}: incremental needs 'column' "
                              "and 'stateFile'")
        inc["stateFile"] = expand_env(str(inc["stateFile"]))
    return EndpointConfig(type=t, file=file, query=raw.get("query"),
                          options=options, loader=dict(raw.get("loader") or {}),
                          stream=bool(raw.get("stream", False)),
                          checkpoint=checkpoint, incremental=inc)


def load_config(path_or_dict: str | dict) -> PlaybookConfig:
    if isinstance(path_or_dict, dict):
        raw = path_or_dict
    else:
        import yaml

        with open(path_or_dict) as f:
            raw = yaml.safe_load(f) or {}
    if "source" not in raw and not raw.get("sources"):
        raise ConfigError("playbook requires a 'source' (or 'sources' + 'sql')")
    raw_sources = raw.get("sources") or {}
    if not isinstance(raw_sources, dict):
        raise ConfigError("'sources' must be a mapping of name -> endpoint")
    cfg = PlaybookConfig(
        source=_endpoint(raw["source"], "source") if "source" in raw else None,
        sources={str(n): _endpoint(ep, f"sources.{n}")
                 for n, ep in raw_sources.items()},
        sql=raw.get("sql"),
        destination=_endpoint(raw["destination"], "destination") if raw.get("destination") else None,
        destinations=[_endpoint(d, f"destinations[{i}]")
                      for i, d in enumerate(raw.get("destinations") or [])],
        filter=raw.get("filter"),
        mappings=list(raw.get("mappings") or []),
        flattening=FlatteningConfig(**raw["flattening"]) if raw.get("flattening") else None,
        dedup=DedupConfig(**raw["dedup"]) if raw.get("dedup") else None,
        quality=QualityConfig(**raw["quality"]) if raw.get("quality") else None,
        errorHandling=ErrorHandlingConfig(**(raw.get("errorHandling") or {})),
        fipsMode=bool(raw.get("fipsMode", False)),
    )
    if cfg.errorHandling.errorFile:
        # the reference expands the error-file path too (app.go:106-110)
        cfg.errorHandling.errorFile = expand_env(str(cfg.errorHandling.errorFile))
    if cfg.destination is None and cfg.destinations:
        # a playbook listing every sink under `destinations:` means
        # "write everywhere", not "dry run": promote the first to primary
        cfg.destination = cfg.destinations[0]
        cfg.destinations = cfg.destinations[1:]
    validate_config(cfg)
    return cfg


_VIEW_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def validate_config(cfg: PlaybookConfig) -> None:
    errors: list[str] = []

    if cfg.sources and not cfg.sql:
        errors.append("'sources' requires a 'sql' stage that consumes them")
    if cfg.sql is not None:
        if not str(cfg.sql).strip():
            errors.append("sql: must be a non-empty query")
        if not cfg.sources and cfg.source is None:
            errors.append("sql: requires 'sources' (or a 'source', "
                          "registered as view 'src')")
        for name in cfg.sources:
            if not _VIEW_NAME.match(name):
                errors.append(f"sources.{name}: not a valid view name")
            if name == "src" and cfg.source is not None:
                errors.append("sources.src: name collides with the implicit "
                              "'src' view of the primary source")
    if cfg.source is None and cfg.sql is None:
        errors.append("playbook requires a 'source' or a 'sources' + 'sql' stage")

    if cfg.source is not None and cfg.source.stream:
        # Streaming pipeline restrictions (each would need an action or
        # an unsupported-on-stream operator):
        if cfg.source.type not in ("csv", "json", "parquet", "orc", "text"):
            errors.append("source.stream: only file sources "
                          "(csv/json/parquet/orc) can stream")
        if cfg.sql:
            errors.append("source.stream: the 'sql' stage is batch-only")
        if cfg.quality:
            errors.append("source.stream: quality checks aggregate the "
                          "whole table — batch-only")
        if cfg.destinations:
            errors.append("source.stream: multiple destinations are "
                          "batch-only")
        if cfg.source.incremental:
            errors.append("source.stream: incremental high-water-mark "
                          "reads are batch-only (streams checkpoint "
                          "progress natively)")
        if cfg.dedup:
            errors.append("source.stream: dedup needs a window over the "
                          "whole input — use streaming dedup "
                          "(etl_tool_spark.streaming) instead")
        if cfg.errorHandling.mode == "halt":
            errors.append("source.stream: halt mode needs a blocking error "
                          "count; use errorHandling.mode: skip")
        if cfg.errorHandling.errorFile:
            errors.append("source.stream: errorFile is batch-only")
        if cfg.destination is not None and cfg.destination.type not in (
                "csv", "json", "parquet", "orc", "text", "cdc"):
            errors.append("source.stream: destination must be a file sink "
                          "(csv/json/parquet/orc) or a cdc snapshot")

    if cfg.filter:
        try:
            translate(cfg.filter)
        except ExprError as e:
            errors.append(f"filter: {e}")

    seen_targets: set[str] = set()
    for i, rule in enumerate(cfg.mappings):
        target = rule.get("target")
        if not target:
            errors.append(f"mappings[{i}]: missing 'target'")
            continue
        if target in seen_targets:
            errors.append(f"mappings[{i}].target: duplicate target field {target!r}")
        seen_targets.add(target)
        name = (rule.get("transform") or "").strip()
        key = name.lower()
        if ":" in name:
            base = name.split(":", 1)[0].lower()
            if base in _SHORTHAND_PATTERN:
                key = base
        if key and key not in TRANSFORMS:
            errors.append(f"mappings[{i}].transform: unknown transform {name!r}")
        params = rule.get("params") or {}
        for pat_key in ("pattern",):
            if pat_key in params:
                try:
                    re.compile(params[pat_key])
                except re.error as e:
                    errors.append(f"mappings[{i}].params.{pat_key}: bad regex: {e}")
        if key == "branch":
            for j, b in enumerate(params.get("branches") or []):
                try:
                    translate(str(b.get("condition", "")), resolver=lambda n: None)
                except ExprError as e:
                    errors.append(f"mappings[{i}].branches[{j}].condition: {e}")
        if key == "hash":
            algo = str(params.get("algorithm", "")).lower()
            if algo not in ("sha256", "sha512", "md5"):
                errors.append(f"mappings[{i}]: unsupported hash algorithm {algo!r}")
            elif cfg.fipsMode and algo == "md5":
                errors.append(f"mappings[{i}]: md5 not allowed in FIPS mode")
        if key == "fingerprint" and cfg.fipsMode:
            # fingerprint is md5-based by construction (llm/text.py)
            errors.append(f"mappings[{i}]: fingerprint (md5) not allowed "
                          "in FIPS mode")
        if key == "validatenumericrange":
            lo, hi = params.get("min"), params.get("max")
            if lo is None and hi is None:
                errors.append(f"mappings[{i}]: validateNumericRange needs min and/or max")
            elif lo is not None and hi is not None and float(lo) > float(hi):
                errors.append(f"mappings[{i}]: min > max")

    if cfg.quality is not None:
        if not cfg.quality.checks:
            errors.append("quality: 'checks' must be non-empty")
        for i, chk in enumerate(cfg.quality.checks):
            t = (chk.get("type") or "").lower()
            if t not in ("not_null", "unique", "accepted_values", "range"):
                errors.append(f"quality: check {i}: unknown or unsupported "
                              f"type {chk.get('type')!r} (relationship "
                              "checks are Python-API only)")
            elif t == "unique":
                if not (chk.get("columns") or chk.get("column")):
                    errors.append(f"quality: check {i}: unique needs "
                                  "'columns'")
            elif not chk.get("column"):
                errors.append(f"quality: check {i}: needs 'column'")
            if t == "accepted_values" and not chk.get("values"):
                errors.append(f"quality: check {i}: accepted_values needs "
                              "'values'")
            if t == "range" and "min" not in chk and "max" not in chk:
                errors.append(f"quality: check {i}: range needs min or max")
        if int(cfg.quality.maxFailures) < 0:
            errors.append("quality: maxFailures cannot be negative")

    if cfg.dedup:
        if not cfg.dedup.keys:
            errors.append("dedup: 'keys' must be non-empty")
        strat = (cfg.dedup.strategy or "first").lower()
        if strat not in _VALID_DEDUP:
            errors.append(f"dedup: unknown strategy {strat!r}")
        if strat in ("min", "max") and not cfg.dedup.strategyField:
            errors.append(f"dedup: strategy {strat!r} requires strategyField")

    for i, d in enumerate([cfg.destination, *cfg.destinations]):
        if d is not None and d.type == "cdc" \
                and not {**d.options, **d.loader}.get("keys"):
            where = "destination" if i == 0 else f"destinations[{i - 1}]"
            errors.append(f"{where}: cdc sink requires options.keys "
                          "(the snapshot's key columns)")

    if cfg.destination and cfg.destination.loader:
        # loader config rules (internal/config/validation.go:251-285)
        ldr = cfg.destination.loader
        mode = str(ldr.get("mode", "")).lower()
        if mode not in ("", "sql"):
            errors.append(f"destination.loader.mode: invalid mode {mode!r}, "
                          "must be 'sql' or empty (for COPY)")
        if mode == "sql" and not ldr.get("command"):
            errors.append("destination.loader.command is required when "
                          "loader mode is 'sql'")
        if mode != "sql":
            import warnings

            for k in ("command", "preload", "postload"):
                if ldr.get(k):
                    warnings.warn(f"destination.loader.{k} is ignored when "
                                  "loader mode is not 'sql'", stacklevel=2)
        if int(ldr.get("batch_size", 0)) < 0:
            errors.append("destination.loader.batch_size cannot be negative")

    if cfg.errorHandling.mode not in _VALID_ERROR_MODES:
        errors.append(f"errorHandling.mode must be one of {_VALID_ERROR_MODES}")
    if cfg.errorHandling.mode == "skip" and cfg.errorHandling.errorFile:
        pass  # path checked at write time

    if errors:
        raise ConfigError("invalid playbook:\n" + "\n".join(f"- {e}" for e in errors))
