"""Playbook config model + pipeline compiler/runner — the engine's
"parser/analyzer" layer (reference: internal/config/load.go + validation.go
+ internal/app/app.go:148-181)."""

from etl_tool_spark.plans.config import PlaybookConfig, load_config, validate_config
from etl_tool_spark.plans.pipeline import run_pipeline

__all__ = ["PlaybookConfig", "load_config", "validate_config", "run_pipeline"]
