"""YAML pipeline configuration — the service-assembly analog (EP3).

The reference wires `receivers → processors → exporters` from YAML
(service.pipelines blocks, receiver/opencensusreceiver/testdata/
config.yaml:24-29; per-component defaults from factories, e.g.
exporter/omnishard/factory.go:43-79; round-trip behavior proven by the
config tests, exporter/omnishard/config_test.go:30-97).

This engine's equivalent: a YAML document declaring
  - `pipelines`: {name: {match: {role, tool}, sinks: [...]}} → the
    routes table (fan-out semantics: a turn entering pipeline P goes to
    every sink of P; several pipelines may match the same turn);
  - `sharding`: either `even: N` or an explicit shard list (validated
    exactly like sharding_config.go:59-88);
  - `tuning`: the reference's knobs with the reference's defaults
    applied when omitted (max_record_size 100000, max_span_size 900000,
    backpressure true, …).

Loading is config-time work on the driver — the output is the tiny
config DataFrames the pipeline broadcasts, so a config change never
touches operator code (hot-swap analog of encoder.go:192-200: re-run
the routing stage with the new broadcast).
"""

from __future__ import annotations

from dataclasses import dataclass

try:
    import yaml
except ImportError:  # pragma: no cover — pyyaml is present in this env
    yaml = None

from ..config import PipelineConfig
from ..functions.sharding import even_shards, validate_sharding_config

DEFAULT_TUNING = {
    "max_record_size": 100_000,        # factory.go:33
    "max_span_size": 900_000,          # factory.go:35 (max_allowed_size_per_span)
    "backpressure_on": True,           # receiver config.go:47
    "n_shards": 4,
    "n_conv_buckets": 16,
    "salt_buckets": 8,
    "drop_md5_prefix": "ff",
}


@dataclass
class ServiceConfig:
    routes: list[tuple[str, str, str, str]]   # (pipeline_id, role_pat, tool_pat, sink)
    shards: list[dict]
    pipeline: PipelineConfig


def parse_config(text: str) -> ServiceConfig:
    if yaml is None:
        raise RuntimeError("pyyaml not available")
    doc = yaml.safe_load(text) or {}

    pipelines = doc.get("pipelines") or {}
    if not pipelines:
        raise ValueError("config must declare at least one pipeline")
    routes: list[tuple[str, str, str, str]] = []
    for name, spec in pipelines.items():
        spec = spec or {}
        match = spec.get("match") or {}
        role = str(match.get("role", "*"))
        tool = str(match.get("tool", "*"))
        sinks = spec.get("sinks") or []
        if not sinks:
            raise ValueError(f"pipeline {name!r} has no sinks")
        for sink in sinks:  # a batch entering P goes to EVERY exporter of P
            routes.append((name, role, tool, str(sink)))

    sharding = doc.get("sharding") or {"even": DEFAULT_TUNING["n_shards"]}
    if "even" in sharding:
        shards = even_shards(int(sharding["even"]))
    else:
        shards = validate_sharding_config(
            [
                {
                    "shard_id": str(s["shard_id"]),
                    "start_key": str(s["start_key"]),
                    "end_key": str(s["end_key"]),
                }
                for s in sharding.get("shards", [])
            ]
        )

    tuning = {**DEFAULT_TUNING, **(doc.get("tuning") or {})}
    unknown = set(tuning) - set(DEFAULT_TUNING)
    if unknown:
        raise ValueError(f"unknown tuning keys: {sorted(unknown)}")
    cfg = PipelineConfig(
        max_record_size=int(tuning["max_record_size"]),
        max_span_size=int(tuning["max_span_size"]),
        n_shards=len(shards),
        n_conv_buckets=int(tuning["n_conv_buckets"]),
        salt_buckets=int(tuning["salt_buckets"]),
        drop_md5_prefix=str(tuning["drop_md5_prefix"]),
        backpressure_on=bool(tuning["backpressure_on"]),
    )
    return ServiceConfig(routes=routes, shards=shards, pipeline=cfg)


def load_config(path: str) -> ServiceConfig:
    with open(path) as f:
        return parse_config(f.read())
