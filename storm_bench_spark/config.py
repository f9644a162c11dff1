"""Engine configuration: YAML file + CLI overrides.

Parity with the reference's configuration surface (BenchmarkBase.java:39-101
parses -conf/-topic/-spouts_parallel/-bolts_parallel/-workers/-ackers/-group_id
and loads a snakeyaml map; CLI overrides config). We keep the reference's
key names (conf/conf.yaml) so an existing conf file drops in, including the
reference's quirk of reading BOTH ``rolling_flight_dist.*`` (what the code
reads — RollingFlightDist.java:49-56) and the legacy ``collision_warning.*``
(what the shipped conf provides — conf/conf.yaml:24-29).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Any

try:  # PyYAML is optional in this container; conf files are optional too.
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False

# Defaults mirror /root/reference/conf/conf.yaml (values, not code).
DEFAULTS: dict[str, Any] = {
    "kafka.brokers": ["localhost"],
    "kafka.port": 9092,
    "kafka.zookeeper.servers": ["localhost"],
    "kafka.zookeeper.port": 2181,
    "storm.workers": 8,
    "storm.ackers": 8,
    "storm.spouts_parallel": 1,
    "storm.bolts_parallel": 1,
    "max.spout.pending": 1000,
    # rolling_sort.* — conf/conf.yaml:20-21
    "rolling_sort.emit_freq": 60,
    "rolling_sort.chunk_size": 3_000_000,
    # rolling_count.* — conf/conf.yaml:22-23
    "rolling_count.window_length": 60,
    "rolling_count.emit_freq": 10,
    # collision_warning.* (legacy keys) — conf/conf.yaml:24-29
    "collision_warning.dist_threshold_km": 10.0,
    "collision_warning.speculative_comp_num": 3,
    "collision_warning.speculative_comp_timestep_sec": 5,
    "collision_warning.emit_freq": 5,
    "collision_warning.chunk_size": 100,
    # rolling_hashtag_count.* — conf/conf.yaml:30-31
    "rolling_hashtag_count.window_length": 60,
    "rolling_hashtag_count.emit_freq": 5,
    # sol.* — conf/conf.yaml:32
    "sol.topology_level": 3,
    # grep.* — conf/conf.yaml:33
    "grep.pattern_string": "Tom",
    # unique_visitor.* — conf/conf.yaml:34-35
    "unique_visitor.window_length": 60,
    "unique_visitor.emit_freq": 10,
}

# The code-side aliases: RollingFlightDist.java:49-56 reads these names.
_FLIGHT_DIST_ALIASES = {
    "rolling_flight_dist.dist_threshold_km": "collision_warning.dist_threshold_km",
    "rolling_flight_dist.speculative_comp_num": "collision_warning.speculative_comp_num",
    "rolling_flight_dist.speculative_comp_timestep_sec": "collision_warning.speculative_comp_timestep_sec",
    "rolling_flight_dist.emit_freq": "collision_warning.emit_freq",
    "rolling_flight_dist.chunk_size": "collision_warning.chunk_size",
}


@dataclass
class EngineConfig:
    values: dict[str, Any] = field(default_factory=dict)

    def get(self, key: str, default: Any = None) -> Any:
        if key in self.values:
            return self.values[key]
        if key in _FLIGHT_DIST_ALIASES:
            alias = _FLIGHT_DIST_ALIASES[key]
            if alias in self.values:
                return self.values[alias]
            if alias in DEFAULTS:
                return DEFAULTS[alias]
        if key in DEFAULTS:
            return DEFAULTS[key]
        return default

    def __getitem__(self, key: str) -> Any:
        v = self.get(key, None)
        if v is None:
            raise KeyError(key)
        return v

    @classmethod
    def load(cls, conf_path: str | None = None, overrides: dict[str, Any] | None = None) -> "EngineConfig":
        values: dict[str, Any] = {}
        if conf_path:
            if not _HAVE_YAML:
                raise RuntimeError("PyYAML not available; cannot load conf file")
            with open(conf_path) as f:
                loaded = yaml.safe_load(f) or {}
            values.update(loaded)
        if overrides:
            values.update({k: v for k, v in overrides.items() if v is not None})
        return cls(values)


def parse_cli(argv: list[str] | None = None) -> EngineConfig:
    """CLI parity with BenchmarkBase.java:41-56 option names."""
    p = argparse.ArgumentParser(description="storm_bench_spark engine")
    p.add_argument("-conf", dest="conf", default=None, help="YAML config file")
    p.add_argument("-topic", dest="topic", default=None)
    p.add_argument("-spouts_parallel", dest="spouts_parallel", type=int, default=None)
    p.add_argument("-bolts_parallel", dest="bolts_parallel", type=int, default=None)
    p.add_argument("-workers", dest="workers", type=int, default=None)
    p.add_argument("-ackers", dest="ackers", type=int, default=None)
    p.add_argument("-group_id", dest="group_id", default=None)
    a = p.parse_args(argv)
    overrides = {
        "kafka.topic": a.topic,
        "storm.spouts_parallel": a.spouts_parallel,
        "storm.bolts_parallel": a.bolts_parallel,
        "storm.workers": a.workers,
        "storm.ackers": a.ackers,
        "kafka.group_id": a.group_id,
    }
    return EngineConfig.load(a.conf, overrides)
