"""Config (reference YAML schema + hot reload) and telemetry."""

from video_stab_tpu.utils.config import (
    AppConfig,
    CameraParams,
    ConfigWatcher,
    load_config,
    parse_config_text,
    save_config,
)
from video_stab_tpu.utils.checkpoint import load_state, save_state
from video_stab_tpu.utils.telemetry import (
    FpsMeter,
    Metrics,
    StageTimer,
    get_logger,
    trace,
)

__all__ = [
    "AppConfig", "CameraParams", "ConfigWatcher", "load_config",
    "parse_config_text", "save_config",
    "FpsMeter", "Metrics", "StageTimer", "get_logger", "trace",
    "save_state", "load_state",
]
