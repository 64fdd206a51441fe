"""Persistent user configuration for the CLI.

Counterpart of the reference's app config (src/native/config.rs):
JSON at ``<config_dir>/whisper_burn_tpu/config.json`` holding defaults
(model path, tokenizer, language, beam width, compute profile), written
atomically via tmp+rename (:61-71). The reference's hotkey/auto-paste/
auto-mute fields have no meaning without the desktop app and are omitted.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from pathlib import Path


@dataclass
class AppConfig:
    model: str | None = None
    tokenizer: str | None = None
    language: str = "auto"  # reference default is auto-detect (:10-38)
    beam_width: int = 1
    compute: str = "parity"  # parity | fast | fastest
    frontend: str = "openai"  # openai | reference
    models_dir: str = "models"


def config_path() -> Path:
    base = os.environ.get("XDG_CONFIG_HOME") or os.path.join(
        os.path.expanduser("~"), ".config"
    )
    return Path(base) / "whisper_burn_tpu" / "config.json"


def load_config(path: str | Path | None = None) -> AppConfig:
    """Load config; silently falls back to defaults (config.rs:40-53)."""
    path = Path(path) if path is not None else config_path()
    try:
        data = json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        return AppConfig()
    known = {f.name for f in dataclasses.fields(AppConfig)}
    return AppConfig(**{k: v for k, v in data.items() if k in known})


def save_config(cfg: AppConfig, path: str | Path | None = None) -> Path:
    """Atomic write via tmp+rename (config.rs:61-71)."""
    path = Path(path) if path is not None else config_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(dataclasses.asdict(cfg), indent=2))
    tmp.replace(path)
    return path
