"""JSON config-file workflow (SURVEY.md §2.1 S8) — parity with the
reference's ``ConfigManager`` (utils.py:836-905) and its
``all.configfiles.json:2-31`` crawler_config.json shape.

``load_config`` / ``save_config`` / ``merge_configs`` (recursive
dict-on-dict deep merge, override wins on leaves) / ``validate_config``
(same required fields + numeric ranges; the AWS-region whitelist is kept
for drop-in validation parity even though this engine doesn't call AWS).

``to_crawl_config`` maps the file keys onto the engine's ``CrawlConfig``:
a user of the reference's config files gets the same knobs without
rewriting them. Unknown keys are ignored (the reference reads keys it
knows and carries the rest), engine-only knobs keep their defaults unless
present under ``"spark"``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from .config import CrawlConfig

REQUIRED_FIELDS = (
    "lambda_function_name", "s3_bucket", "aws_region",
    "max_levels", "max_concurrency", "timeout",
)

VALID_REGIONS = (
    "us-east-1", "us-east-2", "us-west-1", "us-west-2",
    "eu-west-1", "eu-west-2", "eu-central-1", "ap-southeast-1",
    "ap-southeast-2", "ap-northeast-1",
)


class ConfigManager:
    """File-based configuration store (reference utils.py:838-905)."""

    def __init__(self, config_dir: str | Path = "config"):
        self.config_dir = Path(config_dir)
        self.config_dir.mkdir(exist_ok=True)

    def load_config(self, config_file: str) -> dict[str, Any]:
        config_path = self.config_dir / config_file
        if not config_path.exists():
            raise FileNotFoundError(
                f"Configuration file not found: {config_path}"
            )
        return json.loads(config_path.read_text())

    def save_config(self, config: dict[str, Any], config_file: str) -> None:
        (self.config_dir / config_file).write_text(json.dumps(config, indent=2))

    def merge_configs(self, base_config: dict, override_config: dict) -> dict:
        """Deep merge: nested dicts merge recursively, any other value in
        the override replaces the base (utils.py:859-871)."""
        merged = dict(base_config)

        def deep_merge(base: dict, override: dict) -> None:
            for key, value in override.items():
                if (
                    key in base
                    and isinstance(base[key], dict)
                    and isinstance(value, dict)
                ):
                    deep_merge(base[key], value)
                else:
                    base[key] = value

        deep_merge(merged, override_config)
        return merged

    def validate_config(self, config: dict[str, Any]) -> list[str]:
        """Errors list, empty = valid (utils.py:873-905)."""
        errors = [
            f"Missing required field: {field}"
            for field in REQUIRED_FIELDS
            if field not in config
        ]
        if config.get("max_levels", 0) < 1:
            errors.append("max_levels must be at least 1")
        if config.get("max_concurrency", 0) < 1:
            errors.append("max_concurrency must be at least 1")
        if config.get("timeout", 0) < 30:
            errors.append("timeout must be at least 30 seconds")
        if config.get("aws_region") not in VALID_REGIONS:
            errors.append(f"Invalid AWS region: {config.get('aws_region')}")
        return errors


def to_crawl_config(config: dict[str, Any], defaults: dict[str, Any] | None = None,
                    **overrides: Any) -> CrawlConfig:
    """Map a reference-shaped config dict to the engine's CrawlConfig.

    Precedence (low → high): CrawlConfig dataclass defaults < ``defaults``
    (e.g. a CLI's baseline values) < mapped config-file keys <
    config["spark"] < explicit ``overrides``.

    Key mapping (reference → engine):
      max_levels            → max_levels
      retry_attempts        → retry_attempts
      extract_links         → extract_links
      max_concurrency       → host_budget (the per-tick parallelism bound
                              becomes the per-host politeness budget — the
                              closest scale-safe analog)
      debug_max_sublinks    → max_links when debug_mode is true
    Engine-only knobs may be set under config["spark"] = {...} and win over
    the mapped values; explicit **overrides win over everything.
    """
    kw: dict[str, Any] = dict(defaults or {})
    if "max_levels" in config:
        kw["max_levels"] = int(config["max_levels"])
    if "retry_attempts" in config:
        kw["retry_attempts"] = int(config["retry_attempts"])
    if "extract_links" in config:
        kw["extract_links"] = bool(config["extract_links"])
    if "max_concurrency" in config:
        kw["host_budget"] = int(config["max_concurrency"])
    if config.get("debug_mode") and "debug_max_sublinks" in config:
        kw["max_links"] = int(config["debug_max_sublinks"])
    kw.update(config.get("spark", {}))
    kw.update(overrides)
    cfg = CrawlConfig(**kw)
    cfg.validate()
    return cfg
