"""YAML config layer speaking the reference's config vocabulary."""

from cvcs_tpu.config.loader import load_yaml, display_configs  # noqa: F401
