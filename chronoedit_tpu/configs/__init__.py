from chronoedit_tpu.configs.presets import (
    EXPERIMENTS,
    chronoedit_14b,
    chronoedit_tiny,
    get_experiment,
)

__all__ = ["EXPERIMENTS", "chronoedit_14b", "chronoedit_tiny", "get_experiment"]
