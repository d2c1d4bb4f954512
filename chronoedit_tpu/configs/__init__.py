from chronoedit_tpu.configs.presets import (
    EXPERIMENTS,
    chronoedit_14b,
    chronoedit_14b_distilled,
    chronoedit_tiny,
    get_experiment,
)

__all__ = ["EXPERIMENTS", "chronoedit_14b", "chronoedit_14b_distilled",
           "chronoedit_tiny", "get_experiment"]
