"""Shared harness utilities (reference: utils.py grab-bag, reorganized)."""

from where2edit_tpu.utils.images import save_image_grid, to_uint8
from where2edit_tpu.utils.logging import Logger, MetricsWriter
from where2edit_tpu.utils.profiling import StageTimer, summarize_trace, trace
from where2edit_tpu.utils.seed import set_random_seed

__all__ = ["save_image_grid", "to_uint8", "Logger", "MetricsWriter",
           "set_random_seed", "StageTimer", "summarize_trace", "trace"]
