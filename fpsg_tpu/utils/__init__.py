from fpsg_tpu.utils.visualization import (
    visualize_point_clouds,
    draw_reconstruction,
)
from fpsg_tpu.utils.logging import RunLogger
from fpsg_tpu.utils.profiling import StepTimer, trace_context

__all__ = [
    "visualize_point_clouds",
    "draw_reconstruction",
    "RunLogger",
    "StepTimer",
    "trace_context",
]
