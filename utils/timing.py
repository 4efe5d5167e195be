"""Shim: ``from utils.timing import StepTimer`` (reference import path).

Implementation: image_transformation_tpu/core/timing.py (adds JAX profiler
trace annotations to the reference's API — /root/reference/utils/timing.py).
"""

from image_transformation_tpu.core.timing import StepTimer  # noqa: F401
