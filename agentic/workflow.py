"""Shim: reference agentic.workflow import path -> image_transformation_tpu.agentic.workflow."""

from image_transformation_tpu.agentic.workflow import *  # noqa: F401,F403
