"""Shim: reference agentic.nodes import path -> image_transformation_tpu.agentic.nodes."""

from image_transformation_tpu.agentic.nodes import *  # noqa: F401,F403
