"""Shim: reference agentic.graph import path -> image_transformation_tpu.agentic.graph."""

from image_transformation_tpu.agentic.graph import *  # noqa: F401,F403
