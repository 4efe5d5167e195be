"""Shim: reference agentic.tools import path -> image_transformation_tpu.agentic.tools."""

from image_transformation_tpu.agentic.tools import *  # noqa: F401,F403
