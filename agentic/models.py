"""Shim: reference agentic.models import path -> image_transformation_tpu.agentic.models."""

from image_transformation_tpu.agentic.models import *  # noqa: F401,F403
