"""Shim: reference agentic.state import path -> image_transformation_tpu.agentic.state."""

from image_transformation_tpu.agentic.state import *  # noqa: F401,F403

from image_transformation_tpu.agentic.state import AgentState as LayoutState  # noqa: F401
