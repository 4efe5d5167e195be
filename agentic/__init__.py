"""Reference-compatible ``agentic`` package path.

The implementation lives in image_transformation_tpu.agentic (hand-rolled
state machine, working tool-calling); this shim keeps the reference's
import paths (``from agentic.state import LayoutState`` etc.) working.
"""

from image_transformation_tpu.agentic import (  # noqa: F401
    END,
    AgentState,
    ObjectMeta,
    PlacementState,
    RunContext,
    StateGraph,
    build_workflow,
    initialize_state,
    run_workflow,
)

LayoutState = AgentState  # reference name
