"""Agentic (state-machine) variant of the macro-placement pipeline.

Rebuild of the reference's LangGraph pipeline (/root/reference/agentic/) as
a dependency-free state machine with the same node graph:

    macro -> validator -> compositor -> critic --(stop?)--> END
                                          \\--> micro -> validator -> ...

Differences from the reference (deliberate):
- no langgraph/langchain dependency — graph.py is a ~60-line engine with
  the same conditional-edge semantics;
- tool-calling WORKS: the vlm client forwards tools/tool_choice and
  surfaces tool_calls, so the micro agent's adjust_x/adjust_y actually
  execute (in the reference they are dead code — SURVEY.md §2.6.2);
- the compositor renders through the TPU compose kernel (identity-size
  pastes; scaling remains forbidden, as in the reference).
"""

from .graph import END, StateGraph
from .state import AgentState, ObjectMeta, PlacementState, RunContext
from .workflow import build_workflow, initialize_state, run_workflow
