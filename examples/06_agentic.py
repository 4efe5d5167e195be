"""The agentic state-machine variant, hermetically.

run_workflow compiles the macro -> validator -> compositor -> critic
-> micro graph (a dependency-free StateGraph mirroring the reference's
LangGraph wiring, agentic/graph.py) and invokes it: the macro persona
plans a simplified Flex-DSL, the validator checks coverage, the
compositor renders WITHOUT scaling (the agentic no-scaling rule), and
critic -> micro cycles nudge placements via executed adjust_x/adjust_y
tool calls. install_fake_client swaps the network VLM for the canned
FakeClient, so the whole graph runs without credentials or egress.
"""
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

from image_transformation_tpu.core.cache import honor_platform_env

honor_platform_env()

from image_transformation_tpu.agentic.workflow import run_workflow
from image_transformation_tpu.pipeline.cli import install_fake_client


def main() -> None:
    bundle_dir = REPO / "data" / "squarespace"
    install_fake_client(bundle_dir)
    state = run_workflow(
        bundle_dir,
        ratio="9:16",
        base_run_dir=Path("/tmp/example_agentic"),
        max_iterations=2,
    )
    drafts = sorted(
        state.run.run_root.glob("iteration_*/final_product/draft_*.png")
    )
    print(f"run dir: {state.run.run_root}")
    print(f"iterations: {state.iteration}, placements: {len(state.placements)}")
    print(f"agentic drafts: {[p.name for p in drafts]}")


if __name__ == "__main__":
    main()
