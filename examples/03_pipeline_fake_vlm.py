"""The full macro-placement iterate loop, hermetically.

run_macro_only drives planner -> validate -> solve -> compose, then
critic -> refiner cycles, persisting the reference-parity artifact tree
per iteration. install_fake_client swaps the network VLM for a canned
FakeClient (the same seam the hermetic tests use), so the loop runs
without credentials or egress.
"""
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(REPO))

from image_transformation_tpu.core.cache import honor_platform_env

honor_platform_env()

from image_transformation_tpu.pipeline.cli import install_fake_client
from image_transformation_tpu.pipeline.run import run_macro_only


def main() -> None:
    bundle_dir = REPO / "data" / "squarespace"
    install_fake_client(bundle_dir)
    run_dir = run_macro_only(
        bundle_dir,
        ratio="9:16",
        align="center",
        margin=0.05,
        refine_iters=2,
        base_output_root=Path("/tmp/example_pipeline"),
    )
    drafts = sorted(run_dir.glob("iteration_*/final_product/draft_*.png"))
    print(f"run dir: {run_dir}")
    print(f"composed drafts: {[p.name for p in drafts]}")
    print(f"timing log: {(run_dir / 'time_log.txt').exists()}")


if __name__ == "__main__":
    main()
