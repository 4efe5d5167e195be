"""image_transformation_tpu — TPU-native re-implementation of the
FelixMul/image_transformation macro-placement pipeline.

A VLM-guided ad re-layout framework, rebuilt JAX/XLA/Pallas-first:

- ``ops``      — compute kernels (PIL-parity Lanczos resize as MXU matmuls,
                 fused resize+alpha-over compose, background synthesis
                 reductions, on-device contact-sheet tiling).
- ``layout``   — canvas sizing, the Flex-DSL layout IR, the deterministic
                 solver (host oracle + vectorized/vmappable tensor solver),
                 validation and nesting-conflict precomputation.
- ``vlm``      — the Nebius/Ollama client seam (plus a hermetic FakeClient),
                 and the planner/critic/refiner persona prompt builders.
- ``pipeline`` — the iterate-loop orchestrator, artifact tree, CLI.
- ``parallel`` — mesh helpers and the multi-chip shard_map throughput sweep.
- ``agentic``  — the state-machine (graph) variant with working tool-calling.
- ``core``     — bundle I/O to padded arrays, timing, config.

Capability parity target: /root/reference (see SURVEY.md). Public shims with
the reference's module names live at the repo root (compositor.py,
background_resizing.py, layout_constraints.py).
"""

__version__ = "0.1.0"
