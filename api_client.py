"""Public shim preserving the reference api_client surface.

Same names, signatures, message protocol and normalized response shape as
/root/reference/api_client.py (APIClient, get_api_client, the high-level
classify/analyze/layout/critique/translate helpers and model defaults);
implementation in image_transformation_tpu.vlm.client, which additionally
forwards tools/tool_choice (working tool-calling) and supports hermetic
fakes via register_fake_client.
"""

from image_transformation_tpu.vlm.client import (  # noqa: F401
    APIClient,
    FakeClient,
    NEBIUS_DEFAULT_TEXT,
    NEBIUS_DEFAULT_VLM,
    OLLAMA_DEFAULT_TEXT,
    OLLAMA_DEFAULT_VLM,
    OPENAI_AVAILABLE,
    OLLAMA_AVAILABLE,
    get_api_client,
    register_fake_client,
)
