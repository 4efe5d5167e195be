from .client import APIClient, FakeClient, get_api_client, register_fake_client
from .personas import (
    best_practices_text,
    build_critic_messages,
    build_planner_messages,
    build_refiner_messages,
    object_summary_lines,
    shared_context_block,
)
