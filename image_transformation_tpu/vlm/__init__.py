from .client import APIClient, FakeClient, get_api_client, register_fake_client
