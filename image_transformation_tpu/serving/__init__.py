from .server import ComposeService, main, serve  # noqa: F401
