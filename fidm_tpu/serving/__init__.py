from . import aot
from .server import (
    DeadlineExceededError,
    InpaintingServer,
    ServerOverloadedError,
    serve,
)

__all__ = ["InpaintingServer", "serve", "aot", "ServerOverloadedError",
           "DeadlineExceededError"]
