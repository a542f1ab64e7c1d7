from . import aot
from .server import InpaintingServer, serve

__all__ = ["InpaintingServer", "serve", "aot"]
