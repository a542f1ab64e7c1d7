from .server import InpaintingServer, serve
