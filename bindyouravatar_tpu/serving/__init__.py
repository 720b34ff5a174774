from .server import GenerationRequest, InferenceServer, serve_http

__all__ = ["GenerationRequest", "InferenceServer", "serve_http"]
