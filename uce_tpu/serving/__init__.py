from uce_tpu.serving.server import GenerationServer, ServerConfig

__all__ = ["GenerationServer", "ServerConfig"]
