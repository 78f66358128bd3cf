from esrecsys_tpu.serving.server import RetrievalService, serve  # noqa: F401
