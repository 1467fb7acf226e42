from pram_tpu.viz.server import ViewerServer  # noqa: F401
