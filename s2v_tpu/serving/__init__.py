from s2v_tpu.serving.client import request
from s2v_tpu.serving.daemon import ServingDaemon

__all__ = ["ServingDaemon", "request"]
