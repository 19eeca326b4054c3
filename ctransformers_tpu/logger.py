import logging

logger = logging.getLogger("ctransformers_tpu")
