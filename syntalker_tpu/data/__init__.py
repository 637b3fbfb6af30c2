from syntalker_tpu.data import joints  # noqa: F401
