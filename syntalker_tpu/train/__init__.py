from syntalker_tpu.train import state  # noqa: F401
