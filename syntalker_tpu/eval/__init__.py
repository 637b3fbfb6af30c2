from syntalker_tpu.eval import metrics  # noqa: F401
