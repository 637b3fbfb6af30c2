from syntalker_tpu.utils import tracking  # noqa: F401
