from syntalker_tpu.ops import rotations  # noqa: F401
