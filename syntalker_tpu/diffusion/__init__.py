from syntalker_tpu.diffusion.schedule import DiffusionParams, make_diffusion  # noqa: F401
