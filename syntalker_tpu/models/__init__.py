from syntalker_tpu.models import rvqvae  # noqa: F401
