"""Concrete component registrations.

The explicit equivalent of the reference's string-`__import__` plugin
system (train.py:46,85,122,267): importing this module populates the
registries with every built-in dataset builder, model, trainer, sampler,
and eval model. CLIs resolve user-configured names through these.
"""

from __future__ import annotations

from syntalker_tpu.registry import DATASETS, EVAL_MODELS, MODELS, SAMPLERS, TRAINERS

# --- datasets (reference: dataloaders/<name>.py CustomDataset) -------------
from syntalker_tpu.data.beat_builder import build_beat_cache
from syntalker_tpu.data.amass import load_amass_npz

DATASETS.register("beat_sep_lower")(build_beat_cache)
DATASETS.register("beat_sep_lower_h3d")(build_beat_cache)  # h3d arrays ride along
DATASETS.register("amass_npz")(load_amass_npz)

# --- models (reference: models/<name>.py, args.g_name) ---------------------
from syntalker_tpu.models.denoiser import MDM, create_mdm
from syntalker_tpu.models.rvqvae import RVQVAE, create_rvqvae
from syntalker_tpu.models.eval_vae import VAESKConv, VQVAEConvZero
from syntalker_tpu.models.tmr import ActorAgnosticEncoder, DistilbertTextEncoder
from syntalker_tpu.models.motionclip import MotionCLIP

MODELS.register("MDM")(MDM)
MODELS.register("denoiser")(create_mdm)
MODELS.register("RVQVAE")(RVQVAE)
MODELS.register("rvqvae")(create_rvqvae)
MODELS.register("MotionCLIP")(MotionCLIP)
MODELS.register("TMRText")(DistilbertTextEncoder)
MODELS.register("TMRMotion")(ActorAgnosticEncoder)

# --- eval models (reference: args.e_name) -----------------------------------
EVAL_MODELS.register("VAESKConv")(VAESKConv)
EVAL_MODELS.register("VQVAEConvZero")(VQVAEConvZero)

# --- trainers (reference: args.trainer -> <name>_trainer.py) ----------------
from syntalker_tpu.train.loop import DiffusionTrainer, RVQTrainer

TRAINERS.register("diffusion_rvqvae")(DiffusionTrainer)
TRAINERS.register("rvq")(RVQTrainer)

# --- samplers ----------------------------------------------------------------
from syntalker_tpu.diffusion.core import ddim_sample, ddpm_sample
from syntalker_tpu.diffusion.extras import plms_sample

SAMPLERS.register("ddpm")(ddpm_sample)
SAMPLERS.register("ddim")(ddim_sample)
SAMPLERS.register("plms")(plms_sample)
