"""SynTalker-TPU: a TPU-native framework for prompt-based co-speech full-body
motion generation.

Re-implements the capabilities of SynTalker (ACM MM 2024, arXiv:2410.00464) as
an idiomatic JAX/XLA/Pallas stack:

- body-part RVQ-VAEs with functional EMA-reset codebooks (Pallas hot path),
- a transformer denoiser ("MDM") with RoPE and classifier-free guidance,
- a DDPM/DDIM diffusion core compiled into single ``lax.scan`` loops,
- batched CFG (cond+uncond in one forward) and per-body-part CFG mixing,
- BEAT2 data featurization (onset+amplitude audio, word grids, windowing),
- evaluation (FGD, BeatAlign, L1Div) and SMPL-X forward kinematics in JAX,
- explicit ``jax.sharding.Mesh`` data/model parallelism via NamedSharding.

The package layout mirrors the reference's layer map (SURVEY.md §1) but the
implementation is TPU-first, not a port.
"""

__version__ = "0.1.0"
