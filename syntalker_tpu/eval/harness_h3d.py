"""Text-controlled (h3d) evaluation: prompted generation + HumanML3D suite.

Capability parity with ``test_h3d.py`` + ``h3d_diffusion_new_trainer.py``
(_g_test :465-607, test :818-905, eval :907-1060): generate motion with
per-body-part prompt CFG on the 623-dim representation, then score
R-precision / Matching / FID / Diversity / MultiModality with the BiGRU
co-embedding oracle over N replications (mean ± 95% CI).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu import generation as G
from syntalker_tpu.data import joints as J
from syntalker_tpu.data.cache import BeatCache
from syntalker_tpu.eval import t2m
from syntalker_tpu.models.tmr import TextPipeline

log = logging.getLogger("syntalker")


class H3DEvaluator:
    def __init__(
        self,
        *,
        mdm,
        mdm_params,
        diffusion,
        rvq_modules: dict,
        h3d_stats,
        text_pipeline: Optional[TextPipeline] = None,
        t2m_evaluator: Optional[t2m.T2MEvaluator] = None,
        pose_length: int = 128,
        pre_frames: int = 4,
        latent_scale: float = 5.0,
        guidance: Optional[dict] = None,
    ):
        self.mdm = mdm
        self.mdm_params = mdm_params
        self.diffusion = diffusion
        self.rvq_modules = rvq_modules
        self.h3d_stats = h3d_stats
        self.text_pipeline = text_pipeline or TextPipeline()
        self.t2m_evaluator = t2m_evaluator
        self.pose_length = pose_length
        self.pre_frames = pre_frames
        self.latent_scale = latent_scale
        self.guidance = guidance or {"audio_scale": 1.0, "prompt_scale": 4.0}

    def generate_clip(
        self,
        sample: Dict[str, np.ndarray],
        rng,
        prompts: Optional[Dict[str, Optional[str]]] = None,
    ) -> Dict:
        """One clip -> generated 623-d features + joints, optionally driven
        by per-body-part text prompts (test_h3d.py:196-246 surface)."""
        n_raw = sample["pose"].shape[0]
        plan = G.plan_windows(
            n_raw, pose_length=self.pose_length, pre_frames=self.pre_frames
        )
        aw = jnp.asarray(G.window_audio(sample["audio"][None], plan))
        ww = jnp.asarray(G.window_words(sample["word"][None], plan))

        gt_feats = jnp.asarray(sample["h3d"][None])
        gt_norm = self.h3d_stats.normalize(gt_feats)
        lat = []
        from syntalker_tpu.data.h3d import part_mask_623

        for name in J.LATENT_SLICES:
            module, params, _q = self.rvq_modules[name]
            lat.append(
                module.apply(
                    {"params": params},
                    gt_norm[..., jnp.asarray(part_mask_623(name))],
                    method="map2latent",
                )
            )
        gt_latents = jnp.concatenate(lat, axis=-1) / self.latent_scale
        init_seed = gt_latents[:, : plan.pre_frames]

        prompt_embs = None
        if prompts and any(prompts.values()):
            prompt_embs = {
                part: (None if not text else self.text_pipeline.embed([text]))
                for part, text in prompts.items()
            }

        latents = G.sample_windows(
            self.mdm,
            self.mdm_params,
            self.diffusion,
            plan,
            aw,
            ww,
            init_seed,
            rng,
            sampler="ddim" if self.diffusion.num_steps < 1000 else "ddpm",
            prompts=prompt_embs,
            guidance=self.guidance,
        )
        dec = G.decode_latents_h3d(
            latents,
            rvq_modules=self.rvq_modules,
            h3d_stats=self.h3d_stats,
            latent_scale=self.latent_scale,
        )
        n = dec["features"].shape[1]
        return {
            "features": np.asarray(dec["features"][0]),
            "joints": np.asarray(dec["joints"][0]),
            "gt_features": np.asarray(gt_feats[0, :n]),
            "n_frames": n,
        }

    # ------------------------------------------------------------------

    def steering_metrics(
        self,
        cache: BeatCache,
        rng,
        *,
        captions: List[str],
        text_features: List[dict],
        max_clips: int = 4,
        part: str = "upper",
    ) -> Dict[str, float]:
        """Tracked prompt-steering measurement (VERDICT r3 #9): per clip,
        generate UNPROMPTED and PROMPTED (the clip's own caption on one
        body part) from the same noise, then report

        - ``prompt_gain``: mean decrease of the oracle text↔motion
          co-embedding distance when the prompt is applied — positive
          means prompting pulls the generation toward the text (the
          paper's claimed capability, cfg_sampler.py:57-117);
        - ``offpart_leakage``: relative 623-feature change on the
          UNPROMPTED parts — body-part CFG should steer the prompted part
          without rewriting the others.

        Promoted from the one-off synthetic-causal demonstration
        (scripts/demo_prompt_steering.py / docs/prompt_steering_round3.md)
        into the metric suite so steering is regression-tracked.
        """
        from syntalker_tpu.data.h3d import part_mask_623

        n_clips = min(len(cache), max_clips, len(captions))
        gains, leaks, moved = [], [], []
        other = [p for p in J.LATENT_SLICES if p != part]
        for i in range(n_clips):
            sample = cache.get(i)
            key = jax.random.fold_in(rng, 10_000 + i)
            base = self.generate_clip(sample, key)
            prompted = self.generate_clip(
                sample, key, prompts={part: captions[i]}
            )
            n = min(base["n_frames"], prompted["n_frames"])
            tf = text_features[i]
            t_emb, m_base = self.t2m_evaluator.get_co_embeddings(
                tf["word_embs"], tf["pos_ohot"], tf["cap_lens"],
                base["features"][None, :n], np.asarray([n]),
            )
            _, m_prom = self.t2m_evaluator.get_co_embeddings(
                tf["word_embs"], tf["pos_ohot"], tf["cap_lens"],
                prompted["features"][None, :n], np.asarray([n]),
            )
            d_base = float(np.linalg.norm(t_emb - m_base))
            d_prom = float(np.linalg.norm(t_emb - m_prom))
            gains.append(d_base - d_prom)
            # feature-space locality
            mask_p = np.asarray(part_mask_623(part))
            dp = np.abs(prompted["features"][:n][:, mask_p]
                        - base["features"][:n][:, mask_p]).mean()
            sp = np.abs(base["features"][:n][:, mask_p]).mean() + 1e-9
            moved.append(float(dp / sp))
            lk = []
            for o in other:
                mask_o = np.asarray(part_mask_623(o))
                do = np.abs(prompted["features"][:n][:, mask_o]
                            - base["features"][:n][:, mask_o]).mean()
                so = np.abs(base["features"][:n][:, mask_o]).mean() + 1e-9
                lk.append(do / so)
            leaks.append(float(np.mean(lk)))
        return {
            "steering_prompt_gain": float(np.mean(gains)),
            "steering_prompted_part_rel_change": float(np.mean(moved)),
            "steering_offpart_leakage": float(np.mean(leaks)),
            "steering_clips": n_clips,
            "steering_part": part,
        }

    def evaluate(
        self,
        cache: BeatCache,
        rng,
        *,
        text_features: Optional[List[dict]] = None,
        replications: int = 20,
        max_clips: Optional[int] = None,
        diversity_times: int = 300,
        mm_repeats: int = 0,
    ) -> Dict[str, tuple]:
        """HumanML3D protocol: per replication, generate every clip, embed
        with the co-embedding oracle, score; report mean ± CI
        (h3d_diffusion_new_trainer.py:907-1060).

        text_features[i] (optional): dict(word_embs, pos_ohot, cap_lens)
        for clip i — the GloVe+POS caption features the oracle's text tower
        consumes; matching/R-precision are skipped when absent.
        """
        assert self.t2m_evaluator is not None, "needs a T2MEvaluator oracle"
        n_clips = min(len(cache), max_clips or len(cache))

        def run_once(rep: int) -> Dict[str, float]:
            gen_embs, gt_embs, t_embs = [], [], []
            mm_embs = []
            for i in range(n_clips):
                sample = cache.get(i)
                key = jax.random.fold_in(jax.random.fold_in(rng, rep), i)
                out = self.generate_clip(sample, key)
                n = out["n_frames"]
                ge = self.t2m_evaluator.get_motion_embeddings(
                    out["features"][None], np.asarray([n])
                )
                te = self.t2m_evaluator.get_motion_embeddings(
                    out["gt_features"][None], np.asarray([n])
                )
                gen_embs.append(ge)
                gt_embs.append(te)
                if text_features is not None:
                    tf = text_features[i]
                    t_emb, _ = self.t2m_evaluator.get_co_embeddings(
                        tf["word_embs"], tf["pos_ohot"], tf["cap_lens"],
                        out["features"][None], np.asarray([n]),
                    )
                    t_embs.append(t_emb)
                if mm_repeats > 1:
                    reps = [ge[0]]
                    for r in range(1, mm_repeats):
                        o2 = self.generate_clip(sample, jax.random.fold_in(key, 1000 + r))
                        reps.append(
                            self.t2m_evaluator.get_motion_embeddings(
                                o2["features"][None], np.asarray([o2["n_frames"]])
                            )[0]
                        )
                    mm_embs.append(np.stack(reps))

            gen = np.concatenate(gen_embs)
            gt = np.concatenate(gt_embs)
            metrics: Dict[str, float] = {
                "fid": t2m.fid_from_activations(gen, gt),
                "diversity": t2m.calculate_diversity(
                    gen, min(diversity_times, len(gen) - 1), seed=rep
                ),
            }
            if t_embs:
                matching, r = t2m.matching_and_r_precision(np.concatenate(t_embs), gen)
                metrics["matching"] = matching
                for k in range(len(r)):
                    metrics[f"r_precision_top{k+1}"] = float(r[k])
            if mm_embs:
                metrics["multimodality"] = t2m.calculate_multimodality(
                    np.stack(mm_embs), min(10, mm_repeats), seed=rep
                )
            log.info(f"replication {rep}: {metrics}")
            return metrics

        return t2m.evaluate_replications(run_once, replications)
