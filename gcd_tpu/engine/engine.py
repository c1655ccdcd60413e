"""DiffusionEngine — the orchestration layer tying network, denoiser, sampler,
conditioner, first stage and loss together.

Behavioral reference: gcd-model/sgm/models/diffusion.py (DiffusionEngine :40).
The Lightning module becomes a *functional* engine: it owns module definitions
and hyperparameters; all parameters/optimizer state live in pytrees owned by the
caller (trainer or eval scripts), so every step can be one jitted/pjitted
program.

Param tree layout:
    {"model":       <VideoUNet params>,          # torch: model.diffusion_model.*
     "conditioner": <GeneralConditioner params>, # torch: conditioner.*
     "first_stage": <VAE params>}                # torch: first_stage_model.*

The OpenAIWrapper adapter (sgm/modules/diffusionmodules/wrappers.py:23-34) is
inlined in `network_fn`: concat-cond rides the channel (last) axis, crossattn
-> context, vector -> y.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gcd_tpu.models.embedders import GeneralConditioner
from gcd_tpu.models.vae import VideoDecoder
from gcd_tpu.utils.config import (
    register,
    instantiate_from_config,
    get_obj_from_str,
)
from gcd_tpu.utils.misc import default

Array = jnp.ndarray


def static_num_frames(batch: Dict) -> int:
    """T as a *static* python int. Under jit, ints placed in the batch pytree
    become traced scalars; `image_only_indicator` is (B, T), so its static
    shape is the jit-safe source of truth."""
    ioi = batch.get("image_only_indicator")
    if ioi is not None and hasattr(ioi, "shape"):
        return int(ioi.shape[1])
    return int(batch["num_video_frames"])


@register("sgm.models.diffusion.DiffusionEngine")
class DiffusionEngine:
    def __init__(
        self,
        network_config: Dict,
        denoiser_config: Dict,
        first_stage_config: Dict,
        conditioner_config: Optional[Dict] = None,
        sampler_config: Optional[Dict] = None,
        optimizer_config: Optional[Dict] = None,
        scheduler_config: Optional[Dict] = None,
        loss_fn_config: Optional[Dict] = None,
        network_wrapper: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        ckpt_has_ema: bool = False,
        use_ema: bool = False,
        ema_decay_rate: float = 0.9999,
        ablate_unet_scratch: bool = False,
        scale_factor: float = 1.0,
        disable_first_stage_autocast: bool = False,
        disable_loss_fn_autocast: bool = False,
        input_key: str = "jpg",
        log_keys: Optional[List] = None,
        no_cond_log: bool = False,
        compile_model: bool = False,
        en_and_decode_n_samples_a_time: Optional[int] = None,
        ft_strategy: str = "everything",
        base_learning_rate: Optional[float] = None,
        compute_dtype: str = "float32",
    ):
        self.input_key = input_key
        self.scale_factor = float(scale_factor)
        self.en_and_decode_n_samples_a_time = en_and_decode_n_samples_a_time
        self.ft_strategy = ft_strategy
        self.use_ema = use_ema
        self.ema_decay_rate = ema_decay_rate
        self.ckpt_path = ckpt_path
        self.ckpt_has_ema = ckpt_has_ema
        self.ablate_unet_scratch = ablate_unet_scratch
        self.optimizer_config = default(optimizer_config, {"target": "torch.optim.AdamW"})
        self.scheduler_config = scheduler_config
        self.base_learning_rate = base_learning_rate
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Autocast flags kept for config parity; precision is governed by
        # compute_dtype + the fp32 GroupNorm islands baked into the modules.
        self.disable_first_stage_autocast = disable_first_stage_autocast
        self.disable_loss_fn_autocast = disable_loss_fn_autocast

        net_params = dict(network_config.get("params", {}))
        net_params["dtype"] = self.compute_dtype
        self.network = get_obj_from_str(network_config["target"])(**net_params)

        self.denoiser = instantiate_from_config(denoiser_config)
        self.sampler = (
            instantiate_from_config(sampler_config) if sampler_config else None
        )
        cond_cfg = conditioner_config or {"target": "sgm.modules.GeneralConditioner",
                                          "params": {"emb_models": []}}
        self.conditioner: GeneralConditioner = instantiate_from_config(cond_cfg)
        self.conditioner_cfg = cond_cfg
        self.first_stage_model = instantiate_from_config(first_stage_config)
        self.loss_fn = (
            instantiate_from_config(loss_fn_config) if loss_fn_config else None
        )

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def init_params(
        self,
        key: jax.Array,
        img_hw: Tuple[int, int] = (256, 384),
        t: int = 14,
        batch: Optional[Dict] = None,
    ) -> Dict:
        """Random-init all parameter trees (structure used by the converter)."""
        h, w = img_hw
        k_net, k_cond, k_vae = jax.random.split(key, 3)
        net = self.network
        # The VAE downsamples 8x and the UNet a further 2^(levels-1); the
        # up-path skip-concats require every level's extent to be even, so
        # the frame resolution must be divisible by 8 * 2^(levels-1) (= 64
        # for the full SVD UNet). The reference enforces the same constraint
        # (gcd-model/scripts/test.py:309-310 "Input resolution must be a
        # multiple of 64"); without this early check the failure surfaces as
        # an opaque concatenate-shape error deep inside the up blocks.
        div = 8 * (2 ** (len(net.channel_mult) - 1))
        if h % div or w % div:
            raise ValueError(
                f"Frame resolution {h}x{w} must be a multiple of {div} "
                f"(VAE 8x downsampling x UNet {len(net.channel_mult)} levels); "
                f"the reference asserts the same (scripts/test.py: 'Input "
                f"resolution must be a multiple of 64').")
        bt = t
        x = jnp.zeros((bt, h // 8, w // 8, net.in_channels))
        ts = jnp.zeros((bt,))
        ctx = jnp.zeros((bt, 1, net.context_dim))
        y_dim = (net.adm_in_channels or 0) + net.aux_emb_dim
        y = jnp.zeros((bt, y_dim)) if net.num_classes is not None else None
        model_params = net.init(
            k_net, x, ts, ctx, y, num_video_frames=t,
            image_only_indicator=jnp.zeros((1, t)),
        )["params"]

        if batch is None:
            batch = self.example_batch(img_hw, t)
        cond_params = self.conditioner.init(k_cond, batch)["params"] \
            if self.conditioner.emb_models else {}

        vae_params = self.first_stage_model.init(k_vae, img_hw=img_hw, t=min(t, 2))
        out = {
            "model": model_params,
            "conditioner": cond_params,
            "first_stage": vae_params,
        }
        if self.ft_strategy == "time_lora":
            from gcd_tpu.models.lora import init_lora_params

            out["lora"] = init_lora_params(
                jax.random.fold_in(key, 99), model_params, rank=16, match="time")
        return out

    def example_batch(self, img_hw: Tuple[int, int] = (256, 384), t: int = 14,
                      b: int = 1) -> Dict:
        """A shape-correct batch for init / compile checks (contract: SURVEY.md
        section 3.1 batch dict, NHWC)."""
        h, w = img_hw
        bt = b * t
        return {
            "jpg": jnp.zeros((bt, h, w, 3)),
            "cond_frames": jnp.zeros((bt, h, w, 3)),
            "cond_frames_without_noise": jnp.zeros((bt, h, w, 3)),
            "cond_aug": jnp.full((bt,), 0.02),
            "motion_bucket_id": jnp.full((bt,), 127.0),
            "fps_id": jnp.full((bt,), 5.0),
            "image_only_indicator": jnp.zeros((b, t)),
            "scaled_relative_angles": jnp.zeros((bt, 3)),
            "scaled_relative_pose": jnp.zeros((bt, 3, 4)),
            "num_video_frames": t,
        }

    # ------------------------------------------------------------------
    # Checkpoint loading (torch -> flax)
    # ------------------------------------------------------------------

    def load_torch_checkpoint(self, path: str, params_template: Dict,
                              verbose: bool = True) -> Dict:
        """Convert a reference .safetensors/.ckpt into this engine's param tree
        (diffusion.py:191-219 semantics: strict=False + reporting)."""
        from gcd_tpu.io.convert import (
            convert_state_dict_to_params,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(path)
        if self.ablate_unet_scratch:
            sd = {k: v for k, v in sd.items() if "diffusion" not in k.lower()}

        if self.ckpt_has_ema:
            # Evaluate with the EMA shadow weights, matching the reference's
            # ema_scope('Testing') (diffusion.py:387-405, scripts/test.py:1012):
            # overlay the recovered EMA tensors onto the live UNet keys.
            from gcd_tpu.io.convert import extract_ema_state_dict

            ema_sd = extract_ema_state_dict(sd)
            if ema_sd:
                if verbose:
                    print(f"Using {len(ema_sd)} EMA shadow tensors for the UNet")
                sd = dict(sd)
                sd.update(ema_sd)

        from gcd_tpu.io.convert import gcd_clip_rename as clip_rename

        out = dict(params_template)
        all_missing, all_used = [], []
        for tree_key, torch_prefix in (
            ("model", "model.diffusion_model."),
            ("conditioner", "conditioner."),
            ("first_stage", "first_stage_model."),
        ):
            tmpl = params_template.get(tree_key, {})
            if not tmpl:
                continue
            params, missing, used = convert_state_dict_to_params(
                sd, tmpl, torch_prefix=torch_prefix, rename=clip_rename
            )
            # Fall back to the template's (random-init) values for missing keys.
            merged = _merge_with_template(params, tmpl)
            out[tree_key] = merged
            all_missing += missing
            all_used += used

        unexpected = sorted(set(sd.keys()) - set(all_used))
        if verbose:
            print(
                f"Restored from {path} with {len(all_missing)} missing and "
                f"{len(unexpected)} unexpected keys"
            )
            if all_missing:
                print(f"First 10 missing: {all_missing[:10]}")
            if unexpected:
                print(f"First 5 unexpected: {unexpected[:5]}")
        return out

    # ------------------------------------------------------------------
    # Network adapter (OpenAIWrapper)
    # ------------------------------------------------------------------

    def effective_model_params(self, params: Dict):
        """UNet params with LoRA deltas merged when ft_strategy='time_lora'
        (diffusion.py:134-155)."""
        if self.ft_strategy == "time_lora" and "lora" in params:
            from gcd_tpu.models.lora import apply_lora

            return apply_lora(params["model"], params["lora"])
        return params["model"]

    def network_fn(self, model_params, x: Array, c_noise: Array, cond: Dict,
                   num_video_frames: int,
                   image_only_indicator: Optional[Array] = None) -> Array:
        """wrappers.py:23-34: cat concat-cond on channels; crossattn->context,
        vector->y."""
        xin = jnp.concatenate(
            [x.astype(self.compute_dtype),
             cond["concat"].astype(self.compute_dtype)], axis=-1
        )
        return self.network.apply(
            {"params": model_params},
            xin,
            c_noise,
            cond.get("crossattn"),
            cond.get("vector"),
            num_video_frames=num_video_frames,
            image_only_indicator=image_only_indicator,
        ).astype(jnp.float32)

    # ------------------------------------------------------------------
    # First stage
    # ------------------------------------------------------------------

    def _chunked(self, fn, x: Array, n_samples: Optional[int]):
        n = x.shape[0]
        n_samples = default(n_samples, n)
        n_rounds = math.ceil(n / n_samples)
        if n_rounds <= 1:
            return fn(x)
        outs = [fn(x[i * n_samples:(i + 1) * n_samples]) for i in range(n_rounds)]
        return jnp.concatenate(outs, axis=0)

    def encode_first_stage(self, params, x: Array,
                           key: Optional[jax.Array] = None) -> Array:
        """(diffusion.py:253-266); posterior *sampled* during training."""
        key = default(key, jax.random.PRNGKey(0))
        calls = [0]  # fold the chunk index in: same-shape chunks with the
        # same key would draw byte-identical posterior noise per chunk

        def enc(chunk):
            k = jax.random.fold_in(key, calls[0])
            calls[0] += 1
            return self.first_stage_model.encode(params["first_stage"], chunk, key=k)

        z = self._chunked(enc, x, self.en_and_decode_n_samples_a_time)
        return z * self.scale_factor

    def decode_first_stage(self, params, z: Array,
                           decoding_t: Optional[int] = None) -> Array:
        """(diffusion.py:233-251); chunk size doubles as the VideoDecoder's
        temporal extent."""
        z = z / self.scale_factor
        n_samples = default(decoding_t, self.en_and_decode_n_samples_a_time)

        def dec(chunk):
            return self.first_stage_model.decode(
                params["first_stage"], chunk, timesteps=chunk.shape[0]
            )

        return self._chunked(dec, z, n_samples)

    # ------------------------------------------------------------------
    # Conditioner
    # ------------------------------------------------------------------

    def apply_conditioner(self, params, batch: Dict, train: bool = False,
                          rng: Optional[jax.Array] = None,
                          force_zero_embeddings: Optional[List[str]] = None) -> Dict:
        rngs = {"ucg": rng} if (train and rng is not None) else None
        return self.conditioner.apply(
            {"params": params["conditioner"]},
            batch,
            force_zero_embeddings,
            train,
            rngs=rngs,
        )

    def get_unconditional_conditioning(self, params, batch: Dict,
                                       force_uc_zero_embeddings=None):
        c = self.apply_conditioner(params, batch, train=False)
        uc = self.apply_conditioner(
            params, batch, train=False,
            force_zero_embeddings=force_uc_zero_embeddings,
        )
        return c, uc

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------

    def loss(self, params, batch: Dict, key: jax.Array, global_step) -> Array:
        """Per-sample loss, shape (B*T,) (diffusion.py shared_step :279 +
        forward :268)."""
        k_enc, k_cond, k_loss = jax.random.split(key, 3)
        x = batch[self.input_key]
        z = self.encode_first_stage(params, x, key=k_enc)
        z = jax.lax.stop_gradient(z)

        cond = self.apply_conditioner(params, batch, train=True, rng=k_cond)
        t = static_num_frames(batch)

        model_params = self.effective_model_params(params)

        def network(xin, c_noise, c, **extra):
            ioi = extra.get("image_only_indicator")
            return self.network_fn(
                model_params, xin, c_noise, c,
                num_video_frames=t,
                image_only_indicator=ioi,
            )

        loss_batch = dict(batch)
        loss_batch["num_video_frames"] = t  # static int, jit-safe
        return self.loss_fn.loss_from_cond(
            k_loss, network, self.denoiser, cond, z, loss_batch, global_step
        )

    # ------------------------------------------------------------------
    # Sampling (diffusion.py:504-577)
    # ------------------------------------------------------------------

    def sample_video(
        self,
        params,
        batch: Dict,
        key: jax.Array,
        num_steps: Optional[int] = None,
        decoding_t: Optional[int] = None,
        return_latents: bool = False,
    ) -> Dict:
        t = static_num_frames(batch)
        c, uc = self.get_unconditional_conditioning(
            params, batch,
            force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"],
        )

        ioi = batch["image_only_indicator"]
        ioi2 = jnp.concatenate([ioi, ioi], axis=0)  # CFG doubles the batch

        model_params = self.effective_model_params(params)

        def denoiser_fn(x, sigma, cond):
            # Size the per-video indicator to the incoming batch: the guider
            # doubles it (uc|c), but the guidance-interval plain branch runs
            # the bare conditional batch (sampling.py BaseDiffusionSampler).
            n_vid = x.shape[0] // t
            return self.denoiser(
                lambda xx, cn, cc, **kw: self.network_fn(
                    model_params, xx, cn, cc, num_video_frames=t,
                    image_only_indicator=ioi2[:n_vid],
                ),
                x, sigma, cond,
            )

        bt, hp, wp, _ = batch["cond_frames"].shape
        k_noise, k_samp = jax.random.split(key)
        latent_noise = jax.random.normal(
            k_noise, (bt, hp // 8, wp // 8, 4), dtype=jnp.float32
        )
        samples_z = self.sampler(denoiser_fn, latent_noise, cond=c, uc=uc,
                                 num_steps=num_steps, key=k_samp)
        samples_x = self.decode_first_stage(params, samples_z, decoding_t=decoding_t)
        sampled_video = jnp.clip((samples_x + 1.0) / 2.0, 0.0, 1.0)

        out = {
            "cond_video": jnp.clip((batch["cond_frames"] + 1.0) / 2.0, 0.0, 1.0),
            "sampled_video": sampled_video,
        }
        if return_latents:
            out["sampled_z"] = samples_z
        if "jpg" in batch:
            out["gt_video"] = jnp.clip((batch["jpg"] + 1.0) / 2.0, 0.0, 1.0)
        return out

    # ------------------------------------------------------------------
    # Validation (diffusion.py:317-364: LPIPS/PSNR/SSIM on sampled videos;
    # the shipped configs disable val, but the capability is part of the
    # engine surface)
    # ------------------------------------------------------------------

    def validation_metrics(self, params, batch: Dict, key: jax.Array,
                           lpips_params=None,
                           decoding_t: Optional[int] = None) -> Dict:
        from gcd_tpu.utils.metrics import psnr, ssim

        out = self.sample_video(params, batch, key, decoding_t=decoding_t)
        pred = np.asarray(out["sampled_video"])
        gt = np.asarray(out["gt_video"])
        metrics = {
            "val/psnr": float(np.mean([psnr(p, g) for p, g in zip(pred, gt)])),
            "val/ssim": float(np.mean([ssim(p, g) for p, g in zip(pred, gt)])),
        }
        if lpips_params is not None:
            from gcd_tpu.models.lpips import LPIPS

            model = LPIPS()
            d = model.apply({"params": lpips_params},
                            jnp.asarray(pred) * 2.0 - 1.0,
                            jnp.asarray(gt) * 2.0 - 1.0)
            metrics["val/lpips"] = float(jnp.mean(d))
        return metrics

    # ------------------------------------------------------------------
    # Fine-tune strategies (diffusion.py:126-170)
    # ------------------------------------------------------------------

    def trainable_mask(self, params: Dict) -> Dict:
        """Pytree of bools: which params receive gradients/updates."""
        emb_trainable = [
            bool(cfg.get("is_trainable", False))
            for cfg in (self.conditioner_cfg.get("params", {}) or {}).get(
                "emb_models", []
            )
        ]

        def cond_flag(path: Tuple[str, ...]) -> bool:
            # path[0] like "embedders_3"
            try:
                idx = int(path[0].rsplit("_", 1)[1])
                return emb_trainable[idx]
            except (ValueError, IndexError):
                return False

        def model_flag(path: Tuple[str, ...]) -> bool:
            joined = "/".join(path)
            if self.ft_strategy == "everything":
                return True
            if self.ft_strategy == "time":
                return "time" in joined
            if self.ft_strategy == "dummy":
                return "output_blocks_11_1/time_mixer/mix_factor" in joined
            if self.ft_strategy == "time_lora":
                # LoRA adapters carry "lora" in their path; base weights frozen.
                return "lora" in joined
            raise NotImplementedError(self.ft_strategy)

        def walk(tree, flag_fn, prefix=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = walk(v, flag_fn, prefix + (k,))
                else:
                    out[k] = flag_fn(prefix + (k,))
            return out

        out = {
            "model": walk(params.get("model", {}), model_flag),
            "conditioner": walk(params.get("conditioner", {}), cond_flag),
            "first_stage": jax.tree_util.tree_map(
                lambda _: False, params.get("first_stage", {})
            ),
        }
        if "lora" in params:
            out["lora"] = jax.tree_util.tree_map(
                lambda _: self.ft_strategy == "time_lora", params["lora"])
        return out


def _merge_with_template(loaded: Dict, template: Dict) -> Dict:
    """Fill gaps in `loaded` with template values (random init), converting
    ShapeDtypeStructs into zeros if encountered."""
    out = {}
    for k, v in template.items():
        if isinstance(v, dict):
            out[k] = _merge_with_template(loaded.get(k, {}), v)
        else:
            if k in loaded:
                out[k] = loaded[k]
            elif hasattr(v, "shape") and not hasattr(v, "dtype"):
                out[k] = np.zeros(v.shape)
            elif type(v).__name__ == "ShapeDtypeStruct":
                out[k] = np.zeros(v.shape, v.dtype)
            else:
                out[k] = v
    return out
