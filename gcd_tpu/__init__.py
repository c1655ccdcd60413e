"""gcd_tpu — a TPU-native (JAX/flax/pjit/Pallas) video-diffusion framework with the
capabilities of basilevh/gcd ("Generative Camera Dolly"): monocular dynamic novel view
synthesis via a camera-conditioned fine-tune of Stable Video Diffusion.

Layer map (bottom-up), mirroring SURVEY.md section 1 but re-designed TPU-first:

  ops/        Pallas kernels + core tensor ops (flash attention, fused GroupNorm+SiLU,
              point-splat scatter) — the TPU-native replacement for the reference's
              third-party CUDA kernels (xformers / torch SDPA).
  models/     flax.linen network definitions: VideoUNet, KL video VAE, CLIP image tower,
              conditioner + embedders (reference: gcd-model/sgm/modules/*).
  diffusion/  pure-function diffusion math: EDM scalings, discretization, sigma sampling,
              loss weighting, denoiser transform, CFG guiders, samplers as lax.scan
              (reference: gcd-model/sgm/modules/diffusionmodules/*).
  parallel/   jax.sharding Mesh construction + partition rules (DP/FSDP over ICI) —
              replaces the reference's Lightning DDP/NCCL layer.
  engine/     DiffusionEngine: train step, sampling, EMA, optimizer, checkpointing
              (reference: gcd-model/sgm/models/diffusion.py + main.py driver).
  data/       Kubric-4D / ParallelDomain-4D pipelines: camera geometry, point-splat
              rendering, trajectory sampling (reference: gcd-model/sgm/data/*).
  io/         checkpoint conversion (torch -> jax), orbax save/load, config system
              (reference: sgm/util.py instantiate_from_config + main.py resume logic).
"""

__version__ = "0.1.0"
