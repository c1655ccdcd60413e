"""Core flax building blocks for the UNet / VAE stacks.

Behavioral reference: gcd-model/sgm/modules/diffusionmodules/util.py (GroupNorm32
:274, AlphaBlender :312, zero_module :234) and sgm/modules/attention.py (GEGLU :87,
FeedForward :97).

Layout: NHWC (TPU-native); videos are (B, T, H, W, C); flattened spatial batches
are (B*T, H, W, C). All matmul/conv compute can run in bf16 (`dtype`); GroupNorm
and LayerNorm always reduce in fp32 and cast back (matching the reference's fp32
GroupNorm islands, which the published checkpoints depend on numerically).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def zeros_init():
    return nn.initializers.zeros


class _NormParams(nn.Module):
    """Scale/bias holder nested under name "norm" so the torch->flax key map
    (io/convert.py) is identical whether the fused or unfused path runs."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return scale, bias


class _ConvParams(nn.Module):
    """Kernel/bias holder with nn.Conv's param names and default inits, so a
    module can choose between the plain conv and a fused formulation (e.g.
    ops/subpixel.py) while the checkpoint key map stays identical."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32 groups) computed in fp32 regardless of activation dtype,
    with an optional fused SiLU epilogue. Runs the channel-first XLA
    formulation in ops/fused_norm.py (its Pallas kernel is an opt-in via
    GCD_FUSED_GN=1 — measured slower than XLA's own fusions e2e)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    silu: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from gcd_tpu.ops.fused_norm import group_norm_silu

        scale, bias = _NormParams(x.shape[-1], self.param_dtype, name="norm")()
        return group_norm_silu(x, scale, bias, self.num_groups, self.epsilon,
                               self.silu)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32, cast back to input dtype."""

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        out = nn.LayerNorm(
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="norm",
        )(x.astype(jnp.float32))
        return out.astype(orig_dtype)


class Dense(nn.Module):
    """nn.Dense with optional zero-init (reference zero_module pattern)."""

    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear",
        )(x)


class Conv(nn.Module):
    """N-d convolution (NHWC / NTHWC) with optional zero-init."""

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    zero_init: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            strides=self.strides,
            padding=self.padding,
            kernel_init=kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class GEGLU(nn.Module):
    """x, gate = proj(x).chunk(2); x * gelu(gate) (attention.py:87)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        proj = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(proj, 2, axis=-1)
        # torch F.gelu is the exact (erf) variant.
        return x * jax.nn.gelu(gate, approximate=False)


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params (kernel/bias) without computing,
    so fused kernels can consume the raw arrays. Initializers match nn.Dense
    defaults; the param tree is identical to an nn.Dense at the same name."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _GEGLUParams(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, in_features: int):
        return _DenseParams(2 * self.dim_out, name="proj")(in_features)


class FeedForward(nn.Module):
    """Transformer MLP; `glu=True` uses GEGLU (attention.py:97).

    The GEGLU path runs through ops/fused_mlp.geglu_mlp — a Pallas kernel
    that keeps the (tokens, 2*inner) up-projection in VMEM instead of
    round-tripping it through HBM (220 MB per ds1 FF in the SVD UNet). The
    param tree is unchanged (net_0/proj, net_2), and the op falls back to an
    identical-math XLA path off-TPU / at indivisible shapes."""

    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        dim_out = self.dim_out if self.dim_out is not None else dim
        if self.glu:
            from gcd_tpu.ops.fused_mlp import geglu_mlp

            w1, b1 = _GEGLUParams(inner, name="net_0")(dim)
            w2, b2 = _DenseParams(dim_out, name="net_2")(inner)
            return geglu_mlp(x.astype(self.dtype), w1, b1, w2, b2)
        h = nn.Dense(inner, dtype=self.dtype, name="net_0_proj")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(dim_out, dtype=self.dtype, name="net_2")(h)


class AlphaBlender(nn.Module):
    """Learned sigmoid mix of spatial and temporal branches (util.py:312-368).

    merge_strategy:
      - "fixed": constant alpha
      - "learned": sigmoid(mix_factor)
      - "learned_with_images": per-(b,t) switch — alpha=1 (spatial only) where
        image_only_indicator is set, sigmoid(mix_factor) otherwise.

    `mode` selects broadcasting for the caller's layout:
      - "video_nthwc": inputs (B, T, H, W, C), indicator (B, T)
      - "tokens_bt":   inputs (B*T, S, C),     indicator (B, T)
      - "tokens_bs":   inputs (B*S, T, C),     indicator (B, T) — temporal-major
    """

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.merge_strategy in ("fixed", "learned", "learned_with_images")
        if self.merge_strategy in ("learned", "learned_with_images"):
            self.mix_factor = self.param(
                "mix_factor",
                lambda key: jnp.full((1,), self.alpha, dtype=self.param_dtype),
            )

    def get_alpha(self, image_only_indicator: Optional[jnp.ndarray], mode: str,
                  spatial_shape) -> jnp.ndarray:
        if self.merge_strategy == "fixed":
            return jnp.full((1,), self.alpha, dtype=jnp.float32)
        if self.merge_strategy == "learned":
            return jax.nn.sigmoid(self.mix_factor)
        assert image_only_indicator is not None, "need image_only_indicator"
        mix = jax.nn.sigmoid(self.mix_factor)  # (1,)
        alpha = jnp.where(
            image_only_indicator.astype(bool), 1.0, mix[0]
        )  # (B, T)
        if mode == "video_nthwc":
            return alpha[:, :, None, None, None]
        if mode == "tokens_bt":
            return alpha.reshape(-1)[:, None, None]  # (B*T, 1, 1)
        if mode == "tokens_bs":
            b, t = alpha.shape
            s = spatial_shape
            # (B, T) -> (B*S, T, 1): every spatial location of video b shares its row.
            return jnp.repeat(alpha[:, None, :, None], s, axis=1).reshape(b * s, t, 1)
        raise ValueError(f"unknown mode {mode}")

    def __call__(
        self,
        x_spatial: jnp.ndarray,
        x_temporal: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray] = None,
        mode: str = "video_nthwc",
    ) -> jnp.ndarray:
        s = None
        if mode == "tokens_bs" and image_only_indicator is not None:
            # x_spatial is (B*S, T, C); recover S from the indicator's batch dim.
            s = x_spatial.shape[0] // image_only_indicator.shape[0]
        alpha = self.get_alpha(image_only_indicator, mode, s)
        alpha = alpha.astype(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal
