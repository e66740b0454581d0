"""Space-to-depth packed execution of the decoder's finest levels
(ROADMAP r1 #1 / VERDICT r1 next-#2 — the measured 1.5-2x judged-metric
lever).

Why: the U-Net decoder's two finest levels run 3x3 convs with C=16/32
channels at (H, W) and (H/2, W/2). On TPU the channel axis maps to the
128 VPU/MXU lanes, so C=16 activations waste 7/8 of every tile, and XLA
surrounds each conv with layout copies + a reflect-pad copy + an unfused
ELU pass — measured at ~53% of the whole mono iteration (BASELINE.md
round-1 profile).

Fix: execute those levels in a space-to-depth packed layout. Pixel
(2i+a, 2j+b) of a full-res (H, W, C) tensor lives in channel group
g = 2a+b of a packed (H/2, W/2, 4C) tensor. A stride-1 3x3 conv then
becomes a 3x3 conv on the packed layout with a (3, 3, 4C, 4Co) kernel
holding structural zeros:

    KP[p+1, q+1, (α,β,c), (a,b,o)] = K[2p+α-a+1, 2q+β-b+1, c, o]
                                     (0 where the index leaves [0,2])

FLOPs grow 4x but lane utilization grows 4x (16→64 channels), so MXU
time is neutral — the win is eliminating the full-res materializations:
the nearest-neighbour upsample becomes a channel tile (group g of the
packed rep of upsample2x(x) is x itself, for every g), the skip concat
happens in packed space, and the small-C layout copies disappear.

Two exactness lemmas this module relies on (derived in-line below):

* **Nearest upsample = channel tile.** packed(upsample2x(x))[i, j, g]
  = x[i, j] for all four groups g.
* **Full-res reflect pad = packed edge pad.** The packed conv's halo
  taps only carry non-zero weight for the parity that corresponds to
  full-res row/col -1 (resp. H/W): e.g. the top halo is only read at
  α=1 (u = 2p+α-a = -1 requires α=1, a=0), and full-res row -1
  reflects to row 1 = packed row 0 at α=1 — exactly what edge
  replication of packed row 0 provides. The α=0 slot of the halo is
  multiplied by structural zeros, so its content is arbitrary.

Numerically the packed conv sums the same 9·C products per output pixel
(plus exact zeros), so fp32 results match the standard path to
reassociation error (~1e-6); tests/test_packed.py pins this.

Used by api.build_mono_program for inference programs when
``cfg.mono.packed_decoder`` is enabled (scale-0 output only — the other
dispconv heads are inference dead code anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla
from scenedepthestimation_tpu.ops.upsample import upsample_concat


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C); channel order (a, b, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) → (B, 2H, 2W, C); inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def pack_conv3x3_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) full-res conv kernel → (3, 3, 4C, 4Co) packed kernel.

    Built from concats of the original kernel taps and zero blocks at
    trace time; loop-invariant under jit (depends only on the weights),
    so XLA hoists it out of any surrounding loop.
    """
    c, co = k.shape[2], k.shape[3]
    zero = jnp.zeros((c, co), k.dtype)
    rows = []
    for p in (-1, 0, 1):
        cols = []
        for q in (-1, 0, 1):
            gi_blocks = []
            for alpha in (0, 1):
                for beta in (0, 1):
                    go_blocks = []
                    for a in (0, 1):
                        for b in (0, 1):
                            u = 2 * p + alpha - a
                            v = 2 * q + beta - b
                            go_blocks.append(
                                k[u + 1, v + 1]
                                if -1 <= u <= 1 and -1 <= v <= 1
                                else zero
                            )
                    gi_blocks.append(jnp.concatenate(go_blocks, axis=1))
            cols.append(jnp.concatenate(gi_blocks, axis=0))  # (4C, 4Co)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (3, 3, 4C, 4Co)


# None = auto: the fused Pallas packed conv on TPU (dense 128-lane
# channels — the round-1 kernel's C=16 lane-padding blocker does not
# apply in the packed layout), the XLA lowering elsewhere.
_USE_PALLAS: bool | None = None


def set_use_pallas(flag: bool | None) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def conv3x3_packed(
    x: jnp.ndarray,
    packed_kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    activation: str | None = "elu",
    use_pallas: bool | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Packed-layout 3x3 conv with full-res-reflect border semantics.

    ``bias`` is the ORIGINAL (Co,) bias — tiled across the 4 output
    groups here. Edge padding of the packed tensor reproduces the
    full-res reflect pad exactly (module docstring lemma 2).
    """
    use = _USE_PALLAS if use_pallas is None else use_pallas
    if use is None:
        use = jax.default_backend() == "tpu"
    bias4 = (
        jnp.tile(bias, 4)
        if bias is not None
        else jnp.zeros((packed_kernel.shape[-1],), x.dtype)
    )
    if use:
        from scenedepthestimation_tpu.ops.pallas.conv_block import (
            _pick_th,
            conv3x3_elu_pallas,
        )

        cin, cout = packed_kernel.shape[2], packed_kernel.shape[3]
        if _pick_th(x.shape[1], x.shape[2], cin, cout, x.dtype.itemsize):
            return conv3x3_elu_pallas(
                x,
                packed_kernel.astype(x.dtype),
                bias4,
                activation=activation or "none",
                border="edge",
                out_dtype=out_dtype,
            )
    y = lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
        packed_kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + bias4
    if activation == "elu":
        y = jax.nn.elu(y)
    elif activation == "relu":
        y = jax.nn.relu(y)
    elif activation == "sigmoid":
        y = jax.nn.sigmoid(y.astype(jnp.float32))
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y


def packed_mono_decoder(
    dec_params,
    features,
    dec_channels=(16, 32, 64, 128, 256),
    upsample_mode: str = "nearest",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Scale-0 disparity via the packed finest levels.

    Levels 4..2 run the standard path (C ≥ 64 there — layouts are already
    efficient); levels 1 and 0 run packed. Reads the standard
    ``DepthDecoder`` param tree (upconv_i_j/conv, dispconv_0/conv) so
    checkpoints and the torch importer are unaffected.

    Returns the (B, H, W, 1) sigmoid disparity — identical (to
    reassociation error) to ``DepthDecoder(...)(features)[0]``.
    """
    assert upsample_mode == "nearest", "packed path requires nearest upsample"

    def cb(name, t):  # ConvBlock: reflect-pad conv3x3 + ELU (models/unet_decoder)
        p = dec_params[name]["conv"]
        return conv3x3_xla(
            t.astype(dtype),
            p["kernel"].astype(dtype),
            p["bias"].astype(dtype),
            "elu",
        )

    def packed_params(name):
        p = dec_params[name]["conv"]
        return p["kernel"].astype(dtype), p["bias"].astype(dtype)

    x = features[-1]
    for i in (4, 3, 2):
        x = cb(f"upconv_{i}_0", x)
        x = upsample_concat(x, features[i - 1], mode=upsample_mode)
        x = cb(f"upconv_{i}_1", x)

    # ---- level 1, packed at base (H/4, W/4) --------------------------
    t = cb("upconv_1_0", x)  # (B, H/4, W/4, c1)
    k11, b11 = packed_params("upconv_1_1")
    c1 = dec_channels[1]
    # The standard path concatenates [upsample2x(t), features[0]] before
    # upconv_1_1. In packed space: tile(t) covers the upsample part and
    # s2d(features[0]) the skip. The two parts land group-major
    # SEPARATELY, so the packed kernel is built per-part and concatenated
    # along its input channels to match — one fused conv, no interleave.
    x1 = jnp.concatenate(
        [jnp.tile(t, (1, 1, 1, 4)), space_to_depth(features[0].astype(dtype))],
        axis=-1,
    )
    kp11 = jnp.concatenate(
        [
            pack_conv3x3_kernel(k11[:, :, :c1, :]),
            pack_conv3x3_kernel(k11[:, :, c1:, :]),
        ],
        axis=2,
    )
    y = conv3x3_packed(x1, kp11, b11, "elu")
    # (B, H/4, W/4, 4*c1) = packed (H/2, W/2, c1)

    # upconv_0_0 is a conv at (H/2, W/2): stays in the level-1 packing.
    k00, b00 = packed_params("upconv_0_0")
    z = conv3x3_packed(y, pack_conv3x3_kernel(k00), b00, "elu")
    # (B, H/4, W/4, 4*c0) = packed (H/2, W/2, c0)

    # ---- level 0, packed at base (H/2, W/2) --------------------------
    z = depth_to_space(z)  # (B, H/2, W/2, c0)
    k01, b01 = packed_params("upconv_0_1")
    y0 = conv3x3_packed(
        jnp.tile(z, (1, 1, 1, 4)), pack_conv3x3_kernel(k01), b01, "elu"
    )  # (B, H/2, W/2, 4*c0) = packed (H, W, c0)

    hp = dec_params["dispconv_0"]["conv"]
    # Sigmoid fused into the conv, fp32 out (bf16 saturates the tails —
    # same policy as DispHead).
    d = conv3x3_packed(
        y0,
        pack_conv3x3_kernel(hp["kernel"].astype(dtype)),
        hp["bias"].astype(dtype),
        activation="sigmoid",
        out_dtype=jnp.float32,
    )  # (B, H/2, W/2, 4) fp32 in [0, 1]
    return depth_to_space(d)
