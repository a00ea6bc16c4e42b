"""Multi-scale deformable attention (MSDeformAttn) for TPU.

GroundingDINO's CUDA kernel (the submodule's ms_deform_attn op, invoked via
cubercnn/data/generate_ground_segmentations.py's detector) re-expressed as
static-shape XLA. Two numerically-equivalent sampling backends:

* ``ms_deform_sample_gather`` — the P sampling points per head become 4-tap
  bilinear gathers over the flattened value map (one take_along_axis per
  corner). On TPU this is the advanced-index-gather trap (~32-element
  fetches): measured 57 ms per encoder layer at 800px Swin-T geometry —
  344 ms of the whole GDINO forward (tools/profile_asset.py, round 4).
* ``ms_deform_sample_matmul`` — separable one-hot formulation: the bilinear
  weight of tap (y,x) factors into (row weight) x (column weight), so
  sampling becomes a row-selector MATMUL against the (H_l, W_l*D) value
  plane (MXU) followed by a column-weighted contraction (VPU), with
  out-of-bounds zeroing falling out of the iota equality. Queries are
  processed in fixed chunks via lax.map so the (chunk, P, W_l*D) row-band
  intermediate stays small. Bit-equal tap set to the gather backend
  (same taps, same weights; only summation order differs).

* ``ms_deform_sample_pallas`` — the same separable algebra with the row
  band fused in VMEM (no HBM intermediate). Forward-only.

The active backend is chosen by ``SAMPLE_IMPL``: "auto" (default) takes
the Pallas kernel on TPU and the matmul backend elsewhere. Measured
back-to-back on a quiet v5e (encoder geometry, 800px Swin-T, bf16):
gather 54.1 ms / matmul 28.0 / pallas 21.8 per layer; decoder (Lq=900):
3.2 / 2.7 / 1.4. The matmul backend is differentiable and is the
fallback for anyone fine-tuning; the reference only ever runs GDINO as a
frozen asset generator.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

SAMPLE_IMPL = "auto"
# query-chunk for the matmul backend: bounds the row-band intermediate
# (chunk * P * W_l * D) while keeping per-step matmuls MXU-sized
SAMPLE_CHUNK = 128


def ms_deform_sample(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Dispatch to the active sampling backend. Returns (B, Lq, H, D)."""
    impl = SAMPLE_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "matmul"
    if impl == "pallas":
        return ms_deform_sample_pallas(value, spatial_shapes, locations, weights)
    if impl == "matmul":
        return ms_deform_sample_matmul(value, spatial_shapes, locations, weights)
    return ms_deform_sample_gather(value, spatial_shapes, locations, weights)


def ms_deform_sample_matmul(
    value: jnp.ndarray,               # (B, S, H, D) flattened multi-scale values
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,           # (B, Lq, H, L, P, 2) normalized [0,1]
    weights: jnp.ndarray,             # (B, Lq, H, L, P) softmaxed
) -> jnp.ndarray:
    """Separable one-hot matmul backend. Returns (B, Lq, H, D).

    For a tap at pixel (y, x) with bilinear weight wy*wx, the sample
    factorizes: out = sum_y rowsel[y] * (sum_x colsel[x] * v[y, x]) where
    rowsel has two nonzeros (y0: 1-fy, y0+1: fy) and colsel likewise in x.
    Stage 1 contracts rowsel with the (H_l, W_l*D) plane on the MXU for all
    P points of a query chunk at once; stage 2 applies the column weights
    (attention weight folded in) and reduces over x and P. Out-of-bounds
    taps vanish because an index outside [0, H_l) matches no iota row —
    identical zero-padding semantics to the gather backend.
    """
    b, _, h, d = value.shape
    lq = locations.shape[1]
    p = locations.shape[4]
    chunk = min(SAMPLE_CHUNK, lq)
    n_chunks = -(-lq // chunk)
    pad = n_chunks * chunk - lq
    if pad:
        locations = jnp.pad(locations, ((0, 0), (0, pad)) + ((0, 0),) * 4)
        weights = jnp.pad(weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)

    # per-level value planes arranged for the row matmul: (B, H, H_l, W_l*D)
    planes = []
    offset = 0
    for hl, wl in spatial_shapes:
        v = value[:, offset : offset + hl * wl]
        offset += hl * wl
        planes.append(
            v.reshape(b, hl, wl, h, d).transpose(0, 3, 1, 2, 4).reshape(b, h, hl, wl * d)
        )

    # (n_chunks, B, chunk, ...) for lax.map over query chunks
    loc_c = locations.reshape(b, n_chunks, chunk, h, len(spatial_shapes), p, 2).transpose(
        1, 0, 2, 3, 4, 5, 6
    )
    w_c = weights.reshape(b, n_chunks, chunk, h, len(spatial_shapes), p).transpose(
        1, 0, 2, 3, 4, 5
    )

    def one_chunk(args):
        loc, aw = args                      # (B, chunk, H, L, P, 2/..)
        out = jnp.zeros((b, chunk, h, d), value.dtype)
        for lvl, (hl, wl) in enumerate(spatial_shapes):
            plane = planes[lvl]             # (B, H, hl, wl*d)
            # index/fraction scalars arranged (B, H, chunk, P) up front —
            # every later tensor keeps the lane-dense wl*d minor dimension
            # (a d=32 minor would be padded to the 128-lane tile, 4x waste)
            l = loc[:, :, :, lvl].transpose(0, 2, 1, 3, 4)  # (B, H, chunk, P, 2)
            w = aw[:, :, :, lvl].transpose(0, 2, 1, 3)      # (B, H, chunk, P)
            x = l[..., 0].astype(jnp.float32) * wl - 0.5
            y = l[..., 1].astype(jnp.float32) * hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = (x - x0)[..., None]
            fy = (y - y0)[..., None]
            # int indices, clamped only to keep the int32 cast safe; the
            # iota equality below zeroes genuinely out-of-range taps
            yi = jnp.clip(y0, -2, hl + 1).astype(jnp.int32)[..., None]
            xi = jnp.clip(x0, -2, wl + 1).astype(jnp.int32)[..., None]
            ioy = jnp.arange(hl, dtype=jnp.int32)
            rowsel = (
                (ioy == yi) * (1.0 - fy) + (ioy == yi + 1) * fy
            ).astype(value.dtype)           # (B, H, chunk, P, hl)
            # stage 1 (MXU): contract rows -> (B, H, chunk*P, wl*d). The
            # band stays in value dtype: it is re-read once by stage 2, and
            # its HBM traffic is the cost floor of this backend.
            band = jnp.einsum(
                "bhnk,bhkm->bhnm", rowsel.reshape(b, h, chunk * p, hl), plane
            ).reshape(b, h, chunk, p, wl * d)
            # stage 2: column weights broadcast at x*d resolution (stays
            # lane-dense; XLA fuses the compare/select into the multiply),
            # sum over P, then reduce x via a fixed iota matmul (m % d)
            iox = jnp.arange(wl * d, dtype=jnp.int32) // d
            wsel = (
                ((iox == xi) * (1.0 - fx) + (iox == xi + 1) * fx)
                * w[..., None].astype(jnp.float32)
            ).astype(value.dtype)           # (B, H, chunk, P, wl*d)
            red = (band * wsel).sum(axis=3)  # (B, H, chunk, wl*d)
            lanes = (
                (jnp.arange(wl * d) % d)[:, None] == jnp.arange(d)
            ).astype(value.dtype)           # (wl*d, d)
            lvl_out = jnp.einsum("bhcm,md->bhcd", red, lanes)
            out = out + lvl_out.transpose(0, 2, 1, 3).astype(value.dtype)
        return out

    chunks = jax.lax.map(one_chunk, (loc_c, w_c))   # (n_chunks, B, chunk, H, D)
    out = chunks.transpose(1, 0, 2, 3, 4).reshape(b, n_chunks * chunk, h, d)
    return out[:, :lq]


def ms_deform_sample_pallas(
    value: jnp.ndarray,               # (B, S, H, D) flattened multi-scale values
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,           # (B, Lq, H, L, P, 2) normalized [0,1]
    weights: jnp.ndarray,             # (B, Lq, H, L, P) softmaxed
    chunk: int = 128,
    heads_per_step: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Pallas backend. Returns (B, Lq, H, D).

    Same separable one-hot algebra as ``ms_deform_sample_matmul``, but the
    (chunk*P, W_l*D) row band lives entirely in VMEM: one grid step builds
    the row selector (iota compare), contracts it with the level plane on
    the MXU, applies the x/attention weights lane-dense at x*d resolution,
    and reduces x (iota lanes matmul) and P (selector matmul) — no HBM
    intermediate at all, which is the matmul backend's cost floor. Grid is
    (head, query-chunk) per level with the chunk axis innermost, so the
    per-head plane is DMA'd once per head, not once per chunk.

    Forward-only (no VJP): the GDINO consumer is a frozen asset generator
    (reference generate_ground_segmentations.py:129-206 never trains it).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, h, d = value.shape
    lq = locations.shape[1]
    p = locations.shape[4]
    # heads per grid step would amortize the per-step fixed cost (selector
    # iota builds, pipeline bubbles) across hb unrolled heads — but EVERY
    # hb>1 variant (2, 4, 8) crashes the axon relay's Mosaic compile
    # helper (HTTP 500, subprocess exit 1; DESIGN 11). Interpret-mode
    # parity covers the loop form; flip the default when the toolchain
    # catches up.
    hb = heads_per_step if h % heads_per_step == 0 else 1

    def one_image(value_i, loc_i, w_i):
        # value_i (S, H, D); loc_i (Lq, H, L, P, 2); w_i (Lq, H, L, P)
        out = jnp.zeros((lq, h, d), jnp.float32)
        offset = 0
        for lvl, (hl, wl) in enumerate(spatial_shapes):
            # per-level chunk: smaller levels take bigger chunks (the VMEM
            # band is chunk*P x wl*d), cutting the grid-step count — the
            # fixed per-step cost dominated the small levels. Capped at 2x:
            # the P-sum selector is (chunk, chunk*P), i.e. quadratic in the
            # chunk, and 4x scaling blew the 16 MB VMEM budget on level 2
            chunk_l = min(lq, max(1, chunk * max(1, min(2, 3200 // (wl * d)))))
            n_chunks = -(-lq // chunk_l)
            pad = n_chunks * chunk_l - lq
            ckp = chunk_l * p

            v = value_i[offset : offset + hl * wl]
            offset += hl * wl
            plane = (
                v.reshape(hl, wl, h, d).transpose(2, 0, 1, 3).reshape(h, hl, wl * d)
            )
            l = loc_i[:, :, lvl]                    # (Lq, H, P, 2)
            w = w_i[:, :, lvl]                      # (Lq, H, P)
            x = l[..., 0].astype(jnp.float32) * wl - 0.5
            y = l[..., 1].astype(jnp.float32) * hl - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)

            def arr(a, dtype=jnp.float32):
                # (Lq, H, P) -> (H, n_chunks, ckp, 1) trailing-1 for
                # in-kernel lane broadcasting (Mosaic rejects 1D reshapes)
                a = a.astype(dtype)
                if pad:
                    a = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
                return a.transpose(1, 0, 2).reshape(h, n_chunks, ckp, 1)

            yi = arr(jnp.clip(y0, -2, hl + 1), jnp.int32)
            xi = arr(jnp.clip(x0, -2, wl + 1), jnp.int32)
            fy = arr(y - y0)
            fx = arr(x - x0)
            wv = arr(w)

            def kernel(yi_ref, fy_ref, xi_ref, fx_ref, w_ref, plane_ref, out_ref):
                # selector constants shared by the hb heads of this step
                ioy = jax.lax.broadcasted_iota(jnp.int32, (ckp, hl), 1)
                iox = jax.lax.broadcasted_iota(jnp.int32, (ckp, wl), 1)
                er = jax.lax.broadcasted_iota(jnp.int32, (wl, wl * d), 0)
                ec = jax.lax.broadcasted_iota(jnp.int32, (wl, wl * d), 1) // d
                expand = (er == ec).astype(value.dtype)
                li = jax.lax.broadcasted_iota(jnp.int32, (wl * d, d), 0) % d
                lj = jax.lax.broadcasted_iota(jnp.int32, (wl * d, d), 1)
                lanes = (li == lj).astype(value.dtype)
                rr = jax.lax.broadcasted_iota(jnp.int32, (chunk_l, ckp), 0)
                cc = jax.lax.broadcasted_iota(jnp.int32, (chunk_l, ckp), 1)
                psel = (cc // p == rr).astype(jnp.float32)
                for j in range(hb):
                    yiv = yi_ref[j, 0]              # (ckp, 1) int32
                    fyv = fy_ref[j, 0]              # (ckp, 1) f32
                    rowsel = (
                        (ioy == yiv) * (1.0 - fyv) + (ioy == yiv + 1) * fyv
                    ).astype(value.dtype)
                    band = jnp.dot(
                        rowsel, plane_ref[j], preferred_element_type=jnp.float32
                    )                               # (ckp, wl*d) f32
                    xiv = xi_ref[j, 0]
                    fxv = fx_ref[j, 0]
                    # colsel at wl resolution (cheap VPU), expanded to the
                    # lane-dense x*d width by an MXU dot with the iota
                    # expansion matrix E[x, m] = (m // d == x) — building
                    # the weights directly at x*d width was VPU-bound
                    colsel = (
                        (iox == xiv) * (1.0 - fxv) + (iox == xiv + 1) * fxv
                    ) * w_ref[j, 0]
                    wsel = jnp.dot(
                        colsel.astype(value.dtype), expand,
                        preferred_element_type=jnp.float32,
                    )
                    wband = (band * wsel).astype(value.dtype)
                    outcp = jnp.dot(wband, lanes, preferred_element_type=jnp.float32)
                    # P-sum via selector matmul ((ckp,d) rows are
                    # query-major: row n belongs to query n // P)
                    out_ref[j, 0] = jnp.dot(
                        psel, outcp, preferred_element_type=jnp.float32
                    )

            scal = lambda: pl.BlockSpec((hb, 1, ckp, 1), lambda hh, cc: (hh, cc, 0, 0))
            lvl_out = pl.pallas_call(
                kernel,
                grid=(h // hb, n_chunks),
                in_specs=[
                    scal(), scal(), scal(), scal(), scal(),
                    pl.BlockSpec((hb, hl, wl * d), lambda hh, cc: (hh, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (hb, 1, chunk_l, d), lambda hh, cc: (hh, cc, 0, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((h, n_chunks, chunk_l, d), jnp.float32),
                interpret=interpret,
            )(yi, fy, xi, fx, wv, plane)
            lvl_out = lvl_out.reshape(h, n_chunks * chunk_l, d).transpose(1, 0, 2)
            out = out + lvl_out[:lq]
        return out

    out = jax.vmap(one_image)(value, locations, weights)
    return out.astype(value.dtype)


def ms_deform_sample_gather(
    value: jnp.ndarray,               # (B, S, H, D) flattened multi-scale values
    spatial_shapes: Sequence[Tuple[int, int]],
    locations: jnp.ndarray,           # (B, Lq, H, L, P, 2) normalized [0,1]
    weights: jnp.ndarray,             # (B, Lq, H, L, P) softmaxed
) -> jnp.ndarray:
    """Returns (B, Lq, H, D)."""
    b, _, h, d = value.shape
    lq = locations.shape[1]
    out = jnp.zeros((b, lq, h, d), value.dtype)
    offset = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v = value[:, offset : offset + hl * wl]            # (B, S_l, H, D)
        offset += hl * wl
        vv = v.transpose(0, 2, 1, 3)                       # (B, H, S_l, D)
        loc = locations[:, :, :, lvl]                      # (B, Lq, H, P, 2)
        w = weights[:, :, :, lvl]                          # (B, Lq, H, P)
        # grid_sample(align_corners=False) pixel coords
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        acc = jnp.zeros((b, lq, h, loc.shape[3], d), value.dtype)
        for dy, dx, tap_w in (
            (0, 0, (1 - fy) * (1 - fx)),
            (0, 1, (1 - fy) * fx),
            (1, 0, fy * (1 - fx)),
            (1, 1, fy * fx),
        ):
            xi = x0 + dx
            yi = y0 + dy
            ok = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
            idx = (
                jnp.clip(yi, 0, hl - 1).astype(jnp.int32) * wl
                + jnp.clip(xi, 0, wl - 1).astype(jnp.int32)
            )                                              # (B, Lq, H, P)
            flat = idx.transpose(0, 2, 1, 3).reshape(b, h, -1)
            g = jnp.take_along_axis(vv, flat[..., None], axis=2)
            g = g.reshape(b, h, lq, loc.shape[3], d).transpose(0, 2, 1, 3, 4)
            acc = acc + g * (tap_w * ok[..., None]).astype(value.dtype)
        out = out + jnp.sum(acc * w[..., None].astype(value.dtype), axis=3)
    return out


class MSDeformAttn(nn.Module):
    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query,                 # (B, Lq, C)
        ref_points,            # (B, Lq, L, 2) or (B, Lq, L, 4) normalized
        value,                 # (B, S, C)
        spatial_shapes,        # static [(H_l, W_l)] * L
        value_mask=None,       # (B, S) bool
    ):
        b, lq, c = query.shape
        h, L, p = self.heads, self.levels, self.points
        v = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        if value_mask is not None:
            v = v * value_mask[..., None].astype(v.dtype)
        v = v.reshape(b, -1, h, c // h)

        off = nn.Dense(h * L * p * 2, dtype=self.dtype, name="sampling_offsets")(query)
        off = off.reshape(b, lq, h, L, p, 2)
        aw = nn.Dense(h * L * p, dtype=self.dtype, name="attention_weights")(query)
        aw = jax.nn.softmax(aw.reshape(b, lq, h, L * p), axis=-1).reshape(b, lq, h, L, p)

        if ref_points.shape[-1] == 2:
            norm = jnp.asarray([[wl, hl] for hl, wl in spatial_shapes], off.dtype)
            loc = ref_points[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
        else:
            xy = ref_points[..., :2][:, :, None, :, None, :]
            wh = ref_points[..., 2:][:, :, None, :, None, :]
            loc = xy + off / p * wh * 0.5
        sampled = ms_deform_sample(v, spatial_shapes, loc, aw)  # (B, Lq, H, D)
        out = sampled.reshape(b, lq, c)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)
