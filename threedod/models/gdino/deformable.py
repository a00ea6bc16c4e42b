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
            # measured ~10 us fixed per-step cost dominates them (r5
            # attribution: a 13x13 level with near-zero compute still cost
            # 4.05 ms = 416 steps). The P-sum is a reshape-sum (no
            # quadratic selector since r5), so the cap is just the f32
            # band staying well under the 16 MB VMEM budget:
            # chunk*P*wl*d*4B <= ~6.5 MB.
            # empirical VMEM schedule (Mosaic's scoped-vmem accounting
            # includes the double-buffered f32 band + wsel): 4x on the
            # 800-lane level OOMs at 18.3M/16M, 3x fits; 6x on the
            # smallest level fits comfortably
            m = wl * d
            factor = 1 if m >= 3200 else 2 if m >= 1600 else 3 if m >= 800 else 6
            chunk_l = min(lq, max(1, chunk * factor))
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

            # ONE row-major packed scalar block per step: rows [yi, fy, xi,
            # fx, w] on the SUBLANE axis, queries on the lane axis. The
            # former five (ckp, 1) column blocks each padded their lane dim
            # to the 128 tile — 5 x ckp x 128 x 4B double-buffered was the
            # dominant VMEM term (24 MB at a 6x chunk) AND most of the
            # per-step DMA; the packed (8, ckp) form is 80x smaller.
            def pack(*arrays):
                a = jnp.stack([x.astype(jnp.float32) for x in arrays])  # (5, Lq, H, P)
                if pad:
                    a = jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0)))
                a = a.transpose(2, 0, 1, 3).reshape(h, 5, n_chunks, ckp)
                a = a.transpose(0, 2, 1, 3)  # (H, n_chunks, 5, ckp)
                return jnp.pad(a, ((0, 0), (0, 0), (0, 3), (0, 0)))

            packed = pack(
                jnp.clip(y0, -2, hl + 1), y - y0,
                jnp.clip(x0, -2, wl + 1), x - x0, w,
            )

            def kernel(scal_ref, plane_ref, out_ref):
                # iota selector constants shared by the hb heads of a step
                ioy = jax.lax.broadcasted_iota(jnp.int32, (hl, ckp), 0)
                iox = jax.lax.broadcasted_iota(jnp.int32, (wl, ckp), 0)
                er = jax.lax.broadcasted_iota(jnp.int32, (wl, wl * d), 0)
                ec = jax.lax.broadcasted_iota(jnp.int32, (wl, wl * d), 1) // d
                expand = (er == ec).astype(value.dtype)
                li = jax.lax.broadcasted_iota(jnp.int32, (wl * d, d), 0) % d
                lj = jax.lax.broadcasted_iota(jnp.int32, (wl * d, d), 1)
                lanes = (li == lj).astype(value.dtype)
                # contract dim 0 of both operands: lhs arrives transposed
                # (selector built query-minor so the (1, ckp) scalar rows
                # broadcast along sublanes)
                dn = (((0,), (0,)), ((), ()))
                for j in range(hb):
                    sc = scal_ref[j, 0]             # (8, ckp) f32
                    yiv = sc[0:1].astype(jnp.int32)
                    fyv = sc[1:2]
                    rowsel_t = (
                        (ioy == yiv) * (1.0 - fyv) + (ioy == yiv + 1) * fyv
                    ).astype(value.dtype)           # (hl, ckp)
                    band = jax.lax.dot_general(
                        rowsel_t, plane_ref[j], dn,
                        preferred_element_type=jnp.float32,
                    )                               # (ckp, wl*d) f32
                    xiv = sc[2:3].astype(jnp.int32)
                    fxv = sc[3:4]
                    # colsel at wl resolution (cheap VPU), expanded to the
                    # lane-dense x*d width by an MXU dot with the iota
                    # expansion matrix E[x, m] = (m // d == x) — building
                    # the weights directly at x*d width was VPU-bound
                    colsel_t = (
                        (iox == xiv) * (1.0 - fxv) + (iox == xiv + 1) * fxv
                    ) * sc[4:5]                     # (wl, ckp)
                    wsel = jax.lax.dot_general(
                        colsel_t.astype(value.dtype), expand, dn,
                        preferred_element_type=jnp.float32,
                    )                               # (ckp, wl*d)
                    wband = (band * wsel).astype(value.dtype)
                    outcp = jnp.dot(wband, lanes, preferred_element_type=jnp.float32)
                    # P-sum: rows are query-major (row n belongs to query
                    # n // P), so a sublane regroup + middle-axis sum
                    # replaces the former (chunk, ckp) selector matmul —
                    # which was quadratic in the chunk and capped small
                    # levels at 2x base (r5; frees the chunk budget that
                    # cuts their grid-step count 2-4x)
                    out_ref[j, 0] = outcp.reshape(chunk_l, p, d).sum(axis=1)

            lvl_out = pl.pallas_call(
                kernel,
                grid=(h // hb, n_chunks),
                in_specs=[
                    pl.BlockSpec((hb, 1, 8, ckp), lambda hh, cc: (hh, cc, 0, 0)),
                    pl.BlockSpec((hb, hl, wl * d), lambda hh, cc: (hh, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (hb, 1, chunk_l, d), lambda hh, cc: (hh, cc, 0, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((h, n_chunks, chunk_l, d), jnp.float32),
                interpret=interpret,
            )(packed, plane)
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
