"""Fused residual-conv kernels for trunk inference (Pallas, TPU).

The DLA/ResNet trunks are HBM-bandwidth-bound under stock XLA: every
conv3x3 round-trips its activations through HBM (docs/DESIGN.md section 9b
— 4.3 GB/step at bs8 512x672 after BN folding, ~77% of v5e peak). These
kernels keep whole residual subgraphs' intermediates in VMEM:

* ``fused_basic_block`` — the torchvision/DLA BasicBlock
  ``relu(conv3x3(relu(conv3x3(x)+b1))+b2 + x)`` as ONE kernel
  (reference topology: cubercnn/modeling/backbone/dla.py:27-56 and
  torchvision resnet BasicBlock via cubercnn/modeling/backbone/resnet.py).
* ``fused_tree_tail`` — a DLA ``Tree(levels==1)`` tail: one or two
  stride-1 BasicBlocks plus the Root 1x1-concat-conv
  (cubercnn/modeling/backbone/dla.py:134-175), so ``x1``/``x2`` never
  materialise in HBM.

Kernel scheme (per (image, row-tile) grid step):
- the main tile rows ride a Blocked auto-pipelined input; the halo rows
  (2 per conv in the chain) ride the SAME pipeline as small extra blocks
  of ``x`` whose index maps clamp at the image edges (out-of-image rows
  are zeroed by a full-rank validity mask, reproducing conv zero padding).
  An earlier design DMA'd the halos from an HBM alias; the axon-relay
  Mosaic toolchain crashes on sub-sublane-tile DMA extents, and clamped
  halo *blocks* measure the same and delete the scratch+semaphore
  machinery;
- width is padded to the sublane tile by an in-kernel zero concat (so
  every reshape/slice is layout-free and padding columns are exact
  zeros);
- each conv3x3 = 2 width-shift copies (explicit zero edge columns) + 9 MXU
  matmuls on row slices of the flattened ``(rows*Wp, C)`` buffer;
- f32 accumulation, compute-dtype (bf16) storage between convs — exactly
  the XLA ConvBN chain's dtype behaviour, so outputs match the unfused
  path to bf16 rounding.

Mosaic (axon toolchain) lowering rules found by hardware bisect, which
this file must respect (see docs/DESIGN.md 9c):
- NO rank-expanding broadcasts onto 3D values (``mask[..., None]`` over
  an (n, W, C) value crashes the remote compiler); (m, 1)-over-(m, C)
  2D broadcasts and full-rank 3D iota masks are fine;
- NO DMA/VMEM extents off the sublane tile (W=42 copies crash); width
  is padded via concat instead;
- NO strided slicing (``x[::2]`` lowers to an unsupported gather) —
  parity planes come from layout-free reshapes + static unit slices;
- NO in-kernel ``dynamic_slice`` on VMEM values — halo blocks are
  chosen so every in-kernel slice offset is static.

Eval-only (BN is folded into the conv weights by the caller); training
keeps the stock XLA path, whose backward XLA already handles well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_basic_block",
    "fused_tree_tail",
    "fused_block_down",
    "fused_conv_relu_head",
    "fused_fpn_level",
    "fused_conv_available",
    "fuse_tile",
    "pick_row_tile",
    "basic_block_reference",
    "tree_tail_reference",
]


# Tests set this to exercise the fused model paths on CPU via the Pallas
# interpreter (the kernels themselves are TPU-only).
FORCE_INTERPRET = False

# Gate for the real-hardware path. On TPU a fused kernel additionally runs
# only at call-site shapes in HW_WINNERS (measured parity + speedup on a
# real v5e via tools/measure_fused.py), so an unmeasured kernel can never
# sit on the bench path.
#
# MEASURED NEGATIVE RESULT (2026-08-18, v5e, docs/DESIGN.md 9c): the gate
# stays OFF. Standalone, 11 of 24 production call-site shapes beat their
# XLA reference 1.2-2.6x with bf16-rounding parity — but the model-level
# ablation (tools/measure_fused.py --only groups, back-to-back in one
# process) showed EVERY kernel group slows the full 27.9 ms inference step
# (tt +1.12, bd +1.78, fpn +1.20, rpn +0.33 ms): inside the full program
# XLA overlaps/fuses these subgraphs with their neighbours, and each
# pallas_call boundary (layout pinning, lost fusion, extra HBM hops at the
# seams) costs more than the kernel saves. The kernels, the per-shape
# winners table, and the trace/sweep/ablate tooling stay — re-run the
# ablation before flipping this on a newer toolchain.
ENABLE_ON_TPU = False

# Measured per-shape hardware winners (tools/measure_fused.py --only sweep:
# trace the production models' fused call sites, replay each standalone on
# the chip vs its XLA reference). A shape enters this table only when the
# fused kernel was BOTH parity-clean (bf16 rounding) and faster than stock
# XLA; every other shape — including any unmeasured one — falls back to
# the stock path. Keys: (kind, H, W, Cin, Cout, variant) with variant =
# two_blocks (tt) / pool_residual (bd) / emit_cur (fpn) / False; value =
# the measured-fastest row tile (the sweep also tries ht=8 where the
# picker's tile loses or crashes the Mosaic compiler).
#
# Sweep of 2026-08-18 (v5e, bs8 512x672 bf16, both dla34 and resnet34
# traced; 24 call-site shapes): wide planes win 1.2-2.6x STANDALONE (the
# conv chain stays in VMEM); small planes (<= 64x84 at C >= 128) lose to
# stock XLA (grid overhead + halo re-reads dominate) and stay off. bd at
# wide shapes crashed the axon Mosaic compiler at the picker's ht=16
# (retried at ht=8). NOTE: none of these survived the model-level ablation
# (see ENABLE_ON_TPU above) — the table documents the standalone winners
# for a future toolchain, it is not currently live.
HW_WINNERS: dict = {
    ("bb", 128, 168, 64, 64, False): 16,    # 1.21x (resnet34 layer1)
    ("bb", 32, 42, 256, 256, False): 32,    # 1.97x (resnet34 layer3)
    ("tt", 128, 168, 64, 64, False): 16,    # 2.01x (dla34 level2 tail)
    ("tt", 64, 84, 128, 128, False): 32,    # 2.64x (dla34 level3 tree1 tail)
    ("tt", 64, 84, 128, 128, True): 32,     # >>1x (dla34 level3 tree2 tail)
    ("tt", 32, 42, 256, 256, False): 32,    # 1.58x (dla34 level4 tree1 tail)
    ("bd", 16, 21, 256, 512, True): 16,     # 1.1-2.4x (dla34 level5 head)
    ("bd", 16, 21, 256, 512, False): 16,    # 1.36x (resnet34 layer4 head)
    ("fpn", 32, 42, 256, 256, True): 16,    # 1.38x (fpn p4)
    ("rpn", 128, 168, 256, 15, False): 8,   # 1.96x (rpn p2)
    ("rpn", 8, 11, 256, 15, False): 8,      # 1.55x (rpn p6)
}

# Trace/measure bypass (tools/measure_fused.py): make fuse_tile ignore the
# winners table so every eligible call site is recorded/measured.
IGNORE_HW_TABLE = False


def fused_conv_available() -> bool:
    return FORCE_INTERPRET or (ENABLE_ON_TPU and jax.default_backend() == "tpu")


def kernel_interpret() -> bool:
    return FORCE_INTERPRET and jax.default_backend() != "tpu"


def fuse_tile(kind: str, h: int, w: int, cin: int, cout: int,
              variant: bool = False) -> int | None:
    """Row tile for fused kernel ``kind`` at a call-site shape, or None when
    the shape is unfusable or (on real hardware) not a measured winner.

    kind: "bb" (fused_basic_block), "tt" (fused_tree_tail, variant =
    two_blocks), "bd" (fused_block_down, h/w are OUTPUT dims, variant =
    pool_residual), "rpn" (fused_conv_relu_head), "fpn" (fused_fpn_level,
    variant = emit_cur). The CPU interpreter suite (FORCE_INTERPRET) skips
    the winners filter so every path stays equivalence-tested.
    """
    if kind == "bd":
        ht = pick_row_tile_down(h, w, cin, cout)
    elif kind == "fpn":
        ht = pick_fpn_tile(h, w)
    else:  # "bb", "tt", "rpn"
        ht = pick_row_tile(h, w, cin, two_blocks=(kind == "tt" and bool(variant)))
    if ht is None:
        return None
    if FORCE_INTERPRET or IGNORE_HW_TABLE:
        return ht
    return HW_WINNERS.get((kind, h, w, cin, cout, bool(variant)))


def pick_row_tile(h: int, w: int, c: int, two_blocks: bool = False) -> int | None:
    """Largest row-tile in {32, 16, 8} dividing H that keeps the working set
    well under VMEM; None when the shape is not fusable."""
    halo = 4 if two_blocks else 2
    for ht in (32, 16, 8):
        if h % ht or ht % halo:
            continue
        n = ht + 2 * halo
        wp = _align(max(w, 1), 16)
        # ~9 live (n, Wp, C)-class bf16 buffers (shifts, t, x1, x2, f32 acc ~2x)
        if n * wp * max(c, 128) * 2 * 9 < 12 * 1024 * 1024:
            return ht
    return None


def _align(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _halo_specs(H: int, W: int, C: int, Ht: int, halo: int):
    """Three pipelined BlockSpecs over the same (B, H, W, C) array: the
    top halo rows [r0-halo, r0), the main tile [r0, r0+Ht), and the bottom
    halo [r0+Ht, r0+Ht+halo). Halo block indices clamp at the image edges
    (those rows are out-of-image and masked in-kernel). Requires
    H % halo == 0 and Ht % halo == 0."""
    assert H % halo == 0 and Ht % halo == 0, (H, Ht, halo)
    hb = Ht // halo  # halo-block units per tile
    nb = H // halo - 1  # max halo-block index
    return [
        pl.BlockSpec((1, halo, W, C), lambda b, i: (b, jnp.maximum(i * hb - 1, 0), 0, 0)),
        pl.BlockSpec((1, Ht, W, C), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, halo, W, C), lambda b, i: (b, jnp.minimum((i + 1) * hb, nb), 0, 0)),
    ]


def _assemble_tile(top_ref, main_ref, bot_ref, r0, halo, H, W, Wp):
    """Concat halo+main+halo rows, zero-pad width to Wp, and zero
    out-of-image rows (full-rank mask — see module docstring)."""
    xv = jnp.concatenate([top_ref[0], main_ref[0], bot_ref[0]], axis=0)
    n, _, c = xv.shape
    if Wp > W:
        xv = jnp.concatenate([xv, jnp.zeros((n, Wp - W, c), xv.dtype)], axis=1)
    row = r0 - halo + jax.lax.broadcasted_iota(jnp.int32, (n, Wp, c), 0)
    return jnp.where((row >= 0) & (row < H), xv, 0)


def _pad_width(v, Wp):
    """Zero-pad the column (sublane) dim of a (n, W, C) value to Wp."""
    n, w, c = v.shape
    if Wp == w:
        return v
    return jnp.concatenate([v, jnp.zeros((n, Wp - w, c), v.dtype)], axis=1)


def _conv3x3_flat(shift_flats, wflat, row_off, n_out, wp, c):
    """Accumulate the 9 taps of a 3x3 conv on flattened shifted buffers.

    shift_flats = (x[:, w-1], x, x[:, w+1]) each flattened to (n*wp, C);
    returns f32 (n_out*wp, Cout) for output buffer rows
    [row_off, row_off+n_out).
    """
    cout = wflat.shape[-1]
    acc = jnp.zeros((n_out * wp, cout), jnp.float32)
    for dy in range(3):
        lo = (row_off - 1 + dy) * wp
        for dx in range(3):
            s = shift_flats[dx][lo : lo + n_out * wp]
            acc = acc + jnp.dot(
                s,
                wflat[(dy * 3 + dx) * c : (dy * 3 + dx + 1) * c],
                preferred_element_type=jnp.float32,
            )
    return acc


def _shifts(x3d):
    """(x[:, w-1], x, x[:, w+1]) with zero edge columns (= image zero pad),
    flattened to (n*wp, C)."""
    n, wp, c = x3d.shape
    zcol = jnp.zeros((n, 1, c), x3d.dtype)
    sp1 = jnp.concatenate([zcol, x3d[:, : wp - 1]], axis=1)
    sm1 = jnp.concatenate([x3d[:, 1:], zcol], axis=1)
    m = n * wp
    return (sp1.reshape(m, c), x3d.reshape(m, c), sm1.reshape(m, c))


def _mask3d(v3, row0, H, W):
    """Zero rows outside [0, H) (image rows counted from ``row0`` at buffer
    row 0) and cols >= W. Full-rank 3D iota masks — a bool mask RESHAPED to
    (m, 1) and broadcast over (m, C) crashes this Mosaic toolchain, while
    masks born at the value's own rank lower fine (hardware bisect)."""
    n, wp, c = v3.shape
    row = row0 + jax.lax.broadcasted_iota(jnp.int32, (n, wp, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, wp, c), 1)
    return jnp.where((row >= 0) & (row < H) & (col < W), v3, 0)


def _basic_block_tile(x3d, w1, b1, w2, b2, r0_img, H, W, Wp, dtype):
    """BasicBlock on a halo'd (n, Wp, C) buffer whose row 0 is image row
    ``r0_img``; returns the (n-4, Wp, C) output for buffer rows [2, n-2),
    zeroed outside the image extent (so it can feed another conv)."""
    n, wp, c = x3d.shape
    acc1 = _conv3x3_flat(_shifts(x3d), w1, 1, n - 2, wp, c)
    t = jax.nn.relu(acc1 + b1.astype(jnp.float32)).reshape(n - 2, wp, c)
    t = _mask3d(t, r0_img + 1, H, W).astype(dtype)
    acc2 = _conv3x3_flat(_shifts(t), w2, 1, n - 4, wp, c)
    y = acc2 + b2.astype(jnp.float32)
    y = y + x3d[2 : n - 2].reshape((n - 4) * wp, c).astype(jnp.float32)
    y = jax.nn.relu(y).reshape(n - 4, wp, c)
    return _mask3d(y, r0_img + 2, H, W).astype(dtype)


def _bb_kernel(xt_ref, xm_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               *, H, W, Wp, Ht, dtype):
    i = pl.program_id(1)
    r0 = i * Ht
    x = _assemble_tile(xt_ref, xm_ref, xb_ref, r0, 2, H, W, Wp)
    y = _basic_block_tile(x, w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
                          r0 - 2, H, W, Wp, dtype)
    o_ref[:] = y[:, :W]


@functools.partial(jax.jit, static_argnames=("interpret", "ht"))
def fused_basic_block(x, w1, b1, w2, b2, *, interpret: bool = False, ht: int = 32):
    """relu(conv3x3(relu(conv3x3(x, w1)+b1), w2)+b2 + x) in one kernel.

    x (B, H, W, C); w* are BN-folded (3, 3, C, C); H % ht == 0.
    """
    B, H, W, C = x.shape
    assert w1.shape[-1] == C and H % min(ht, H) == 0
    Ht = min(ht, H)
    nt = H // Ht
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Wp = _align(W, sub)
    kernel = functools.partial(_bb_kernel, H=H, W=W, Wp=Wp, Ht=Ht, dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=_halo_specs(H, W, C, Ht, 2) + [_vmem_spec()] * 4,
        out_specs=pl.BlockSpec((None, Ht, W, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(x, x, x, w1.reshape(9 * C, C).astype(x.dtype), b1,
      w2.reshape(9 * C, C).astype(x.dtype), b2)


def _make_tail_kernel(H, W, Wp, Ht, halo, two_blocks, n_children,
                      include_input_child, root_residual, dtype):
    def kernel(*refs):
        idx = 0
        xt_ref, xm_ref, xb_ref = refs[idx : idx + 3]; idx += 3
        child_refs = refs[idx : idx + n_children]; idx += n_children
        if two_blocks:
            w1a, b1a, w2a, b2a = refs[idx : idx + 4]; idx += 4
        w1, b1, w2, b2 = refs[idx : idx + 4]; idx += 4
        n_wr = 2 + n_children + (1 if include_input_child else 0)
        wr_refs = refs[idx : idx + n_wr]; idx += n_wr
        br_ref = refs[idx]; idx += 1
        o_ref = refs[idx]; idx += 1

        i = pl.program_id(1)
        r0 = i * Ht
        c = xm_ref.shape[-1]

        a = _assemble_tile(xt_ref, xm_ref, xb_ref, r0, halo, H, W, Wp)
        if two_blocks:
            x1 = _basic_block_tile(a, w1a[:], b1a[:], w2a[:], b2a[:],
                                   r0 - halo, H, W, Wp, dtype)
        else:
            x1 = a
        # x1 row 0 is image row r0-2 in both modes (two_blocks: the first BB
        # shrinks the halo-4 buffer by 2; one_block: x1 = a with halo 2)
        x2 = _basic_block_tile(x1, w1[:], b1[:], w2[:], b2[:],
                               r0 - 2, H, W, Wp, dtype)
        x2f = x2.reshape(Ht * Wp, c)
        x1f = x1[2 : 2 + Ht].reshape(Ht * Wp, c)
        acc = jnp.dot(x2f, wr_refs[0][:], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(x1f, wr_refs[1][:], preferred_element_type=jnp.float32)
        k = 2
        for j in range(n_children):
            ch = child_refs[j][0]  # (Ht, W, Ck)
            ck = ch.shape[-1]
            chp = _pad_width(ch, Wp)
            acc = acc + jnp.dot(
                chp.reshape(Ht * Wp, ck), wr_refs[k][:],
                preferred_element_type=jnp.float32,
            )
            k += 1
        if include_input_child:
            af = a[halo : halo + Ht].reshape(Ht * Wp, c)
            acc = acc + jnp.dot(af, wr_refs[k][:], preferred_element_type=jnp.float32)
        acc = acc + br_ref[:].astype(jnp.float32)
        if root_residual:
            acc = acc + x2f.astype(jnp.float32)
        out = jax.nn.relu(acc).reshape(Ht, Wp, -1)
        o_ref[:] = out[:, :W].astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("two_blocks", "include_input_child", "root_residual",
                     "interpret", "ht"),
)
def fused_tree_tail(
    x, children, bb_a, bb_b, wr, br, *,
    two_blocks: bool = False, include_input_child: bool = False,
    root_residual: bool = False, interpret: bool = False, ht: int = 32,
):
    """DLA Tree(levels==1) tail in one kernel.

    one_block:  x1 = x;        x2 = BB_b(x1)
    two_blocks: x1 = BB_a(x);  x2 = BB_b(x1)
    out = relu(concat([x2, x1, *children] + ([x] if include_input_child))
               @ wr + br [+ x2 if root_residual])

    children are (B, H, W, Ck) tensors consumed only by the root; wr is the
    root's folded (sum Ck_total, Cout) 1x1 kernel in that concat order.
    """
    B, H, W, C = x.shape
    halo = 4 if two_blocks else 2
    Ht = min(ht, H)
    assert H % Ht == 0 and Ht % halo == 0
    nt = H // Ht
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Wp = _align(W, sub)
    cout = wr.shape[-1]

    def flat(w):
        return w.reshape(9 * C, C).astype(x.dtype)

    args = [x, x, x]
    in_specs = list(_halo_specs(H, W, C, Ht, halo))
    for ch in children:
        args.append(ch)
        in_specs.append(
            pl.BlockSpec((1, Ht, W, ch.shape[-1]), lambda b, i: (b, i, 0, 0))
        )
    if two_blocks:
        w1a, b1a, w2a, b2a = bb_a
        args += [flat(w1a), b1a, flat(w2a), b2a]
        in_specs += [_vmem_spec()] * 4
    w1, b1, w2, b2 = bb_b
    args += [flat(w1), b1, flat(w2), b2]
    in_specs += [_vmem_spec()] * 4
    sizes = [C, C] + [ch.shape[-1] for ch in children]
    if include_input_child:
        sizes.append(C)
    off = 0
    for s in sizes:
        args.append(wr[off : off + s].astype(x.dtype))
        in_specs.append(_vmem_spec())
        off += s
    assert off == wr.shape[0], (off, wr.shape)
    args.append(br)
    in_specs.append(_vmem_spec())

    kernel = _make_tail_kernel(
        H, W, Wp, Ht, halo, two_blocks, len(children),
        include_input_child, root_residual, x.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, Ht, W, cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), x.dtype),
        interpret=interpret,
    )(*args)


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _bd_kernel(xt_ref, xm_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
               has_proj, pool_residual, H_out, W_out, W_in, Wb, Ht, dtype):
    if has_proj:
        wp_ref, bp_ref = rest[0], rest[1]
        rest = rest[2:]
    (o_ref,) = rest
    i = pl.program_id(1)
    r0 = i * Ht
    cin = xm_ref.shape[-1]
    c = o_ref.shape[-1]
    n_x = 2 * Ht + 8  # input rows [2*r0-4, 2*r1+4)
    wh = Wb // 2
    n_p = Ht + 4

    x = _assemble_tile(xt_ref, xm_ref, xb_ref, 2 * r0, 4, 2 * H_out, W_in, Wb)

    # parity planes P[py][px][k, w] = x[2k+py, 2w+px] — via layout-free
    # reshapes + static unit slices (strided slicing lowers to an
    # unsupported gather on this toolchain)
    xr = x.reshape(n_x // 2, 2, Wb, cin)
    P = [[None, None], [None, None]]
    for py in range(2):
        half = xr[:, py].reshape(n_p, wh, 2, cin)
        for px in range(2):
            P[py][px] = half[:, :, px]
    zcol = jnp.zeros((n_p, 1, cin), x.dtype)
    Pm = [jnp.concatenate([zcol, P[py][1][:, : wh - 1]], axis=1) for py in range(2)]

    def flat(a):
        return a.reshape(a.shape[0] * wh, cin)

    # conv1 (stride 2): t row h (image) <- x rows 2h+dy-1; with buffer row 0 at
    # image row 2r0-4, tap dy maps to (py, k0): dy=0 -> (1, 0); 1 -> (0, 1);
    # 2 -> (1, 1). Columns: dx=0 -> P[.][1] shifted right; 1 -> P[.][0];
    # 2 -> P[.][1].
    n_t = Ht + 2  # t rows [r0-1, r1+1)
    acc = jnp.zeros((n_t * wh, c), jnp.float32)
    for dy, (py, k0) in enumerate([(1, 0), (0, 1), (1, 1)]):
        cols = (Pm[py], P[py][0], P[py][1])
        for dx in range(3):
            s = flat(cols[dx])[k0 * wh : (k0 + n_t) * wh]
            acc = acc + jnp.dot(
                s,
                w1_ref[(dy * 3 + dx) * cin : (dy * 3 + dx + 1) * cin],
                preferred_element_type=jnp.float32,
            )
    t = jax.nn.relu(acc + b1_ref[:].astype(jnp.float32)).reshape(n_t, wh, c)
    t = _mask3d(t, r0 - 1, H_out, W_out).astype(dtype)

    acc2 = _conv3x3_flat(_shifts(t), w2_ref[:], 1, Ht, wh, c)

    # residual: out rows [r0, r1) = plane rows [2, Ht+2)
    if pool_residual:
        pool = jnp.maximum(
            jnp.maximum(P[0][0][2 : Ht + 2], P[0][1][2 : Ht + 2]),
            jnp.maximum(P[1][0][2 : Ht + 2], P[1][1][2 : Ht + 2]),
        ).reshape(Ht * wh, cin)
    else:
        pool = P[0][0][2 : Ht + 2].reshape(Ht * wh, cin)
    if has_proj:
        resid = jnp.dot(pool, wp_ref[:], preferred_element_type=jnp.float32)
        resid = resid + bp_ref[:].astype(jnp.float32)
    else:
        resid = pool.astype(jnp.float32)
    y = jax.nn.relu(acc2 + b2_ref[:].astype(jnp.float32) + resid)
    o_ref[:] = y.reshape(Ht, wh, c)[:, :W_out].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("pool_residual", "interpret", "ht")
)
def fused_block_down(x, w1, b1, w2, b2, wproj=None, bproj=None, *,
                     pool_residual: bool = True, interpret: bool = False,
                     ht: int = 16):
    """Stride-2 BasicBlock head in one kernel.

    t   = relu(conv3x3_s2(x, w1) + b1)
    y   = relu(conv3x3(t, w2) + b2 + residual)
    residual = proj(maxpool2x2_s2(x)) when pool_residual (DLA Tree head,
    reference dla.py Tree bottom/project), else proj(x[::2, ::2]) (ResNet
    downsample 1x1-s2 conv); proj is identity when wproj is None.

    x (B, 2H, 2W, Cin) -> (B, H, W, Cout); requires even input dims.
    """
    B, H2, W2, Cin = x.shape
    assert H2 % 2 == 0 and W2 % 2 == 0
    H_out, W_out = H2 // 2, W2 // 2
    C = w1.shape[-1]
    Ht = min(ht, H_out)
    assert H_out % Ht == 0 and (2 * Ht) % 4 == 0
    nt = H_out // Ht
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Wb = _align(W2, 2 * sub)
    has_proj = wproj is not None
    kernel = functools.partial(
        _bd_kernel, has_proj=has_proj, pool_residual=pool_residual,
        H_out=H_out, W_out=W_out, W_in=W2, Wb=Wb, Ht=Ht, dtype=x.dtype,
    )
    args = [x, x, x, w1.reshape(9 * Cin, C).astype(x.dtype), b1,
            w2.reshape(9 * C, C).astype(x.dtype), b2]
    in_specs = _halo_specs(H2, W2, Cin, 2 * Ht, 4) + [_vmem_spec()] * 4
    if has_proj:
        args += [wproj.reshape(Cin, C).astype(x.dtype), bproj]
        in_specs += [_vmem_spec()] * 2
    return pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, Ht, W_out, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out, C), x.dtype),
        interpret=interpret,
    )(*args)


def _crh_kernel(xt_ref, xm_ref, xb_ref, wc_ref, bc_ref, wh_ref, bh_ref, o_ref,
                *, H, W, Wp, Ht, dtype):
    i = pl.program_id(1)
    r0 = i * Ht
    c = xm_ref.shape[-1]
    x = _assemble_tile(xt_ref, xm_ref, xb_ref, r0, 1, H, W, Wp)
    acc = _conv3x3_flat(_shifts(x), wc_ref[:], 1, Ht, Wp, c)
    t = jax.nn.relu(acc + bc_ref[:].astype(jnp.float32)).astype(dtype)
    out = jnp.dot(t, wh_ref[:], preferred_element_type=jnp.float32)
    out = out + bh_ref[:].astype(jnp.float32)
    o_ref[:] = out.reshape(Ht, Wp, -1)[:, :W].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "ht"))
def fused_conv_relu_head(x, wc, bc, wh, bh, *, interpret: bool = False, ht: int = 32):
    """relu(conv3x3(x, wc)+bc) @ wh + bh in one kernel (RPN head shape:
    the 3x3 conv's activation never round-trips HBM; the 1x1 predictor
    heads are packed into wh's output columns)."""
    B, H, W, C = x.shape
    Ht = min(ht, H)
    assert H % Ht == 0
    nt = H // Ht
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Wp = _align(W, sub)
    n_out = wh.shape[-1]
    kernel = functools.partial(_crh_kernel, H=H, W=W, Wp=Wp, Ht=Ht, dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=_halo_specs(H, W, C, Ht, 1) + [_vmem_spec()] * 4,
        out_specs=pl.BlockSpec((None, Ht, W, n_out), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, n_out), x.dtype),
        interpret=interpret,
    )(x, x, x, wc.reshape(9 * C, wc.shape[-1]).astype(x.dtype), bc,
      wh.astype(x.dtype), bh)


def conv_relu_head_reference(x, wc, bc, wh, bh):
    t = jax.nn.relu(_conv_ref(x, wc) + bc.astype(x.dtype))
    return jnp.einsum("bhwc,cd->bhwd", t, wh.astype(x.dtype)) + bh.astype(x.dtype)


def pick_fpn_tile(h: int, w: int) -> int | None:
    """Row tile for the fused FPN level; None when the level is ineligible
    (odd dims or too small for the half-res carry window)."""
    if h % 2 or w % 2:
        return None
    for ht in (16, 8):
        if h % ht == 0 and ht % 2 == 0 and h // 2 >= ht // 2 + 2:
            return ht
    return None


def pick_row_tile_down(h_out: int, w_out: int, cin: int, cout: int) -> int | None:
    """Row tile for fused_block_down (input tile is 4x the output tile)."""
    for ht in (16, 8):
        if h_out % ht:
            continue
        wp = _align(max(2 * w_out, 1), 32)
        xbytes = (2 * ht + 8) * wp * max(cin, 128) * 2
        tbytes = (ht + 4) * (wp // 2) * max(cout, 128) * 2
        if xbytes * 3 + tbytes * 6 < 12 * 1024 * 1024:
            return ht
    return None


def _fpn_kernel(ft_ref, fm_ref, fb_ref, pt_ref, pm_ref, pb_ref,
                wl_ref, bl_ref, wo_ref, bo_ref,
                *rest, emit_cur, H, W, Wp, Ht, Cl, dtype):
    if emit_cur:
        o_ref, cur_ref = rest
    else:
        (o_ref,) = rest
    i = pl.program_id(1)
    r0 = i * Ht
    n = Ht + 2  # cur rows [r0-1, r1+1)
    wh = Wp // 2

    fx = _assemble_tile(ft_ref, fm_ref, fb_ref, r0, 1, H, W, Wp)

    # prev (half-res) rows [r0//2 - 1, r0//2 + Ht//2 + 1) — halo blocks with
    # clamped index maps, so the upsampled buffer's row offset is STATIC
    # (in-kernel dynamic_slice does not lower on this toolchain; clamped
    # halo rows land only on out-of-image cur rows, which are masked)
    pv = jnp.concatenate([pt_ref[0], pm_ref[0], pb_ref[0]], axis=0)
    pv = _pad_width(pv, wh)
    up = jnp.repeat(jnp.repeat(pv, 2, axis=1), 2, axis=0)  # rows [r0-2, r1+2)
    up_n = up[1 : 1 + n]  # rows [r0-1, r1+1)

    lat = jnp.dot(
        fx.reshape(n * Wp, Cl), wl_ref[:], preferred_element_type=jnp.float32
    ) + bl_ref[:].astype(jnp.float32)

    c256 = up.shape[-1]
    cur = lat.reshape(n, Wp, c256) + up_n.astype(jnp.float32)
    row = r0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (n, Wp, c256), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, Wp, c256), 1)
    cur = jnp.where((row >= 0) & (row < H) & (col < W), cur, 0.0).astype(dtype)

    acc = _conv3x3_flat(_shifts(cur), wo_ref[:], 1, Ht, Wp, c256)
    out = acc + bo_ref[:].astype(jnp.float32)
    o_ref[:] = out.reshape(Ht, Wp, -1)[:, :W].astype(o_ref.dtype)
    if emit_cur:
        cur_ref[:] = cur[1 : 1 + Ht, :W]


@functools.partial(jax.jit, static_argnames=("emit_cur", "interpret", "ht"))
def fused_fpn_level(f, prev, wlat, blat, wout, bout, *, emit_cur: bool = True,
                    interpret: bool = False, ht: int = 16):
    """One FPN level in one kernel: cur = lateral_1x1(f) + nearest_up(prev);
    out = conv3x3(cur). Returns (out, cur) when emit_cur (cur feeds the next
    top-down level) else out. prev is the half-resolution carry (B, H/2,
    W/2, C256); requires even H, W."""
    B, H, W, Cl = f.shape
    assert H % 2 == 0 and W % 2 == 0
    C = wlat.shape[-1]
    Ht = min(ht, H)
    assert H % Ht == 0 and Ht % 2 == 0
    nt = H // Ht
    sub = 16 if f.dtype == jnp.bfloat16 else 8
    Wp = _align(W, 2 * sub)
    kernel = functools.partial(
        _fpn_kernel, emit_cur=emit_cur, H=H, W=W, Wp=Wp, Ht=Ht, Cl=Cl,
        dtype=f.dtype,
    )
    out_shape = [jax.ShapeDtypeStruct((B, H, W, C), f.dtype)]
    out_specs = [pl.BlockSpec((None, Ht, W, C), lambda b, i: (b, i, 0, 0))]
    if emit_cur:
        out_shape.append(jax.ShapeDtypeStruct((B, H, W, C), f.dtype))
        out_specs.append(pl.BlockSpec((None, Ht, W, C), lambda b, i: (b, i, 0, 0)))
    res = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=(
            _halo_specs(H, W, Cl, Ht, 1)
            + _halo_specs(H // 2, W // 2, C, Ht // 2, 1)
            + [_vmem_spec()] * 4
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(f, f, f, prev, prev, prev,
      wlat.reshape(Cl, C).astype(f.dtype), blat,
      wout.reshape(9 * C, C).astype(f.dtype), bout)
    return tuple(res) if emit_cur else res[0]


def fpn_level_reference(f, prev, wlat, blat, wout, bout):
    lat = jnp.einsum("bhwc,cd->bhwd", f, wlat.reshape(f.shape[-1], -1).astype(f.dtype))
    lat = lat + blat.astype(f.dtype)
    up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
    cur = lat + up
    out = jax.lax.conv_general_dilated(
        cur, wout.astype(f.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bout.astype(f.dtype)
    return out, cur


# ---------------- XLA references (tests / CPU fallback semantics) ---------


def _conv_ref(inp, w):
    return jax.lax.conv_general_dilated(
        inp, w.astype(inp.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def basic_block_reference(x, w1, b1, w2, b2):
    t = jax.nn.relu(_conv_ref(x, w1) + b1.astype(x.dtype))
    return jax.nn.relu(_conv_ref(t, w2) + b2.astype(x.dtype) + x)


def block_down_reference(x, w1, b1, w2, b2, wproj=None, bproj=None, *,
                         pool_residual=True):
    t = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, w1.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b1.astype(x.dtype)
    )
    y = _conv_ref(t, w2) + b2.astype(x.dtype)
    if pool_residual:
        resid = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ).astype(x.dtype)
    else:
        resid = x[:, ::2, ::2]
    if wproj is not None:
        resid = (
            jnp.einsum("bhwc,cd->bhwd", resid, wproj.reshape(x.shape[-1], -1).astype(x.dtype))
            + bproj.astype(x.dtype)
        )
    return jax.nn.relu(y + resid)


def tree_tail_reference(x, children, bb_a, bb_b, wr, br, *, two_blocks=False,
                        include_input_child=False, root_residual=False):
    x1 = basic_block_reference(x, *bb_a) if two_blocks else x
    x2 = basic_block_reference(x1, *bb_b)
    cat = [x2, x1] + list(children) + ([x] if include_input_child else [])
    cat = jnp.concatenate(cat, axis=-1)
    y = jnp.einsum("bhwc,cd->bhwd", cat, wr.astype(x.dtype)) + br.astype(x.dtype)
    if root_residual:
        y = y + x2
    return jax.nn.relu(y)
