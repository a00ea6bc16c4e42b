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
  (2 per conv in the chain) come from an HBM alias of ``x`` via two small
  DMAs, clamped at the image edges (out-of-image rows are zeroed by a
  validity mask, reproducing conv zero padding);
- each conv3x3 = 2 width-shift copies (explicit zero edge columns) + 9 MXU
  matmuls on row slices of the flattened ``(rows*Wp, C)`` buffer, where
  ``Wp`` pads the width to the sublane tile so every reshape/slice is
  layout-free;
- f32 accumulation, compute-dtype (bf16) storage between convs — exactly
  the XLA ConvBN chain's dtype behaviour, so outputs match the unfused
  path to bf16 rounding.

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
    "fused_conv_available",
    "pick_row_tile",
    "basic_block_reference",
    "tree_tail_reference",
]


# Tests set this to exercise the fused model paths on CPU via the Pallas
# interpreter (the kernels themselves are TPU-only).
FORCE_INTERPRET = False

# Gate for the real-hardware path: numerics are equivalence-tested on CPU
# (tests/test_fused_conv.py), but the compiled kernels have not yet been
# timed on a v5e (axon relay outage at commit time) — flipped on once the
# hardware parity+speedup run lands, so an unmeasured kernel can never sit
# on the bench path.
ENABLE_ON_TPU = False


def fused_conv_available() -> bool:
    return FORCE_INTERPRET or (ENABLE_ON_TPU and jax.default_backend() == "tpu")


def kernel_interpret() -> bool:
    return FORCE_INTERPRET and jax.default_backend() != "tpu"


def pick_row_tile(h: int, w: int, c: int, two_blocks: bool = False) -> int | None:
    """Largest row-tile in {32, 16, 8} dividing H that keeps the working set
    well under VMEM; None when the shape is not fusable."""
    for ht in (32, 16, 8):
        if h % ht:
            continue
        n = ht + (8 if two_blocks else 4)
        wp = _align(max(w, 1), 16)
        # ~9 live (n, Wp, C)-class bf16 buffers (shifts, t, x1, x2, f32 acc ~2x)
        if n * wp * max(c, 128) * 2 * 9 < 12 * 1024 * 1024:
            return ht
    return None


def _align(v: int, m: int) -> int:
    return (v + m - 1) // m * m


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


def _basic_block_tile(x3d, w1, b1, w2, b2, r0_img, H, W, Wp, dtype):
    """BasicBlock on a halo'd (n, Wp, C) buffer whose row 0 is image row
    ``r0_img``; returns the (n-4, Wp, C) output for buffer rows [2, n-2),
    zeroed outside the image extent (so it can feed another conv)."""
    n, wp, c = x3d.shape
    acc1 = _conv3x3_flat(_shifts(x3d), w1, 1, n - 2, wp, c)
    t = jax.nn.relu(acc1 + b1.astype(jnp.float32))
    t_row = r0_img + 1 + jax.lax.broadcasted_iota(jnp.int32, (n - 2, wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n - 2, wp), 1)
    t_keep = (t_row >= 0) & (t_row < H) & (col < W)
    t = jnp.where(t_keep.reshape((n - 2) * wp, 1), t, 0.0).astype(dtype)
    t = t.reshape(n - 2, wp, c)
    acc2 = _conv3x3_flat(_shifts(t), w2, 1, n - 4, wp, c)
    y = acc2 + b2.astype(jnp.float32)
    y = y + x3d[2 : n - 2].reshape((n - 4) * wp, c).astype(jnp.float32)
    y = jax.nn.relu(y)
    y_row = r0_img + 2 + jax.lax.broadcasted_iota(jnp.int32, (n - 4, wp), 0)
    y_keep = (y_row >= 0) & (y_row < H) & (col[: n - 4] < W)
    y = jnp.where(y_keep.reshape((n - 4) * wp, 1), y, 0.0)
    return y.astype(dtype).reshape(n - 4, wp, c)


def _load_halo_tile(x_hbm, xt_ref, xb, sem, b, r0, H, W, Wp, halo):
    """Assemble the halo'd input tile: main rows from the pipelined block,
    halo rows from the HBM alias (clamped; garbage rows masked after)."""
    Ht = xt_ref.shape[1]
    n = Ht + 2 * halo
    top = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.clip(r0 - halo, 0, H - halo), halo), :, :],
        xb.at[pl.ds(0, halo), pl.ds(0, W), :],
        sem.at[0],
    )
    bot = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.clip(r0 + Ht, 0, H - halo), halo), :, :],
        xb.at[pl.ds(Ht + halo, halo), pl.ds(0, W), :],
        sem.at[1],
    )
    top.start()
    bot.start()
    xb[pl.ds(halo, Ht), pl.ds(0, W), :] = xt_ref[0]
    top.wait()
    bot.wait()
    img_row = r0 - halo + jax.lax.broadcasted_iota(jnp.int32, (n, Wp), 0)
    img_col = jax.lax.broadcasted_iota(jnp.int32, (n, Wp), 1)
    keep = (img_row >= 0) & (img_row < H) & (img_col < W)
    return jnp.where(keep[..., None], xb[:], 0)


def _bb_kernel(x_hbm, xt_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, xb, sem,
               *, H, W, Wp, Ht, dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * Ht
    x = _load_halo_tile(x_hbm, xt_ref, xb, sem, b, r0, H, W, Wp, halo=2)
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
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ht, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, Ht, W, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Ht + 4, Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, x, w1.reshape(9 * C, C).astype(x.dtype), b1,
      w2.reshape(9 * C, C).astype(x.dtype), b2)


def _make_tail_kernel(H, W, Wp, Ht, halo, two_blocks, n_children,
                      include_input_child, root_residual, dtype):
    def kernel(*refs):
        idx = 0
        x_hbm = refs[idx]; idx += 1
        xt_ref = refs[idx]; idx += 1
        child_refs = refs[idx : idx + n_children]; idx += n_children
        if two_blocks:
            w1a, b1a, w2a, b2a = refs[idx : idx + 4]; idx += 4
        w1, b1, w2, b2 = refs[idx : idx + 4]; idx += 4
        n_wr = 2 + n_children + (1 if include_input_child else 0)
        wr_refs = refs[idx : idx + n_wr]; idx += n_wr
        br_ref = refs[idx]; idx += 1
        o_ref = refs[idx]; idx += 1
        xb = refs[idx]; idx += 1
        sem = refs[idx]; idx += 1

        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * Ht
        c = xt_ref.shape[-1]

        a = _load_halo_tile(x_hbm, xt_ref, xb, sem, b, r0, H, W, Wp, halo)
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
            chp = jnp.zeros((Ht, Wp, ck), ch.dtype).at[:, :W].set(ch)
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
    assert H % Ht == 0
    nt = H // Ht
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Wp = _align(W, sub)
    cout = wr.shape[-1]

    def flat(w):
        return w.reshape(9 * C, C).astype(x.dtype)

    args = [x, x]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, Ht, W, C), lambda b, i: (b, i, 0, 0)),
    ]
    for ch in children:
        args.append(ch)
        in_specs.append(
            pl.BlockSpec((1, Ht, W, ch.shape[-1]), lambda b, i: (b, i, 0, 0))
        )
    if two_blocks:
        w1a, b1a, w2a, b2a = bb_a
        args += [flat(w1a), b1a, flat(w2a), b2a]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    w1, b1, w2, b2 = bb_b
    args += [flat(w1), b1, flat(w2), b2]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    sizes = [C, C] + [ch.shape[-1] for ch in children]
    if include_input_child:
        sizes.append(C)
    off = 0
    for s in sizes:
        args.append(wr[off : off + s].astype(x.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        off += s
    assert off == wr.shape[0], (off, wr.shape)
    args.append(br)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

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
        scratch_shapes=[
            pltpu.VMEM((Ht + 2 * halo, Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


def _bd_kernel(x_hbm, xt_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest,
               has_proj, pool_residual, H_out, W_out, W_in, Wb, Ht, dtype):
    if has_proj:
        wp_ref, bp_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, xb, sem = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * Ht
    cin = xt_ref.shape[-1]
    c = o_ref.shape[-1]
    n_x = 2 * Ht + 8  # input rows [2*r0-4, 2*r1+4)
    wh = Wb // 2
    n_p = Ht + 4

    # main 2Ht rows ride the pipelined block; 4-row halos off the HBM alias
    top = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.clip(2 * r0 - 4, 0, 2 * H_out - 4), 4), :, :],
        xb.at[pl.ds(0, 4), pl.ds(0, W_in), :],
        sem.at[0],
    )
    bot = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(jnp.clip(2 * r0 + 2 * Ht, 0, 2 * H_out - 4), 4), :, :],
        xb.at[pl.ds(2 * Ht + 4, 4), pl.ds(0, W_in), :],
        sem.at[1],
    )
    top.start()
    bot.start()
    xb[pl.ds(4, 2 * Ht), pl.ds(0, W_in), :] = xt_ref[0]
    top.wait()
    bot.wait()

    img_row = 2 * r0 - 4 + jax.lax.broadcasted_iota(jnp.int32, (n_x, Wb), 0)
    img_col = jax.lax.broadcasted_iota(jnp.int32, (n_x, Wb), 1)
    keep = (img_row >= 0) & (img_row < 2 * H_out) & (img_col < W_in)
    x = jnp.where(keep[..., None], xb[:], 0)

    # parity planes P[py][px][k, w] = x[2k+py, 2w+px]
    P = [[x[py::2, px::2] for px in range(2)] for py in range(2)]
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
    t = jax.nn.relu(acc + b1_ref[:].astype(jnp.float32))
    t_row = r0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (n_t, wh), 0)
    t_col = jax.lax.broadcasted_iota(jnp.int32, (n_t, wh), 1)
    t_keep = (t_row >= 0) & (t_row < H_out) & (t_col < W_out)
    t = jnp.where(t_keep.reshape(n_t * wh, 1), t, 0.0).astype(dtype).reshape(n_t, wh, c)

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
    assert H_out % Ht == 0
    nt = H_out // Ht
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    Wb = _align(W2, 2 * sub)
    has_proj = wproj is not None
    kernel = functools.partial(
        _bd_kernel, has_proj=has_proj, pool_residual=pool_residual,
        H_out=H_out, W_out=W_out, W_in=W2, Wb=Wb, Ht=Ht, dtype=x.dtype,
    )
    args = [x, x, w1.reshape(9 * Cin, C).astype(x.dtype), b1,
            w2.reshape(9 * C, C).astype(x.dtype), b2]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 2 * Ht, W2, Cin), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_proj:
        args += [wproj.reshape(Cin, C).astype(x.dtype), bproj]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    return pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, Ht, W_out, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * Ht + 8, Wb, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


def _crh_kernel(x_hbm, xt_ref, wc_ref, bc_ref, wh_ref, bh_ref, o_ref, xb, sem,
                *, H, W, Wp, Ht, dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * Ht
    c = xt_ref.shape[-1]
    x = _load_halo_tile(x_hbm, xt_ref, xb, sem, b, r0, H, W, Wp, halo=1)
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
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ht, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, Ht, W, n_out), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, n_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Ht + 2, Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, x, wc.reshape(9 * C, wc.shape[-1]).astype(x.dtype), bc,
      wh.astype(x.dtype), bh)


def conv_relu_head_reference(x, wc, bc, wh, bh):
    t = jax.nn.relu(_conv_ref(x, wc) + bc.astype(x.dtype))
    return jnp.einsum("bhwc,cd->bhwd", t, wh.astype(x.dtype)) + bh.astype(x.dtype)


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


def _fpn_kernel(f_hbm, ft_ref, prev_hbm, wl_ref, bl_ref, wo_ref, bo_ref,
                *rest, emit_cur, H, W, Wp, Ht, Cl, dtype):
    if emit_cur:
        o_ref, cur_ref, fb, pb, sem = rest
    else:
        o_ref, fb, pb, sem = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * Ht
    n = Ht + 2  # cur rows [r0-1, r1+1)
    hp = H // 2
    np_rows = Ht // 2 + 2
    wh = Wp // 2

    # f tile: main rows pipelined, 1-row halos via DMA
    fx = _load_halo_tile(f_hbm, ft_ref, fb, sem, b, r0, H, W, Wp, halo=1)

    # prev (half-res) rows [p0, p0+np_rows) with p0 = clip((r0-1)//2, ...)
    p0 = jnp.clip((r0 - 1) // 2, 0, hp - np_rows)
    pdma = pltpu.make_async_copy(
        prev_hbm.at[b, pl.ds(p0, np_rows), :, :],
        pb.at[:, pl.ds(0, W // 2), :],
        sem.at[0],
    )
    pdma.start()

    lat = jnp.dot(
        fx.reshape(n * Wp, Cl), wl_ref[:], preferred_element_type=jnp.float32
    ) + bl_ref[:].astype(jnp.float32)

    pdma.wait()
    pcol = jax.lax.broadcasted_iota(jnp.int32, (np_rows, wh), 1)
    pv = jnp.where((pcol < W // 2)[..., None], pb[:], 0)
    up = jnp.repeat(jnp.repeat(pv, 2, axis=1), 2, axis=0)  # rows [2p0, 2p0+2np)
    # cur row r (image) sits at up row r - 2*p0; the needed range [r0-1,
    # r1+1) can poke 1 row past either end at image edges (those rows are
    # out-of-image and zero-masked below) — pad one zero row per side so the
    # dynamic slice never clamps into misalignment.
    zrow = jnp.zeros((1,) + up.shape[1:], up.dtype)
    up = jnp.concatenate([zrow, up, zrow], axis=0)
    up_n = jax.lax.dynamic_slice(
        up, (r0 - 2 * p0, 0, 0), (n, Wp, up.shape[-1])
    )
    cur = lat.reshape(n, Wp, -1) + up_n.astype(jnp.float32)
    row = r0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (n, Wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, Wp), 1)
    keep = (row >= 0) & (row < H) & (col < W)
    cur = jnp.where(keep[..., None], cur, 0.0).astype(dtype)

    acc = _conv3x3_flat(_shifts(cur), wo_ref[:], 1, Ht, Wp, cur.shape[-1])
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
    # The prev-carry DMA reads Ht//2 + 2 half-res rows starting at
    # clip(..., 0, H//2 - (Ht//2 + 2)); a negative upper clip bound would be
    # an out-of-bounds HBM read, so the tile must leave 2 rows of slack.
    assert H // 2 >= Ht // 2 + 2, (H, Ht)
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
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ht, W, Cl), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Ht + 2, Wp, Cl), f.dtype),
            pltpu.VMEM((Ht // 2 + 2, Wp // 2, C), f.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(f, f, prev,
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
