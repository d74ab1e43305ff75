"""Row-packed (space-to-depth) execution of the first VGG block
(conv3x3 → relu → conv3x3 → relu → maxpool2) — exact math, TPU-friendly
shapes.

At 1024²/B=1 the first block runs at C=64 — half the 128-wide vector lanes —
and XLA's conv tiling materialises halo-blocked `[1024, 8, 129, 64]` internal
buffers with layout copies on every producer/consumer edge.  Profiled on
v5e-1, block 1 (two convs + pool + their backwards + relu/copy churn) costs
~19 ms of a 40 ms style step (reference hot loop: optim.py:201-241).

The fix: pack pairs of *rows* into channels, (H, W, C) -> (H/2, W, 2C), and
run the whole block packed:

- a 3x3/pad-1 conv becomes ONE 3x3 conv on the packed image with a
  rearranged (3, 3, 2·cin, 2·cout) kernel: output row 2i+dy reads original
  rows 2i+dy-1 .. 2i+dy+1, which live in packed block rows i-1 .. i+1, so
  tap (u, v) lands at block offset I, intra-block p with u = 2(I-1)+p-dy+1
  (slots falling outside the 3x3 kernel stay zero — 2x nominal FLOPs, half
  structurally zero, but the MXU runs full-lane at C=128 and none of the
  half-lane layout churn survives).
- relu is elementwise: packed relu == packed(relu).
- the 2x2/stride-2 max pool reduces over (row phase, column pair), and its
  output is automatically back in plain NHWC at half resolution.  Block 2
  onward is untouched.

Row packing (not 2x2 pixel packing) is deliberate: a single same-padded conv
needs the *union* of block windows across phases, so 2D packing pays 4x
nominal FLOPs and per-phase shifted views; 1D packing pays 2x with one
aligned conv.  Measured on v5e-1 the 2D/4-view variant was net slower than
the unpacked baseline; this one is ~25% faster end-to-end.

Packed activations are exposed to the losses as (B, H/2, W, 2, C): MSE is
permutation-invariant so content losses match exactly; the Gram contracts
over (pixels, phases) — see ops/gram.py which accepts any (B, ..., C).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# A/B kill-switch for the matmul-backward conv1_1 (perf tooling only)
_SMALLCIN_VJP = os.environ.get("MAUA_SMALLCIN_VJP", "1") == "1"
# A/B switch: fixup-form blocked conv (no halo copy) vs halo-concat form
_HALO_FIXUP = os.environ.get("MAUA_HALO_FIXUP", "0") == "1"
# A/B switch: explicit H-blocking of the big packed convs (needed when the
# program contains ops XLA's space-to-batch pass can't propagate gradients
# through, e.g. L-BFGS history dots; plain conv otherwise — the blocked
# form's producer/consumer layout conversions cost ~2-3 ms/iter at 1024²,
# see PERF.md round-5 HLO copy audit)
_BLOCK_STEM = os.environ.get("MAUA_BLOCK_STEM", "1") == "1"
# A/B switch: bf16 col2im intermediate in the smallcin backward (halves the
# 113 MB f32 `t` buffer; one extra bf16 rounding vs the f32 path)
_SMALLCIN_BF16 = os.environ.get("MAUA_SMALLCIN_BF16", "0") == "1"


def pack_rows(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W, 2*C), channel order (row phase, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, h // 2, w, 2 * c)


def unpack_rows(y: jax.Array) -> jax.Array:
    """Inverse of pack_rows: (B, H2, W, 2*C) -> (B, 2*H2, W, C)."""
    b, h2, w, c2 = y.shape
    c = c2 // 2
    y = y.reshape(b, h2, w, 2, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4))
    return y.reshape(b, 2 * h2, w, c)


def _packed_kernel(w: jax.Array) -> jax.Array:
    """HWIO (3, 3, cin, cout) -> row-packed (3, 3, 2*cin, 2*cout).

    K[I, J, (p, a), (dy, c)] = w[2(I-1) + p - dy + 1, J, a, c] where the row
    index is a valid kernel tap, else 0.
    """
    cin, cout = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 2, cin, 2, cout), w.dtype)
    for bi in (0, 1, 2):
        for p in (0, 1):
            for dy in (0, 1):
                u = 2 * (bi - 1) + p - dy + 1
                if 0 <= u <= 2:
                    k = k.at[bi, :, p, :, dy, :].set(w[u])
    return k.reshape(3, 3, 2 * cin, 2 * cout)


def _halo_blocked_conv3x3(xp: jax.Array, kern: jax.Array, bk: int, precision) -> jax.Array:
    """3x3/pad-1 conv as a batch of H-blocks with explicit 1-row halos.

    Hand-rolled space-to-batch: a batch-1 conv at this size depends on XLA's
    space-to-batch pass for MXU utilisation, and that pass silently declines
    when the conv's gradient feeds ops it can't propagate through (measured:
    the L-BFGS history dots left the stem BACKWARD convs on a batch-in-
    sublanes emitter at 1/8 utilisation, ~8 ms/iter excess at 1024²).
    Blocking explicitly makes forward and backward batch-``nb`` convs in
    every program.  Identical math: halo rows supply the cross-block taps,
    zero rows at the ends reproduce pad-1.
    """
    _, h2, w, c = xp.shape
    nb = h2 // bk
    core = xp.reshape(nb, bk, w, c)
    zero = jnp.zeros((1, 1, w, c), xp.dtype)
    top = jnp.concatenate([zero, core[:-1, -1:]], axis=0)  # prev block's last row
    bot = jnp.concatenate([core[1:, :1], zero], axis=0)  # next block's first row
    blocked = jnp.concatenate([top, core, bot], axis=1)  # (nb, bk+2, w, c)
    y = jax.lax.conv_general_dilated(
        blocked, kern, (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    return y.reshape(1, h2, w, y.shape[-1])


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_smallcin(x: jax.Array, kern: jax.Array, precision) -> jax.Array:
    """3x3/pad-1 conv for FEW input channels (the packed conv1_1: cin=6) with
    a hand-written matmul backward.

    XLA's transposed-conv input gradient emits cin output lanes — 6 of 128,
    ~5% MXU utilisation, 0.7 ms/iter of the 1024² style step (PERF.md trace
    anatomy).  Here dx is ONE (HW, cout) x (cout, 9*cin) matmul whose lane
    dim is 9*cin=54, followed by 9 shifted adds (a fused col2im); dw is one
    im2col patches^T @ g matmul.  Forward is the plain conv (cin is the
    CONTRACTED dim there, so it is not lane-starved)."""
    return _conv3x3_plain(x, kern, precision)


def _conv3x3_plain(x, kern, precision):
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


def _smallcin_fwd(x, kern, precision):
    return _conv3x3_plain(x, kern, precision), (x, kern)


def _smallcin_bwd(precision, res, g):
    x, kern = res
    b, h, w, cin = x.shape
    cout = kern.shape[3]
    # dx[p,q,a] = sum_{u,v,o} g[p+1-u, q+1-v, o] * k[u,v,a,o]
    k2 = kern.reshape(9 * cin, cout)
    t_dtype = jnp.bfloat16 if _SMALLCIN_BF16 else jnp.float32
    t = jax.lax.dot_general(
        g, k2, dimension_numbers=(((3,), (1,)), ((), ())),
        precision=precision, preferred_element_type=t_dtype,
    ).reshape(b, h, w, 3, 3, cin)
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    dx = sum(
        tp[:, 2 - u : 2 - u + h, 2 - v : 2 - v + w, u, v, :]
        for u in range(3)
        for v in range(3)
    ).astype(x.dtype)
    # dw[u,v,a,o] = sum_{p,q} x[p+u-1, q+v-1, a] * g[p,q,o]  (im2col^T @ g)
    xp_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [xp_pad[:, u : u + h, v : v + w, :] for u in range(3) for v in range(3)], axis=3
    )  # (B, H, W, 9, cin)
    dk = jax.lax.dot_general(
        patches.reshape(-1, 9 * cin), g.reshape(-1, cout),
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    ).reshape(3, 3, cin, cout).astype(kern.dtype)
    return dx, dk


conv3x3_smallcin.defvjp(_smallcin_fwd, _smallcin_bwd)


def _halo_fixup_conv3x3(xp: jax.Array, kern: jax.Array, bk: int, precision) -> jax.Array:
    """Blocked 3x3/pad-1 conv WITHOUT materialising the (bk+2)-row halo copy.

    The halo-concat variant (_halo_blocked_conv3x3) copies the whole
    activation into a (nb, bk+2, W, C) buffer and its backward un-copies it
    (~0.8 ms/iter of pure copy at 1024², PERF.md trace anatomy).  Here each
    block convolves with its own zero padding and the two missing cross-block
    tap rows are added as 1-row W-conv fixups:

        y[i, 0]    += conv_W(core[i-1, bk-1], kern_row0)
        y[i, bk-1] += conv_W(core[i+1, 0],    kern_row2)

    — two (nb-1, 1, W, C) convs and two row-slice adds instead of a
    full-tensor copy each way.  Identical math (global pad-1 comes from the
    absent fixup at the outermost boundaries)."""
    _, h2, w, c = xp.shape
    nb = h2 // bk
    core = xp.reshape(nb, bk, w, c)
    y = jax.lax.conv_general_dilated(
        core, kern, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    if nb > 1:
        def row_conv(rows, krow):  # rows (nb-1, W, C), krow (1, 3, C, cout)
            return jax.lax.conv_general_dilated(
                rows[:, None], krow, (1, 1), [(0, 0), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
            )[:, 0]

        top_fix = row_conv(core[:-1, -1], kern[0:1])  # into y[i, 0], i >= 1
        bot_fix = row_conv(core[1:, 0], kern[2:3])  # into y[i, bk-1], i < nb-1
        y = y.at[1:, 0].add(top_fix)
        y = y.at[:-1, bk - 1].add(bot_fix)
    return y.reshape(1, h2, w, y.shape[-1])


def packed_conv3x3(
    xp: jax.Array, w: jax.Array, b: jax.Array, precision=jax.lax.Precision.DEFAULT
) -> jax.Array:
    """3x3/stride-1/pad-1 conv in the row-packed domain.

    xp: (B, H2, W, 2*cin) packed input; returns (B, H2, W, 2*cout) packed —
    the packed form of conv(unpack_rows(xp), w, pad=1) + b, identical up to
    float-summation order.

    ``w``/``b`` may arrive pre-packed (models/extractor.prepare_params does
    this once per program so the packing isn't traced into the optimisation
    scan): a packed kernel is recognised by its input-channel count matching
    the packed activation's.
    """
    if w.shape[2] != xp.shape[-1]:
        w = _packed_kernel(w)
    kern = w.astype(xp.dtype)
    h2 = xp.shape[1]
    if kern.shape[2] <= 8 and _SMALLCIN_VJP:
        # packed conv1_1 (cin=6): matmul backward beats both the halo-blocked
        # and XLA's transposed-conv input grad (lane starvation, see
        # conv3x3_smallcin)
        y = conv3x3_smallcin(xp, kern, precision)
    elif xp.shape[0] == 1 and h2 >= 64 and h2 % 8 == 0 and _BLOCK_STEM:
        bk = 16 if h2 % 16 == 0 and h2 >= 128 else 8
        conv = _halo_fixup_conv3x3 if _HALO_FIXUP else _halo_blocked_conv3x3
        y = conv(xp, kern, bk, precision)
    else:
        y = jax.lax.conv_general_dilated(
            xp,
            kern,
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    bb = b.astype(xp.dtype)
    if bb.shape[0] != kern.shape[3]:  # un-tiled bias: (cout,) -> (2*cout,)
        bb = jnp.tile(bb, 2)
    return y + bb


def pool_packed(y: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool of the *unpacked* image == max over (row phase,
    column pair) of the packed one; output is plain NHWC at half res.

    Written as two pairwise ``where`` stages (row phase, then column pair)
    instead of a 6-D reduce: the 6-D max's autodiff materialised two
    window-broadcast buffers (~7 ms/iter at 1024², profiled), and
    ``jnp.maximum``'s tie-splitting JVP (g/2 at equality) adds divides and
    equality pred buffers in the backward (~1.4 ms/iter profiled).  The
    where-form's backward is a single select per stage, and it routes ties
    to the FIRST operand — torch's argmax semantics exactly."""
    b, h2, w, c2 = y.shape
    c = c2 // 2
    a, bb = y[..., :c], y[..., c:]
    ph = jnp.where(a >= bb, a, bb)  # max over row phase
    ph = ph.reshape(b, h2, w // 2, 2, c)
    p0, p1 = ph[:, :, :, 0, :], ph[:, :, :, 1, :]
    return jnp.where(p0 >= p1, p0, p1)  # max over column pair


def as_phased(y: jax.Array) -> jax.Array:
    """Packed (B, H2, W, 2*C) -> loss view (B, H2, W, 2, C)."""
    b, h2, w, c2 = y.shape
    return y.reshape(b, h2, w, 2, c2 // 2)


__all__ = ["pack_rows", "unpack_rows", "packed_conv3x3", "pool_packed", "as_phased"]
