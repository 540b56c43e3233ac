"""Pallas TPU kernel: one-hot-matmul row gather from per-keypoint tables.

The final stage of the two-level candidate grouping (ops/two_level.py,
replacing the reference's flat knn_cuda gather, get_cat_feat_tgt.py:44-52)
needs Q = C*k = 6912 rows per keypoint gathered from that keypoint's
[T, D] table. A plain XLA gather pays per-row address overhead on 442k
rows (the measured 1.9 ms flat-gather cost is row-count-bound, not
byte-bound). On TPU the idiomatic move is to make the MXU do the
gathering: out = onehot(idx) @ table — a dense matmul with a one-hot
left operand that never exists in HBM.

Kernel shape (per grid step = one [bq] block of one keypoint's queries):

  match[t, q] = (t == idx[q])    [T, bq]  — row-iota vs lane-broadcast
                                             compare, built in VMEM;
  out[q, d]   = sum_t match[t, q] * table[t, d]
              = dot_general(match, table, contract dim 0 x dim 0)

so the indexed row lands in out[q, :] exactly (one-hot matmul in f32 is
exact: one 1.0 term, the rest 0.0 — bit-identical to take_along_axis).

Constraints that shaped it (cf. ops/pallas/fps_kernel.py): no
data-dependent row gathers in Mosaic, so the one-hot compare replaces
indexing; idx rides lane-major as a [1, bq] block (broadcast over
sublanes is free, the [bq, 1] layout would need an in-kernel transpose);
all blocks (8, 128)-aligned; D pads to 128 lanes (D=35 in the model —
the matmul wastes the pad lanes but stays ~0.2 ms of MXU at the full
operating point, vs 1.9 ms of gather overhead).

Grid: (B, K, Q/bq). VMEM per step: table [T, Dpad] 256 KB (T=512) +
match [T, bq] 1 MB + out [bq, Dpad] 256 KB — far under budget; the
table block is revisited Q/bq times and Mosaic keeps it resident across
the inner grid dimension (same index map value).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _onehot_gather_kernel(idx_ref, table_ref, out_ref):
    # idx_ref [1, 1, 1, 8, bq] int32 (lane-major, replicated over the 8
    # sublanes — Mosaic requires the last two block dims divisible by
    # (8, 128), so a [1, bq] index block is not lowerable; the round-5
    # campaign W1 failed on exactly that);
    # table_ref [1, 1, T, Dpad] f32; out_ref [1, 1, bq, Dpad] f32
    T = table_ref.shape[2]
    bq = idx_ref.shape[4]
    idx_row = idx_ref[0, 0, 0, 0:1, :]                     # [1, bq]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, bq), 0)
    match = (iota_t == jnp.broadcast_to(idx_row, (T, bq))).astype(
        jnp.float32)                                       # [T, bq]
    out_ref[0, 0] = jax.lax.dot_general(
        match, table_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: the TPU MXU's default f32 mode runs reduced-precision
        # passes, which rounds the gathered VALUES (bit_exact=False on
        # real hardware, campaign W1). A one-hot matmul only multiplies
        # by 1.0/0.0, so full precision restores exactness.
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [bq, Dpad]


def _ceil_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def onehot_gather(
    table: jax.Array,
    idx: jax.Array,
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """table [B, K, T, D] f32, idx [B, K, Q] int32 in [0, T) ->
    [B, K, Q, D]: out[b, k, q] = table[b, k, idx[b, k, q]].

    Bit-identical to jnp.take_along_axis (exact one-hot f32 matmul)."""
    B, K, T, D = table.shape
    Q = idx.shape[-1]
    interpret = interpret or jax.default_backend() == "cpu"
    Dpad = _ceil_to(D, 128)
    bq = min(block_q, _ceil_to(Q, 128))
    Qpad = _ceil_to(Q, bq)
    Tpad = _ceil_to(T, 8)

    table_p = table
    if (Tpad, Dpad) != (T, D):
        table_p = jnp.zeros((B, K, Tpad, Dpad), table.dtype)
        table_p = table_p.at[:, :, :T, :D].set(table)
    idx_p = idx.astype(jnp.int32)
    if Qpad != Q:
        idx_p = jnp.concatenate(
            [idx_p, jnp.zeros((B, K, Qpad - Q), jnp.int32)], axis=-1)
    # replicate over 8 sublanes for the (8, 128) block-divisibility rule
    idx_p = jnp.broadcast_to(
        idx_p.reshape(B, K, Qpad // bq, 1, bq),
        (B, K, Qpad // bq, 8, bq))

    out = pl.pallas_call(
        _onehot_gather_kernel,
        grid=(B, K, Qpad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8, bq), lambda b, k, q: (b, k, q, 0, 0)),
            pl.BlockSpec((1, 1, Tpad, Dpad), lambda b, k, q: (b, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, Dpad), lambda b, k, q: (b, k, q, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, Qpad, Dpad), jnp.float32),
        interpret=interpret,
    )(idx_p, table_p)
    return out[:, :, :Q, :D]


# --- custom VJP: make the kernel trainable ---------------------------------
# The backward of a row gather is a row scatter-add, which is the SAME
# one-hot matmul transposed: dtable[t, d] = sum_q [idx[q] == t] dout[q, d]
# = match @ dout. Without this, any training forward that routes through
# the kernel (KITTI-scale two-level path under grad) would fail at trace
# time — pallas_call has no automatic transpose rule.


def _onehot_scatter_kernel(idx_ref, dout_ref, dtab_ref):
    # idx_ref [1, 1, 1, 8, bq] (sublane-replicated, see gather kernel);
    # dout_ref [1, 1, bq, Dpad];
    # dtab_ref [1, 1, T, Dpad] — revisited across the q grid dim:
    # initialize on the first step, accumulate after.
    T = dtab_ref.shape[2]
    bq = idx_ref.shape[4]
    q = pl.program_id(2)
    idx_row = idx_ref[0, 0, 0, 0:1, :]                     # [1, bq]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, bq), 0)
    match = (iota_t == jnp.broadcast_to(idx_row, (T, bq))).astype(
        jnp.float32)                                       # [T, bq]
    part = jax.lax.dot_general(
        match, dout_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                      # [T, Dpad]

    @pl.when(q == 0)
    def _init():
        dtab_ref[0, 0] = part

    @pl.when(q > 0)
    def _acc():
        dtab_ref[0, 0] += part


def _scatter_add(dout: jax.Array, idx: jax.Array, T: int,
                 block_q: int, interpret: bool) -> jax.Array:
    """dout [B, K, Q, D], idx [B, K, Q] -> dtable [B, K, T, D]."""
    B, K, Q, D = dout.shape
    interpret = interpret or jax.default_backend() == "cpu"
    Dpad = _ceil_to(D, 128)
    bq = min(block_q, _ceil_to(Q, 128))
    Qpad = _ceil_to(Q, bq)
    Tpad = _ceil_to(T, 8)
    dout_p = dout
    if (Qpad, Dpad) != (Q, D):
        dout_p = jnp.zeros((B, K, Qpad, Dpad), jnp.float32)
        dout_p = dout_p.at[:, :, :Q, :D].set(dout)
    idx_p = idx.astype(jnp.int32)
    if Qpad != Q:
        # padding rows carry idx T (out of range -> matches no table row)
        idx_p = jnp.concatenate(
            [idx_p, jnp.full((B, K, Qpad - Q), T, jnp.int32)], axis=-1)
    idx_p = jnp.broadcast_to(
        idx_p.reshape(B, K, Qpad // bq, 1, bq),
        (B, K, Qpad // bq, 8, bq))
    out = pl.pallas_call(
        _onehot_scatter_kernel,
        grid=(B, K, Qpad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8, bq), lambda b, k, q: (b, k, q, 0, 0)),
            pl.BlockSpec((1, 1, bq, Dpad), lambda b, k, q: (b, k, q, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Tpad, Dpad), lambda b, k, q: (b, k, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, K, Tpad, Dpad), jnp.float32),
        interpret=interpret,
    )(idx_p, dout_p.astype(jnp.float32))
    return out[:, :, :T, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def onehot_gather_vjp(table, idx, block_q=512, interpret=False):
    """Differentiable one-hot gather: same forward as onehot_gather,
    Pallas scatter-add backward (no gradient w.r.t. idx — selection is
    not differentiable, matching take_along_axis semantics)."""
    return onehot_gather(table, idx, block_q=block_q, interpret=interpret)


def _og_fwd(table, idx, block_q, interpret):
    return onehot_gather(table, idx, block_q=block_q,
                         interpret=interpret), (idx, table.shape[-2])


def _og_bwd(block_q, interpret, res, dout):
    idx, T = res
    return _scatter_add(dout, idx, T, block_q, interpret), None


onehot_gather_vjp.defvjp(_og_fwd, _og_bwd)
