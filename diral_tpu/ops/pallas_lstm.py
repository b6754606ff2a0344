"""Fused Pallas LSTM window kernel -- the DRQN Q-net's hot op.

The reference net is BasicLSTMCell over a short history window with only
the LAST step's hidden state consumed (drl_drqn.py:109-155: dynamic_rnn ->
``output[:, -1]``).  The XLA lowering of ``lstm_scan`` (models/recurrent.py)
is HBM-bound, not compute-bound, at the production shapes: it materializes
the whole-window input projection ([B, T, 4H] -- 48 MB at the toy train
event) and streams [B, 4H] gate tensors to/from HBM every step for the
backward pass; the round-4 event profile put the train event at 12% of
bf16 peak with this traffic as the dominant term.

This kernel computes the full window in one fused pass per batch tile:
x tile and weights are read ONCE into VMEM, the recurrence (T matmuls +
gate nonlinearities) runs entirely on-chip, and only the last-step hidden
leaves the kernel.  The custom VJP recomputes the forward inside the
backward kernel (h/c history lives in VMEM scratch), so NOTHING is stashed
to HBM between forward and backward -- the classic recompute trade: ~1.5x
the matmul FLOPs (cheap here) for ~50x less HBM traffic.

Input layout: the window rides FLAT lanes, [B, T*Dp] with each step's
features lane-padded to ``Dp = round_up(D, 16)``.  The natural [B, T, D]
layout puts (T, D) in the TPU tile dims and wastes ~5/6 of its physical
footprint to lane padding at these shapes (D=23 in 128 lanes), which made
the producing repack/transpose the single largest train-event op; flat
windows are dense, per-step reads are aligned static lane slices, and the
16-multiple step stride keeps bfloat16's (16, 128) packing legal (the
unpadded bf16 23-lane slice dies in Mosaic layout inference:
"infer-vector-layout: unsupported shape cast").

Numerics: matmul inputs are cast to bfloat16 with float32 accumulation --
exactly what XLA's default matmul precision does for f32 operands on TPU
(CLAUDE.md trap #1), so the kernel matches the XLA path's precision class
in both float32 and bfloat16 compute modes.  Gate math is float32.
float64 (the CPU parity suite) must use the ``lstm_scan`` fallback.

Layout notes (TPU): gate order i, g, f, o with the BasicLSTMCell +1.0
forget bias, matching models/recurrent.py.  H must be a multiple of 128
(lane-aligned gate slices); B is padded to the batch tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def padded_dim(d: int) -> int:
    """Per-step lane stride of the flat window layout (dtype-independent,
    so float32 and bfloat16 carries share one layout).

    Sized to ``round_up(d + 2, 16)``: 16-multiple strides keep bf16 tile
    packing legal and every slice aligned, and the +2 leaves room for the
    replay's fused reward/action channels to ride INSIDE a step's pad
    lanes -- the replay stores each user's slot at this same stride, so a
    sampled window is a pure aligned slice+reshape away from the kernel's
    input layout (the unaligned-stride assembly cost a measured 0.45
    ms/event).  Pad lanes need NOT be zero: they meet zero rows of the
    padded input-weight matrix, so the forward ignores them and their dx
    is exactly zero either way."""
    return _round_up(d + 2, 16)


def _mxu_dot(a, b_mat):
    """bf16-input, f32-accumulate matmul: the XLA default-precision class."""
    return jnp.dot(a.astype(jnp.bfloat16), b_mat.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _gate_math(c, gates, H: int):
    i = gates[:, :H]
    g = gates[:, H:2 * H]
    f = gates[:, 2 * H:3 * H]
    o = gates[:, 3 * H:]
    si = jax.nn.sigmoid(i)
    tg = jnp.tanh(g)
    sf = jax.nn.sigmoid(f + 1.0)   # BasicLSTMCell forget bias
    so = jax.nn.sigmoid(o)
    new_c = c * sf + si * tg
    new_h = jnp.tanh(new_c) * so
    return new_c, new_h, (si, tg, sf, so)


def _fwd_kernel(x_ref, wx_ref, wh_ref, b_ref, h_out_ref, *,
                T: int, Dp: int, H: int):
    Bt = x_ref.shape[0]
    f32 = jnp.float32
    h = jnp.zeros((Bt, H), f32)
    c = jnp.zeros((Bt, H), f32)
    wx, wh = wx_ref[:], wh_ref[:]  # pre-cast to bf16 by the wrapper
    b = b_ref[:].astype(f32)
    for t in range(T):  # T is small (history windows <= 10): unrolled
        gates = (_mxu_dot(x_ref[:, t * Dp:(t + 1) * Dp], wx)
                 + _mxu_dot(h, wh) + b)
        c, h, _ = _gate_math(c, gates, H)
    h_out_ref[:] = h.astype(h_out_ref.dtype)


def _bwd_kernel(x_ref, wx_ref, wh_ref, b_ref, g_ref,
                *refs, T: int, Dp: int, H: int, need_dx: bool):
    """Recompute-forward backward: h/c history stays in VMEM scratch;
    weight grads accumulate across the (sequential) batch-tile grid.

    ``need_dx=False`` (the replay-fed train path: windows are DATA, their
    cotangent is discarded by construction) drops the dx output and its
    dgates @ Wx^T matmuls -- ~T*2*4H*Dp FLOPs/row and a [Bt, L] HBM
    write, with identical dw/db by construction.

    The h history is stashed in BFLOAT16 scratch: h_prev is only ever
    consumed through the bf16 input casts of the gate-recompute and dWh
    matmuls, so the rounded stash is BIT-identical to stashing f32 and
    casting at each use -- and it halves the largest scratch buffer,
    buying the wider batch tile.  c history stays f32 (consumed by f32
    gate math)."""
    if need_dx:
        dx_ref, dwx_ref, dwh_ref, db_ref, h_hist, c_hist = refs
    else:
        dwx_ref, dwh_ref, db_ref, h_hist, c_hist = refs
    Bt = x_ref.shape[0]
    f32 = jnp.float32
    wx, wh = wx_ref[:], wh_ref[:]  # pre-cast to bf16 by the wrapper
    b = b_ref[:].astype(f32)

    # forward sweep (recompute), stashing h_{t-1}/c_{t-1} chains
    h = jnp.zeros((Bt, H), f32)
    c = jnp.zeros((Bt, H), f32)
    for t in range(T):
        h_hist[t] = h.astype(jnp.bfloat16)
        c_hist[t] = c
        gates = (_mxu_dot(x_ref[:, t * Dp:(t + 1) * Dp], wx)
                 + _mxu_dot(h, wh) + b)
        c, h, _ = _gate_math(c, gates, H)
    c_hist[T] = c

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # backward sweep; only the last step receives an external cotangent
    # (the net consumes h_last alone)
    dh = g_ref[:].astype(f32)
    dc = jnp.zeros((Bt, H), f32)
    for t in reversed(range(T)):
        xt = x_ref[:, t * Dp:(t + 1) * Dp]
        h_prev = h_hist[t]              # bf16; consumed via bf16 dots only
        c_prev = c_hist[t]
        c_t = c_hist[t + 1]
        gates = _mxu_dot(xt, wx) + _mxu_dot(h_prev, wh) + b
        _, _, (si, tg, sf, so) = _gate_math(c_prev, gates, H)
        tc = jnp.tanh(c_t)
        do_ = dh * tc
        dao = do_ * so * (1.0 - so)
        dct = dc + dh * so * (1.0 - tc * tc)
        daf = dct * c_prev * sf * (1.0 - sf)
        dai = dct * tg * si * (1.0 - si)
        dag = dct * si * (1.0 - tg * tg)
        dgates = jnp.concatenate([dai, dag, daf, dao], axis=1)  # i, g, f, o
        dc = dct * sf
        # dh_{t-1} = dgates @ Wh^T ; dx_t = dgates @ Wx^T (contract lanes);
        # wx's padded rows are zero, so padded dx lanes land zero
        dh = jax.lax.dot_general(
            dgates.astype(jnp.bfloat16), wh,
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        if need_dx:
            dx_ref[:, t * Dp:(t + 1) * Dp] = jax.lax.dot_general(
                dgates.astype(jnp.bfloat16), wx,
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32).astype(dx_ref.dtype)
        # dWx += x_t^T @ dgates ; dWh += h_{t-1}^T @ dgates (contract batch)
        dwx_ref[:] += jax.lax.dot_general(
            xt.astype(jnp.bfloat16), dgates.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)
        dwh_ref[:] += jax.lax.dot_general(
            h_prev.astype(jnp.bfloat16), dgates.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=f32)
        db_ref[:] += jnp.sum(dgates, axis=0, keepdims=True)


def _bwd_tile(T: int, L: int, H: int) -> int:
    """Backward batch tile.  512 was measured to exceed the compiler's
    16 MiB scoped-VMEM limit at the toy shapes (16.39 MiB compiled demand
    -- Mosaic's real temporary footprint runs ~3.5 MiB past the analytic
    stash+tiles+temps model), so the tile stays at 256; the bf16 h stash
    still frees ~1.8 MiB of scratch there for the compiler."""
    return 256


def _fwd_tile(B: int) -> int:
    """Forward batch tile: prefer 512 (halves the sequential matmul count
    -- the recurrence is latency-chained, so fewer/larger MXU ops win)
    unless 256 wastes less row padding."""
    return min((512, 256), key=lambda bt: (_round_up(max(B, 1), bt), -bt))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_batch(x, bt: int):
    B = x.shape[0]
    Bp = _round_up(max(B, 1), bt)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B),) + ((0, 0),) * (x.ndim - 1))
    return x, B, Bp


def _pad_w(w, D: int, Dp: int):
    """Input-weight rows padded to the flat layout's step stride; padded
    rows are zero so padded x lanes contribute nothing.  Cast once here,
    not per batch tile inside the kernel."""
    wx = jnp.pad(w[:D], ((0, Dp - D), (0, 0))).astype(jnp.bfloat16)
    wh = w[D:].astype(jnp.bfloat16)
    return wx, wh


def _fwd_impl(x2, w, b, T: int, Dp: int):
    _, L = x2.shape
    assert L == T * Dp, (L, T, Dp)
    H = w.shape[1] // 4
    D = w.shape[0] - H
    bt = _fwd_tile(x2.shape[0])
    xp, B0, Bp = _pad_batch(x2, bt)
    wx, wh = _pad_w(w, D, Dp)
    kernel = functools.partial(_fwd_kernel, T=T, Dp=Dp, H=H)
    h = pl.pallas_call(
        kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, L), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 4 * H), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, H), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, H), x2.dtype),
        interpret=_interpret(),
    )(xp, wx, wh, b[None, :])
    return h[:B0]


def _fwd_dual_kernel(x_ref, wxa_ref, wha_ref, ba_ref,
                     wxb_ref, whb_ref, bb_ref, ha_ref, hb_ref, *,
                     T: int, Dp: int, H: int):
    """Two LSTMs over the SAME input windows in one pass -- x is read into
    VMEM once instead of once per net.  Serves the Double-DQN target's
    (online, target) forwards on next_states (drl_drqn.py:267-292)."""
    Bt = x_ref.shape[0]
    f32 = jnp.float32
    ha = jnp.zeros((Bt, H), f32)
    ca = jnp.zeros((Bt, H), f32)
    hb = jnp.zeros((Bt, H), f32)
    cb = jnp.zeros((Bt, H), f32)
    wxa, wha, ba = wxa_ref[:], wha_ref[:], ba_ref[:].astype(f32)
    wxb, whb, bb = wxb_ref[:], whb_ref[:], bb_ref[:].astype(f32)
    for t in range(T):
        xt = x_ref[:, t * Dp:(t + 1) * Dp]
        ga = _mxu_dot(xt, wxa) + _mxu_dot(ha, wha) + ba
        ca, ha, _ = _gate_math(ca, ga, H)
        gb = _mxu_dot(xt, wxb) + _mxu_dot(hb, whb) + bb
        cb, hb, _ = _gate_math(cb, gb, H)
    ha_ref[:] = ha.astype(ha_ref.dtype)
    hb_ref[:] = hb.astype(hb_ref.dtype)


def _fwd_dual_impl(x2, wa, ba, wb, bb, T: int, Dp: int):
    _, L = x2.shape
    assert L == T * Dp, (L, T, Dp)
    assert wa.shape == wb.shape, (wa.shape, wb.shape)
    H = wa.shape[1] // 4
    D = wa.shape[0] - H
    bt = _fwd_tile(x2.shape[0])
    xp, B0, Bp = _pad_batch(x2, bt)
    wxa, wha = _pad_w(wa, D, Dp)
    wxb, whb = _pad_w(wb, D, Dp)
    kernel = functools.partial(_fwd_dual_kernel, T=T, Dp=Dp, H=H)
    w_spec = [
        pl.BlockSpec((Dp, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bt, H), lambda ib: (ib, 0),
                            memory_space=pltpu.VMEM)
    ha, hb = pl.pallas_call(
        kernel,
        grid=(Bp // bt,),
        in_specs=[pl.BlockSpec((bt, L), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM)]
        + w_spec + w_spec,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((Bp, H), x2.dtype)] * 2,
        interpret=_interpret(),
    )(xp, wxa, wha, ba[None, :], wxb, whb, bb[None, :])
    return ha[:B0], hb[:B0]


def lstm_last_flat_dual(x2, wa, ba, wb, bb, T: int):
    """(h_last under params a, h_last under params b) for the same flat
    windows -- forward-only (the Double-DQN target path is inside
    stop_gradient)."""
    H = wa.shape[1] // 4
    D = wa.shape[0] - H
    return _fwd_dual_impl(x2, wa, ba, wb, bb, T, padded_dim(D))


def _fwd_triple_kernel(x_ref, wx_ref, wh_ref, b_ref,
                       wxt_ref, wht_ref, bt_ref,
                       hs_ref, hna_ref, hnb_ref, *,
                       T: int, Dp: int, H: int):
    """The whole train-step forward bundle in ONE pass over the combined
    (T+1)-step window (ring-contiguity: next_states windows are the states
    windows shifted one step, agents/replay.py).  Three recurrences share
    one VMEM read of x -- and the two ONLINE recurrences share each step's
    input projection x_t @ Wx outright (identical arithmetic at identical
    absolute steps, so h_s / h_na / h_nb are bit-identical to the separate
    _fwd_kernel / _fwd_dual_kernel calls):

      h_s  = online net over steps 0..T-1  (the loss forward on states)
      h_na = online net over steps 1..T    (Double-DQN argmax on next)
      h_nb = target net over steps 1..T    (target values on next)

    drl_drqn.py:267-292 + 294-377: the reference runs these as three
    separate session graphs over two materialized batches."""
    Bt = x_ref.shape[0]
    f32 = jnp.float32
    h_s = jnp.zeros((Bt, H), f32)
    c_s = jnp.zeros((Bt, H), f32)
    h_na = jnp.zeros((Bt, H), f32)
    c_na = jnp.zeros((Bt, H), f32)
    h_nb = jnp.zeros((Bt, H), f32)
    c_nb = jnp.zeros((Bt, H), f32)
    wx, wh, b = wx_ref[:], wh_ref[:], b_ref[:].astype(f32)
    wxt, wht, bt = wxt_ref[:], wht_ref[:], bt_ref[:].astype(f32)
    for t in range(T + 1):
        xt = x_ref[:, t * Dp:(t + 1) * Dp]
        xp = _mxu_dot(xt, wx)          # online input projection, shared
        if t < T:
            g = xp + _mxu_dot(h_s, wh) + b
            c_s, h_s, _ = _gate_math(c_s, g, H)
        if t >= 1:
            g = xp + _mxu_dot(h_na, wh) + b
            c_na, h_na, _ = _gate_math(c_na, g, H)
            gt = _mxu_dot(xt, wxt) + _mxu_dot(h_nb, wht) + bt
            c_nb, h_nb, _ = _gate_math(c_nb, gt, H)
    hs_ref[:] = h_s.astype(hs_ref.dtype)
    hna_ref[:] = h_na.astype(hna_ref.dtype)
    hnb_ref[:] = h_nb.astype(hnb_ref.dtype)


def _fwd_triple_impl(x2c, w, b, wt, bt, T: int, Dp: int):
    _, L = x2c.shape
    assert L == (T + 1) * Dp, (L, T, Dp)
    assert w.shape == wt.shape, (w.shape, wt.shape)
    H = w.shape[1] // 4
    D = w.shape[0] - H
    btile = _fwd_tile(x2c.shape[0])
    xp_, B0, Bp = _pad_batch(x2c, btile)
    wx, wh = _pad_w(w, D, Dp)
    wxt, wht = _pad_w(wt, D, Dp)
    kernel = functools.partial(_fwd_triple_kernel, T=T, Dp=Dp, H=H)
    w_spec = [
        pl.BlockSpec((Dp, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((btile, H), lambda ib: (ib, 0),
                            memory_space=pltpu.VMEM)
    hs, hna, hnb = pl.pallas_call(
        kernel,
        grid=(Bp // btile,),
        in_specs=[pl.BlockSpec((btile, L), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM)]
        + w_spec + w_spec,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((Bp, H), x2c.dtype)] * 3,
        interpret=_interpret(),
    )(xp_, wx, wh, b[None, :], wxt, wht, bt[None, :])
    return hs[:B0], hna[:B0], hnb[:B0]


@functools.lru_cache(maxsize=None)
def _triple_op(T: int, Dp: int):
    """Differentiable-through-h_s triple op: gradients flow to (x2c's
    first T*Dp lanes, w, b) via the recompute backward kernel; h_na / h_nb
    are TARGET-PATH outputs whose cotangents the backward IGNORES --
    callers must consume them under ``stop_gradient`` semantics (drqn
    td_targets does; the Double-DQN target is never differentiated,
    drl_drqn.py:267-292)."""

    @jax.custom_vjp
    def op(x2c, w, b, wt, bt):
        return _fwd_triple_impl(x2c, w, b, wt, bt, T, Dp)

    def fwd(x2c, w, b, wt, bt):
        return _fwd_triple_impl(x2c, w, b, wt, bt, T, Dp), (x2c, w, b, wt, bt)

    def bwd(res, gs):
        x2c, w, b, wt, bt = res
        g_s, _g_na, _g_nb = gs  # target-path cotangents: zero by contract
        # The window rows are replay DATA -- their cotangent has no
        # consumer by construction (drqn train differentiates params
        # only), so the backward kernel skips the dx output and its
        # dgates @ Wx^T matmuls entirely (need_dx=False) and a symbolic
        # zero is returned instead.
        _, dw, db = _bwd_impl(x2c[:, :T * Dp], w, b, g_s, T, Dp,
                              need_dx=False)
        return (jnp.zeros_like(x2c), dw, db,
                jnp.zeros_like(wt), jnp.zeros_like(bt))

    op.defvjp(fwd, bwd)
    return op


def lstm_last_flat_triple(x2c, w, b, wt, bt, T: int):
    """(h_s, h_na, h_nb) over a combined flat (T+1)-step window
    [B, (T+1)*Dp]: the loss forward (steps 0..T-1, differentiable) and the
    Double-DQN target pair (steps 1..T, online + target nets,
    stop-gradient contract -- see _triple_op)."""
    H = w.shape[1] // 4
    D = w.shape[0] - H
    return _triple_op(T, padded_dim(D))(x2c, w, b, wt, bt)


def _bwd_impl(x2, w, b, g, T: int, Dp: int, need_dx: bool = True):
    _, L = x2.shape
    H = w.shape[1] // 4
    D = w.shape[0] - H
    bt = _bwd_tile(T, L, H)
    xp, B0, Bp = _pad_batch(x2, bt)
    gp, _, _ = _pad_batch(g, bt)  # zero rows -> zero weight-grad term
    wx, wh = _pad_w(w, D, Dp)
    kernel = functools.partial(_bwd_kernel, T=T, Dp=Dp, H=H,
                               need_dx=need_dx)
    w_out_specs = [
        pl.BlockSpec((Dp, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * H), lambda ib: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    w_out_shapes = [
        jax.ShapeDtypeStruct((Dp, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
    ]
    dx_spec = [pl.BlockSpec((bt, L), lambda ib: (ib, 0),
                            memory_space=pltpu.VMEM)] if need_dx else []
    dx_shape = ([jax.ShapeDtypeStruct((Bp, L), x2.dtype)]
                if need_dx else [])
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bt,),
        in_specs=[
            pl.BlockSpec((bt, L), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 4 * H), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=dx_spec + w_out_specs,
        out_shape=dx_shape + w_out_shapes,
        scratch_shapes=[
            pltpu.VMEM((T + 1, bt, H), jnp.bfloat16),  # h stash
            pltpu.VMEM((T + 1, bt, H), jnp.float32),   # c stash
        ],
        interpret=_interpret(),
    )(xp, wx, wh, b[None, :], gp)
    if need_dx:
        dx, dwx, dwh, db = out
        dx = dx[:B0]
    else:
        dwx, dwh, db = out
        dx = None
    dw = jnp.concatenate([dwx[:D], dwh], axis=0).astype(w.dtype)
    return dx, dw, db[0].astype(b.dtype)


@functools.lru_cache(maxsize=None)
def _flat_op(T: int, Dp: int):
    @jax.custom_vjp
    def op(x2, w, b):
        return _fwd_impl(x2, w, b, T, Dp)

    def fwd(x2, w, b):
        return _fwd_impl(x2, w, b, T, Dp), (x2, w, b)

    def bwd(res, g):
        x2, w, b = res
        return _bwd_impl(x2, w, b, g, T, Dp)

    op.defvjp(fwd, bwd)
    return op


def lstm_last_flat(x2, w, b, T: int):
    """Fused LSTM over a FLAT padded window, returning only the last
    hidden state.

    x2: [B, T*Dp] with Dp = padded_dim(D) and each step's D features at
    lane offset t*Dp (pad lanes should be zero: they meet zero weight
    rows so the forward ignores them either way, but zeros keep the
    layout canonical); w: [D+H, 4H]; b: [4H].  Returns [B, H] in x2's
    dtype."""
    H = w.shape[1] // 4
    D = w.shape[0] - H
    return _flat_op(T, padded_dim(D))(x2, w, b)


def lstm_last(x, w, b):
    """Fused LSTM over a [B, T, D] window -> last hidden [B, H].

    Semantics = ``lstm_scan(params, x)[1][:, -1]`` within the
    default-matmul-precision class (bf16-input matmuls, f32 accumulation);
    the XLA path stays the canonical implementation and the parity is
    checked in tests/test_pallas_lstm.py + bench.py's on-device gate.
    Prefer ``lstm_last_flat`` on hot paths: this wrapper pads/flattens
    here, and the flat layout lets XLA fuse that with the producing
    transpose instead of materializing the padded [B, T, D] form."""
    return lstm_last_flat(flatten_window(x), w, b, x.shape[1])


def flatten_window(x):
    """[B, T, D] -> the kernel's flat [B, T*Dp] layout (zero pad lanes)."""
    B, T, D = x.shape
    Dp = padded_dim(D)
    return jnp.pad(x, ((0, 0), (0, 0), (0, Dp - D))).reshape(B, T * Dp)


def unflatten_window(x2, T: int, D: int):
    """Inverse of ``flatten_window`` (drops pad lanes)."""
    B = x2.shape[0]
    Dp = padded_dim(D)
    return x2.reshape(B, T, Dp)[..., :D]


def supported(x_dtype, hidden: int) -> bool:
    """Shapes/dtypes the kernel serves; callers fall back to lstm_scan
    otherwise (notably float64 -- the CPU bit-parity suite)."""
    return (jnp.dtype(x_dtype) in (jnp.dtype(jnp.float32),
                                   jnp.dtype(jnp.bfloat16))
            and hidden % 128 == 0)
