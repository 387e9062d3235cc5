"""Fused bidirectional LSTM layer as a Pallas TPU kernel.

The scan path (ops.lstm.bilstm) pays XLA loop overhead per timestep.
This kernel walks the time axis with the TPU grid (grid steps execute
sequentially on a core, so VMEM scratch carries the recurrent state),
keeping both directions' (h, c) and recurrent weights VMEM-resident and
streaming the precomputed input projections block-by-block with Pallas's
automatic double buffering. Each grid step processes ``BLOCK_T``
timesteps with an unrolled inner loop, amortizing grid transitions:

    grid = (ceil(T / BLOCK_T),)         # sequential on TPU
    scratch: h[2, B, H], c[2, B, H]
    per step, per t in block:
        gates = xg_t + h @ W_hh          (one MXU dot per direction)
        elementwise LSTM cell (VPU), masked state freeze

Semantics identical to ops.lstm.bilstm (packed-sequence masking, torch
gate order); asserted by tests in interpret mode and on hardware.
Measured on v5e (asr_en_base, batch 8x10s): 2.2x over the fused scan
for inference. The training kernel pair below runs both directions'
recurrences in one kernel as a direction-batched dot (see the training
section comment for per-kernel timings); gradients match the
differentiated scan to 7e-4 max relative error on hardware (f32
reduction-order noise at T=100).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bilstm_pallas"]

BLOCK_T = 8  # timesteps per grid step


def _kernel(valid_ref, xg_ref, whh_ref, out_ref, h_ref, c_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    hidden = h_ref.shape[-1]
    whh = whh_ref[...]

    for k in range(xg_ref.shape[0]):  # unrolled over the time block
        h_prev = h_ref[...]
        c_prev = c_ref[...]
        # xg may stream as bf16 (halves the dominant HBM traffic);
        # accumulate in f32
        gates = xg_ref[k].astype(jnp.float32) + jax.lax.dot_general(
            h_prev, whh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[..., :hidden])
        f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden:])
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)

        valid = valid_ref[k][:, :, None]  # [2, B, 1] float mask
        h = valid * h + (1.0 - valid) * h_prev
        c = valid * c + (1.0 - valid) * c_prev
        h_ref[...] = h
        c_ref[...] = c
        out_ref[k] = h * valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bilstm_pallas_call(xg, w_hh, lengths, interpret=False):
    time, _, batch, gates4 = xg.shape
    hidden = gates4 // 4

    pad_t = -(-time // BLOCK_T) * BLOCK_T
    xg = jnp.pad(xg, ((0, pad_t - time), (0, 0), (0, 0), (0, 0)))
    t_all = jnp.arange(pad_t)
    # fwd row t is original index t; bwd row t is original index time-1-t
    orig = jnp.stack([t_all, time - 1 - t_all], axis=1)  # [Tpad, 2]
    valid = (
        (orig >= 0)[:, :, None]
        & (orig[:, :, None] < lengths[None, None, :])
    ).astype(jnp.float32)  # [Tpad, 2, B]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(
            (pad_t, 2, batch, hidden), jnp.float32
        ),
        grid=(pad_t // BLOCK_T,),
        in_specs=[
            pl.BlockSpec((BLOCK_T, 2, batch), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_T, 2, batch, gates4),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, gates4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_T, 2, batch, hidden), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, batch, hidden), jnp.float32),
            pltpu.VMEM((2, batch, hidden), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * pad_t * 2 * batch * hidden * gates4,
            bytes_accessed=pad_t * 2 * batch * (gates4 + hidden) * 4,
            transcendentals=pad_t * 2 * batch * hidden * 5,
        ),
        # long sequences (e.g. 12 s clips -> 608 LSTM frames at batch
        # 64) need > the default 16 MB scoped vmem, like the train
        # kernels (_TRAIN_COMPILER_PARAMS)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(valid, xg, w_hh)
    return out[:time]


def _bilstm_pallas_impl(layer_params, x, lengths, interpret: bool = False):
    fwd, bwd = layer_params["fwd"], layer_params["bwd"]

    def in_proj(p):
        return x @ p["w_ih"].T + p["b_ih"] + p["b_hh"]  # [B, T, 4H]

    xg_f = jnp.swapaxes(in_proj(fwd), 0, 1)        # [T, B, 4H]
    xg_b = jnp.swapaxes(in_proj(bwd), 0, 1)[::-1]
    xg = jnp.stack([xg_f, xg_b], axis=1)           # [T, 2, B, 4H]
    # Stream the gate projections in bf16: they dominate HBM traffic
    # (T x 2 x B x 4H), recurrence and states stay f32. Disable with
    # VOICE100_TPU_LSTM_XG_DTYPE=float32.
    import os

    if os.environ.get("VOICE100_TPU_LSTM_XG_DTYPE", "bfloat16") == "bfloat16":
        xg = xg.astype(jnp.bfloat16)
    w_hh = jnp.stack([fwd["w_hh"].T, bwd["w_hh"].T], axis=0)
    out = _bilstm_pallas_call(
        xg, w_hh, lengths.astype(jnp.int32), interpret=interpret
    )  # [T, 2, B, H]
    out_f = jnp.swapaxes(out[:, 0], 0, 1)
    out_b = jnp.swapaxes(out[::-1, 1], 0, 1)
    return jnp.concatenate([out_f, out_b], axis=-1)


# --- training path: state-saving forward + Pallas backward ----------------
#
# The backward kernel re-derives the gate activations from the saved
# per-step (h, c) states (one extra MXU matmul per step, cheaper than
# storing [T, B, 4H] activations), carries (dh, dc) in VMEM across the
# reverse time grid, and emits only dG = dLoss/d(gate pre-activations).
# Every weight/input gradient then falls out as one large MXU matmul
# outside the kernel:
#     dW_hh = h_prev^T dG,  dW_ih = dG^T x,  db = sum dG,  dx = dG W_ih
#
# Both directions run in ONE kernel as a batched dot over a leading
# direction axis ([2, BB, H] x [2, H, 4H]) like the inference kernel:
# the two recurrences are independent, so their per-step MXU dots
# pipeline back-to-back instead of stalling on the recurrent
# dependency. Measured on v5e (B=64, T=500, H=512, per layer):
#   fwd  f32 2.14 -> 1.44 ms (exact)   bf16-stream 2.94 -> 0.92 ms
#   bwd  f32 4.56 -> 3.87 ms (exact)   bf16-stream 5.07 -> 3.54 ms
# Everything in HBM stays in per-direction [T, B, *] layout (stacked
# [T, 2, B, *] buffers cost ~0.5 GB of extra copies/relayouts per step
# and erased the kernel win end-to-end); the [2, ...] direction axis is
# formed in VMEM inside the kernel (~1 MB/step, negligible).
# The block sizes are VMEM-bound (W_hh doubles to [2, H, 4H]): the
# f32 backward only fits at BLOCK_T=1, the bf16-streaming variants at
# BLOCK_T=2 (xg/dout/dg stream bf16, recurrence and dots stay f32).

BLOCK_B_TRAIN = 64  # batch rows per grid step: full-batch matmul rows

# The default scoped-VMEM limit (16 MB) is conservative; the fused
# two-direction kernels stream ~17-33 MB of double-buffered blocks at
# their fastest tile sizes, well within the physical VMEM.
_TRAIN_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024,
)


def _block_t_train(bf16: bool, backward: bool) -> int:
    # empirically fastest VMEM-feasible tiles (see header table);
    # tuning overrides for probing new hardware. Read OUTSIDE the
    # jitted wrappers (the value is a static jit argument), so a
    # changed override takes effect on the next call's retrace.
    import os

    name = ("VOICE100_TPU_LSTM_BT_BWD" if backward else
            "VOICE100_TPU_LSTM_BT_FWD")
    override = os.environ.get(name)
    if override:
        try:
            value = int(override)
        except ValueError:
            raise ValueError(f"{name}={override!r}: not an integer")
        if value < 1:
            raise ValueError(f"{name}={value}: must be >= 1")
        return value
    if backward:
        return 2 if bf16 else 1
    return 2 if bf16 else 4


def _lstm_cell_batched(xg_k, h_prev, c_prev, whh):
    """One timestep for both directions: xg_k/h_prev/c_prev [2, BB, *],
    whh [2, H, 4H]. Returns (h, c) before masking."""
    hidden = h_prev.shape[-1]
    gates = xg_k.astype(jnp.float32) + jax.lax.dot_general(
        h_prev, whh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return h, c, (i, f, g, o)


def _kernel_train_fwd(vf_ref, vb_ref, xgf_ref, xgb_ref, whh_ref,
                      outf_ref, outb_ref, hf_ref, hb_ref, cf_ref, cb_ref,
                      h_ref, c_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    whh = whh_ref[...]  # [2, H, 4H]
    for k in range(xgf_ref.shape[0]):
        h_prev = h_ref[...]  # [2, BB, H]
        c_prev = c_ref[...]
        xg_k = jnp.stack([xgf_ref[k], xgb_ref[k]])  # VMEM-local stack
        h, c, _ = _lstm_cell_batched(xg_k, h_prev, c_prev, whh)
        valid = jnp.stack([vf_ref[k, :, :1], vb_ref[k, :, :1]])
        h = valid * h + (1.0 - valid) * h_prev
        c = valid * c + (1.0 - valid) * c_prev
        h_ref[...] = h
        c_ref[...] = c
        outf_ref[k] = h[0] * valid[0]
        outb_ref[k] = h[1] * valid[1]
        # save the PRE-update state at index k: it is exactly the
        # h_prev/c_prev the backward kernel needs for step k, so the
        # backward reads these buffers directly instead of building
        # time-shifted copies (which round-tripped ~0.6 GB of HBM per
        # layer per step). bf16 storage under the mixed-precision flag
        # halves the stream again.
        hf_ref[k] = h_prev[0].astype(hf_ref.dtype)
        hb_ref[k] = h_prev[1].astype(hb_ref.dtype)
        cf_ref[k] = c_prev[0].astype(cf_ref.dtype)
        cb_ref[k] = c_prev[1].astype(cb_ref.dtype)


def _kernel_train_bwd(vf_ref, vb_ref, xgf_ref, xgb_ref, hpf_ref, hpb_ref,
                      cpf_ref, cpb_ref, dof_ref, dob_ref, whh_ref,
                      dgf_ref, dgb_ref, dh_ref, dc_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    whh = whh_ref[...]  # [2, H, 4H]
    block = xgf_ref.shape[0]
    for k in range(block - 1, -1, -1):  # reverse within the block
        # pre-update states straight from the forward kernel's outputs
        # (possibly bf16-stored); recurrence math stays f32
        h_prev = jnp.stack(
            [hpf_ref[k], hpb_ref[k]]
        ).astype(jnp.float32)  # [2, BB, H]
        c_prev = jnp.stack([cpf_ref[k], cpb_ref[k]]).astype(jnp.float32)
        xg_k = jnp.stack([xgf_ref[k], xgb_ref[k]])
        # recompute the cell (same math as forward)
        _, c_cand, (i, f, g, o) = _lstm_cell_batched(
            xg_k, h_prev, c_prev, whh
        )
        tanh_c = jnp.tanh(c_cand)

        v = jnp.stack([vf_ref[k, :, :1], vb_ref[k, :, :1]])  # [2, BB, 1]
        dout = jnp.stack([dof_ref[k], dob_ref[k]])
        d_h = dh_ref[...]
        d_c = dc_ref[...]
        # h_t = v*h~ + (1-v)*h_prev;  out_t = v*h~
        d_hcand = v * (d_h + dout.astype(jnp.float32))
        d_o = d_hcand * tanh_c
        d_ccand = d_hcand * o * (1.0 - tanh_c * tanh_c) + v * d_c
        d_i = d_ccand * g
        d_f = d_ccand * c_prev
        d_g = d_ccand * i
        da = jnp.concatenate(
            [
                d_i * i * (1.0 - i),
                d_f * f * (1.0 - f),
                d_g * (1.0 - g * g),
                d_o * o * (1.0 - o),
            ],
            axis=-1,
        )
        dgf_ref[k] = da[0].astype(dgf_ref.dtype)
        dgb_ref[k] = da[1].astype(dgb_ref.dtype)
        # dh_{t-1}: through the recurrent matmul + the frozen-state path
        dh_ref[...] = jax.lax.dot_general(
            da, whh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + (1.0 - v) * d_h
        dc_ref[...] = d_ccand * f + (1.0 - v) * d_c


_MASK_LANES = 128  # TPU lane width: makes the mask block tile cleanly


def _dir_valid(time, pad_t, pad_b, lengths, reverse):
    t_all = jnp.arange(pad_t)
    orig = (time - 1 - t_all) if reverse else t_all
    lengths = jnp.pad(lengths, (0, pad_b - lengths.shape[0]))
    valid = (
        (orig >= 0)[:, None] & (orig[:, None] < lengths[None, :])
    ).astype(jnp.float32)  # [Tpad, Bpad]
    return jnp.broadcast_to(
        valid[:, :, None], (pad_t, pad_b, _MASK_LANES)
    )


def _pad_tb(a, pad_t, pad_b):
    return jnp.pad(
        a,
        ((0, pad_t - a.shape[0]), (0, pad_b - a.shape[1]))
        + ((0, 0),) * (a.ndim - 2),
    )


@functools.partial(
    jax.jit, static_argnames=("block_t", "state_dtype", "interpret")
)
def _lstm_train_fwd_pair(xg_f, xg_b, whh2, lengths, block_t,
                         state_dtype=jnp.float32, interpret=False):
    """Both directions in one kernel. xg_f/xg_b [T, B, 4H] (xg_b
    pre-reversed in time, f32 or bf16), whh2 [2, H, 4H] ->
    per-direction (out, h_prev_seq, c_prev_seq) [T, B, H] tuples.
    The state sequences hold the PRE-update state of each step (row k
    is the state entering step k) in ``state_dtype``."""
    time, batch, gates4 = xg_f.shape
    hidden = gates4 // 4
    pad_t = -(-time // block_t) * block_t
    pad_b = -(-batch // BLOCK_B_TRAIN) * BLOCK_B_TRAIN
    xg_f = _pad_tb(xg_f, pad_t, pad_b)
    xg_b = _pad_tb(xg_b, pad_t, pad_b)
    valid_f = _dir_valid(time, pad_t, pad_b, lengths, False)
    valid_b = _dir_valid(time, pad_t, pad_b, lengths, True)
    grid = (pad_b // BLOCK_B_TRAIN, pad_t // block_t)

    def ix3(b, t):
        return (t, b, 0)

    mask_spec = pl.BlockSpec((block_t, BLOCK_B_TRAIN, _MASK_LANES), ix3,
                             memory_space=pltpu.VMEM)
    xg_spec = pl.BlockSpec((block_t, BLOCK_B_TRAIN, gates4), ix3,
                           memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((block_t, BLOCK_B_TRAIN, hidden), ix3,
                          memory_space=pltpu.VMEM)
    shapes = [
        jax.ShapeDtypeStruct((pad_t, pad_b, hidden), jnp.float32)
        for _ in range(2)
    ] + [
        jax.ShapeDtypeStruct((pad_t, pad_b, hidden), state_dtype)
        for _ in range(4)
    ]
    out_f, out_b, hs_f, hs_b, cs_f, cs_b = pl.pallas_call(
        _kernel_train_fwd,
        out_shape=shapes,
        grid=grid,
        in_specs=[
            mask_spec, mask_spec, xg_spec, xg_spec,
            pl.BlockSpec((2, hidden, gates4), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[h_spec] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_B_TRAIN, hidden), jnp.float32),
            pltpu.VMEM((2, BLOCK_B_TRAIN, hidden), jnp.float32),
        ],
        compiler_params=_TRAIN_COMPILER_PARAMS,
        interpret=interpret,
    )(valid_f, valid_b, xg_f, xg_b, whh2)
    trim = lambda a: a[:time, :batch]  # noqa: E731
    return ((trim(out_f), trim(hs_f), trim(cs_f)),
            (trim(out_b), trim(hs_b), trim(cs_b)))


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def _lstm_train_bwd_pair(xg_f, xg_b, whh2, lengths, states, dout_f,
                         dout_b, block_t, interpret=False):
    """Both directions' dG in one kernel; returns (dg_f, dg_b)
    [T, B, 4H]. dg streams out in bf16 when xg streams in bf16.
    ``states`` holds the forward kernel's PRE-update state sequences,
    consumed directly (no time-shifted copies)."""
    time, batch, gates4 = xg_f.shape
    bf16 = xg_f.dtype == jnp.bfloat16
    pad_t = -(-time // block_t) * block_t
    pad_b = -(-batch // BLOCK_B_TRAIN) * BLOCK_B_TRAIN
    n_t = pad_t // block_t
    valid_f = _dir_valid(time, pad_t, pad_b, lengths, False)
    valid_b = _dir_valid(time, pad_t, pad_b, lengths, True)

    hidden = gates4 // 4
    (hp_f, cp_f), (hp_b, cp_b) = states["fwd"], states["bwd"]
    pads = [
        _pad_tb(a, pad_t, pad_b)
        for a in (xg_f, xg_b, hp_f, hp_b, cp_f, cp_b, dout_f, dout_b)
    ]

    # reverse time grid: block t processes time block (n_t - 1 - t)
    def rx3(b, t):
        return (n_t - 1 - t, b, 0)

    mask_spec = pl.BlockSpec((block_t, BLOCK_B_TRAIN, _MASK_LANES), rx3,
                             memory_space=pltpu.VMEM)
    xg_spec = pl.BlockSpec((block_t, BLOCK_B_TRAIN, gates4), rx3,
                           memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((block_t, BLOCK_B_TRAIN, hidden), rx3,
                          memory_space=pltpu.VMEM)
    dg_dtype = jnp.bfloat16 if bf16 else jnp.float32
    dg_f, dg_b = pl.pallas_call(
        _kernel_train_bwd,
        out_shape=[
            jax.ShapeDtypeStruct((pad_t, pad_b, gates4), dg_dtype)
            for _ in range(2)
        ],
        grid=(pad_b // BLOCK_B_TRAIN, n_t),
        in_specs=[
            mask_spec, mask_spec, xg_spec, xg_spec,
            h_spec, h_spec, h_spec, h_spec, h_spec, h_spec,
            pl.BlockSpec((2, hidden, gates4), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_t, BLOCK_B_TRAIN, gates4), rx3,
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, BLOCK_B_TRAIN, hidden), jnp.float32),
            pltpu.VMEM((2, BLOCK_B_TRAIN, hidden), jnp.float32),
        ],
        compiler_params=_TRAIN_COMPILER_PARAMS,
        interpret=interpret,
    )(valid_f, valid_b, *pads[:2], *pads[2:6], *pads[6:], whh2)
    return dg_f[:time, :batch], dg_b[:time, :batch]


def _dir_xg(p, x, reverse, bf16=False):
    if bf16:
        # bf16 operands, f32 accumulation: the input projection is the
        # largest matmul in the step and is not recurrence-critical
        prod = jax.lax.dot_general(
            x.astype(jnp.bfloat16), p["w_ih"].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xg = jnp.swapaxes(prod + p["b_ih"] + p["b_hh"], 0, 1)
        xg = xg.astype(jnp.bfloat16)  # stream bf16, kernels read f32
    else:
        xg = jnp.swapaxes(x @ p["w_ih"].T + p["b_ih"] + p["b_hh"], 0, 1)
    return xg[::-1] if reverse else xg  # [T, B, 4H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bilstm_op(bf16, layer_params, x, lengths):
    from ..parallel.mesh import pallas_interpret

    interpret = pallas_interpret()
    return _bilstm_pallas_impl(layer_params, x, lengths, interpret=interpret)


def _stack_whh(layer_params):
    return jnp.stack(
        [layer_params["fwd"]["w_hh"].T, layer_params["bwd"]["w_hh"].T],
        axis=0,
    )  # [2, H, 4H] — tiny; the big tensors stay per-direction


def _bilstm_op_fwd(bf16, layer_params, x, lengths):
    from ..parallel.mesh import pallas_interpret

    interpret = pallas_interpret()
    lengths32 = lengths.astype(jnp.int32)
    # xg is saved as a residual: the backward would otherwise recompute
    # both input projections (the two largest matmuls in the layer)
    xg_f = _dir_xg(layer_params["fwd"], x, False, bf16)
    xg_b = _dir_xg(layer_params["bwd"], x, True, bf16)
    (out_f, hs_f, cs_f), (out_b, hs_b, cs_b) = _lstm_train_fwd_pair(
        xg_f, xg_b, _stack_whh(layer_params), lengths32,
        block_t=_block_t_train(bf16, backward=False),
        state_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        interpret=interpret,
    )
    result = jnp.concatenate(
        [jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b[::-1], 0, 1)],
        axis=-1,
    )
    states = {"fwd": (hs_f, cs_f), "bwd": (hs_b, cs_b)}
    return result, (layer_params, x, lengths, states, xg_f, xg_b)


def _bilstm_op_bwd(bf16, residuals, g):
    import numpy as np

    def mm(eq, a, b):
        if bf16:
            return jnp.einsum(
                eq, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return jnp.einsum(eq, a, b)

    layer_params, x, lengths, states, xg_f, xg_b = residuals
    hidden = states["fwd"][0].shape[-1]
    from ..parallel.mesh import pallas_interpret

    interpret = pallas_interpret()
    lengths32 = lengths.astype(jnp.int32)
    x_tm = jnp.swapaxes(x, 0, 1)  # [T, B, D]

    dout_f = jnp.swapaxes(g[..., :hidden], 0, 1)
    dout_b = jnp.swapaxes(g[..., hidden:], 0, 1)[::-1]
    if bf16:
        dout_f = dout_f.astype(jnp.bfloat16)
        dout_b = dout_b.astype(jnp.bfloat16)
    pair = _lstm_train_bwd_pair(
        xg_f, xg_b, _stack_whh(layer_params), lengths32, states,
        dout_f, dout_b, block_t=_block_t_train(bf16, backward=True),
        interpret=interpret,
    )

    d_params = {}
    d_x = 0.0
    for (direction, reverse), dg in zip(
        (("fwd", False), ("bwd", True)), pair
    ):
        p = layer_params[direction]
        h_prev = states[direction][0]  # pre-update h, ready for dW_hh
        if reverse:  # back to natural time order for the big matmuls
            dg = dg[::-1]
            h_prev = h_prev[::-1]
        db = jnp.sum(dg.astype(jnp.float32), axis=(0, 1))
        d_params[direction] = {
            "w_ih": mm("tbg,tbd->gd", dg, x_tm),
            "w_hh": mm("tbg,tbh->gh", dg, h_prev),
            "b_ih": db,
            "b_hh": db,
        }
        d_x = d_x + mm("tbg,gd->tbd", dg, p["w_ih"])
    d_x = jnp.swapaxes(d_x, 0, 1)  # [B, T, D]
    d_len = np.zeros(lengths.shape, jax.dtypes.float0)
    return d_params, d_x, d_len


_bilstm_op.defvjp(_bilstm_op_fwd, _bilstm_op_bwd)


def bilstm_pallas(layer_params, x, lengths, interpret: bool = False,
                  compute_dtype=None):
    """Drop-in replacement for ops.lstm.bilstm -> ``[B, T, 2H]``.

    Differentiable via the custom-VJP train kernel pair.
    ``compute_dtype=jnp.bfloat16`` runs the input projections, the
    weight/input gradient matmuls, and the kernel streaming in bf16
    with f32 accumulation; the recurrence itself stays f32 (in-loop
    casts measured 3.3x slower, PLAN.md dead ends).
    """
    if interpret:
        return _bilstm_pallas_impl(
            layer_params, x, lengths, interpret=True
        )
    return _bilstm_op(compute_dtype == jnp.bfloat16, layer_params, x,
                      lengths)
