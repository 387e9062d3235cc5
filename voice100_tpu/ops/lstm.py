"""Length-masked (bi)LSTM as JAX scans.

The reference runs cuDNN LSTMs over packed sequences
(voice100/models/_asr_v2.py:32-48, _align_v2.py:19-35, _tts_v2.py:36-56),
which forces a device->host sync for the lengths. Here sequences stay
padded with static shapes:

* the input projection ``x @ W_ih^T`` for the whole sequence is hoisted
  out of the recurrence into one large matmul (MXU-friendly,
  ``[B*T, D] x [D, 4H]``),
* ``jax.lax.scan`` carries only the recurrent ``h @ W_hh^T`` step,
* packed-sequence semantics are reproduced with masks: state freezes at
  padding steps and padded outputs are zero; the backward direction
  starts from the true end of each sequence.

Weight layout and gate order (i, f, g, o) follow torch.nn.LSTM so
checkpoints are cross-loadable and numerics directly comparable.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "init_lstm_params",
    "lstm_direction",
    "bilstm",
    "multilayer_bilstm",
    "set_default_compute_dtype",
    "default_compute_dtype",
]

Params = Dict[str, jnp.ndarray]

# Process-wide default for the recurrent matmul compute dtype (None =
# input dtype). Set by Trainer for mixed-precision training BEFORE the
# step functions are traced; the env var VOICE100_TPU_MATMUL_DTYPE is
# the fallback for serving paths.
_DEFAULT_COMPUTE_DTYPE = None


def set_default_compute_dtype(dtype) -> None:
    """Set the process default LSTM matmul dtype (e.g. jnp.bfloat16).

    Trace-time setting: applies to programs compiled after the call.
    Pass None to restore input-dtype compute.
    """
    global _DEFAULT_COMPUTE_DTYPE
    _DEFAULT_COMPUTE_DTYPE = dtype


def default_compute_dtype():
    import os

    if _DEFAULT_COMPUTE_DTYPE is not None:
        return _DEFAULT_COMPUTE_DTYPE
    name = os.environ.get("VOICE100_TPU_MATMUL_DTYPE", "")
    return jnp.bfloat16 if name == "bfloat16" else None


def init_lstm_params(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool = True,
    dtype=jnp.float32,
) -> List[Dict[str, Params]]:
    """torch-style uniform(-1/sqrt(H), 1/sqrt(H)) init, torch layout:
    ``w_ih [4H, D]``, ``w_hh [4H, H]``, ``b_ih [4H]``, ``b_hh [4H]``."""
    bound = 1.0 / np.sqrt(hidden_size)
    directions = ["fwd", "bwd"] if bidirectional else ["fwd"]
    layers = []
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else hidden_size * len(directions)
        layer_params: Dict[str, Params] = {}
        for direction in directions:
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            layer_params[direction] = {
                "w_ih": jax.random.uniform(
                    k1, (4 * hidden_size, d_in), dtype, -bound, bound
                ),
                "w_hh": jax.random.uniform(
                    k2, (4 * hidden_size, hidden_size), dtype, -bound, bound
                ),
                "b_ih": jax.random.uniform(
                    k3, (4 * hidden_size,), dtype, -bound, bound
                ),
                "b_hh": jax.random.uniform(
                    k4, (4 * hidden_size,), dtype, -bound, bound
                ),
            }
        layers.append(layer_params)
    return layers


def lstm_direction(
    params: Params,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    reverse: bool,
) -> jnp.ndarray:
    """One direction of a masked LSTM layer.

    Args:
        params: ``w_ih [4H, D]``, ``w_hh [4H, H]``, ``b_ih``, ``b_hh``.
        x: ``[B, T, D]`` padded inputs.
        lengths: ``[B]`` valid lengths.
        reverse: scan right-to-left (backward direction).

    Returns:
        ``[B, T, H]`` outputs, zero at padding positions.
    """
    batch, time, _ = x.shape
    hidden = params["w_hh"].shape[1]
    # Hoisted input projection: one big MXU matmul over the sequence.
    xg = (
        x @ params["w_ih"].T + params["b_ih"] + params["b_hh"]
    )  # [B, T, 4H]
    xg = jnp.swapaxes(xg, 0, 1)  # [T, B, 4H] for scan
    t_index = jnp.arange(time)
    if reverse:
        xg = xg[::-1]
        t_index = t_index[::-1]
    w_hh_t = params["w_hh"].T  # [H, 4H]

    def step(carry, inp):
        h_prev, c_prev = carry
        gates_x, t = inp
        gates = gates_x + h_prev @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        valid = (t < lengths)[:, None].astype(x.dtype)  # [B, 1]
        # Freeze state at padding so the backward pass starts from the
        # true sequence end and the forward final state is at len-1.
        h = valid * h + (1.0 - valid) * h_prev
        c = valid * c + (1.0 - valid) * c_prev
        return (h, c), h * valid

    init = (
        jnp.zeros((batch, hidden), x.dtype),
        jnp.zeros((batch, hidden), x.dtype),
    )
    _, out = jax.lax.scan(step, init, (xg, t_index))
    if reverse:
        out = out[::-1]
    return jnp.swapaxes(out, 0, 1)  # [B, T, H]


def bilstm(
    layer_params: Dict[str, Params],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    compute_dtype=None,
) -> jnp.ndarray:
    """Bidirectional layer: concat(fwd, bwd) -> ``[B, T, 2H]``.

    Both directions run in ONE ``lax.scan``: the recurrent matmuls of
    fwd and bwd stack into a single batched GEMM per step
    (``[2, B, H] x [2, H, 4H]``), halving the sequential scan overhead
    versus two separate scans — the dominant cost for these small
    recurrent shapes on TPU.

    ``compute_dtype`` (e.g. jnp.bfloat16) casts the matmul operands
    while keeping the state and accumulation in float32.
    """
    batch, time, _ = x.shape
    fwd, bwd = layer_params["fwd"], layer_params["bwd"]
    hidden = fwd["w_hh"].shape[1]
    out_dtype = x.dtype
    cd = compute_dtype or x.dtype

    def in_proj(p):
        w = p["w_ih"].T.astype(cd)
        return (
            jnp.matmul(x.astype(cd), w, preferred_element_type=out_dtype)
            + p["b_ih"] + p["b_hh"]
        )

    xg_f = jnp.swapaxes(in_proj(fwd), 0, 1)          # [T, B, 4H]
    xg_b = jnp.swapaxes(in_proj(bwd), 0, 1)[::-1]    # reversed time
    xg = jnp.stack([xg_f, xg_b], axis=1)             # [T, 2, B, 4H]
    t_fwd = jnp.arange(time)
    t_idx = jnp.stack([t_fwd, t_fwd[::-1]], axis=1)  # [T, 2]

    w_hh = jnp.stack(
        [fwd["w_hh"].T, bwd["w_hh"].T], axis=0
    ).astype(cd)  # [2, H, 4H]

    def step(carry, inp):
        h_prev, c_prev = carry  # [2, B, H]
        gates_x, t = inp        # [2, B, 4H], [2]
        gates = gates_x + jnp.einsum(
            "dbh,dhg->dbg", h_prev.astype(cd), w_hh,
            preferred_element_type=out_dtype,
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        valid = (t[:, None] < lengths[None, :])[:, :, None].astype(out_dtype)
        h = valid * h + (1.0 - valid) * h_prev
        c = valid * c + (1.0 - valid) * c_prev
        return (h, c), h * valid

    init = (
        jnp.zeros((2, batch, hidden), out_dtype),
        jnp.zeros((2, batch, hidden), out_dtype),
    )
    # unroll=4 amortizes per-step scan overhead on TPU: +9% training
    # throughput at asr_en_base scale (2934 -> 3205 audio-s/s on v5e;
    # unroll=8 regresses)
    _, out = jax.lax.scan(
        step, init, (xg, t_idx), unroll=4
    )  # [T, 2, B, H]
    out_f = jnp.swapaxes(out[:, 0], 0, 1)
    out_b = jnp.swapaxes(out[::-1, 1], 0, 1)
    return jnp.concatenate([out_f, out_b], axis=-1)


# Last kernel mode picked at trace time ('pallas'|'shard'|'scan'); for
# path reporting by the driver dryrun and the trainer logs.
_LAST_KERNEL_MODE = None


def last_kernel_mode():
    return _LAST_KERNEL_MODE


def _kernel_mode(dropout_rng, compute_dtype=None, batch: int = 0) -> str:
    """Pick the LSTM implementation at trace time.

    'pallas': direct Pallas kernels — the grid-over-time inference
    kernel (2.2x over the scan on v5e) and, under differentiation, the
    direction-fused custom-VJP pair. Default on single-device TPU.
    'shard': the same kernels wrapped in jax.shard_map over the batch
    axes of the mesh declared via parallel.mesh.kernel_sharding
    (pallas_call does not auto-partition under GSPMD, so without this a
    sharded mesh loses the kernel speedup). Pure-DP meshes split the
    batch over 'data'; tensor-parallel meshes split it over the whole
    fleet with the small LSTM weights all-gathered inside the map.
    'scan': the lax.scan fallback (CPU/GPU, non-bf16 reduced dtypes,
    batches not divisible by the fleet).

    Override with VOICE100_TPU_LSTM_KERNEL=pallas|scan. The bf16
    precision knob routes to the Pallas mixed-precision path (bf16
    projections/streaming/gradient matmuls, f32 recurrence); other
    reduced dtypes are only honored by the scan.
    """
    import logging
    import os

    del dropout_rng  # training and inference both default to Pallas
    forced = os.environ.get("VOICE100_TPU_LSTM_KERNEL")
    if forced == "pallas":
        return "pallas"
    if forced == "scan":
        return "scan"
    if compute_dtype is not None and compute_dtype != jnp.bfloat16:
        # only bf16 has a Pallas mixed-precision path (bf16 projections
        # and streaming, f32 recurrence); other dtypes keep the scan
        return "scan"
    from ..parallel.mesh import active_kernel_mesh, kernel_batch_divisor

    mesh = active_kernel_mesh()
    if mesh is not None:
        div = kernel_batch_divisor(mesh)
        if batch % div == 0:
            return "shard"
        logging.getLogger(__name__).warning(
            "kernel_sharding mesh active but batch %d is not divisible "
            "by the mesh fleet (%d); falling back to the scan LSTM",
            batch, div,
        )
        return "scan"
    backend = jax.default_backend()
    if backend in ("cpu", "gpu"):
        return "scan"
    if len(jax.devices()) == 1:
        return "pallas"
    # multi-chip without a kernel_sharding declaration: the kernels
    # cannot partition; warn because this forfeits ~6x step throughput
    logging.getLogger(__name__).warning(
        "multi-device run without parallel.mesh.kernel_sharding: the "
        "Pallas LSTM kernels fall back to lax.scan (slower). Train "
        "through Trainer with a pure-DP mesh, or wrap the step trace "
        "in kernel_sharding(mesh)."
    )
    return "scan"


def multilayer_bilstm(
    params: List[Dict[str, Params]],
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Stacked (bi)LSTM with inter-layer dropout (torch convention:
    applied to every layer's output except the last, training only —
    pass ``dropout_rng=None`` for eval)."""
    global _LAST_KERNEL_MODE
    mode = _kernel_mode(dropout_rng, compute_dtype, batch=x.shape[0])
    _LAST_KERNEL_MODE = mode
    shard_fn = None
    if mode == "shard":
        from ..parallel.mesh import active_kernel_mesh, data_shard_map
        from .lstm_pallas import bilstm_pallas

        def _per_shard(p, o, ln):
            return bilstm_pallas(p, o, ln, compute_dtype=compute_dtype)

        shard_fn = data_shard_map(
            _per_shard, active_kernel_mesh(),
            n_batch_args=2, n_static_args=1,
        )
    out = x
    for i, layer in enumerate(params):
        if "bwd" in layer:
            if mode == "pallas":
                from .lstm_pallas import bilstm_pallas

                out = bilstm_pallas(
                    layer, out, lengths, compute_dtype=compute_dtype
                )
            elif mode == "shard":
                out = shard_fn(layer, out, lengths)
            else:
                out = bilstm(
                    layer, out, lengths, compute_dtype=compute_dtype
                )
        else:
            out = lstm_direction(layer["fwd"], out, lengths, reverse=False)
        last = i == len(params) - 1
        if dropout > 0.0 and dropout_rng is not None and not last:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout), 0.0)
    return out
