"""Device mesh construction and sharding rules.

The reference's distributed story is Lightning DDP over NCCL (SURVEY §2.8).
Here the equivalent is a JAX mesh with a 'data' axis (gradient all-reduce
compiled by XLA over ICI) plus an optional 'model' axis for tensor
parallelism of the attention/MLP projections — more than a 46M-param model
needs, but the layout rules make the same code scale to larger configs.

Multi-host: call jax.distributed.initialize() before building the mesh and
jax.devices() spans the slice; shardings below are process-agnostic.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('data', 'model'); data fills remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f'{n} devices not divisible by model={model}')
        data = n // model
    if data * model > n:
        raise ValueError(f'mesh {data}x{model} exceeds {n} devices')
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ('data', 'model'))


def device_cap(devices_cfg: Any) -> Optional[int]:
    """Normalize the config's `devices` override to a data-axis size.

    Reference command lines pass Lightning forms (reference train.sh:6
    `devices=[0,1]`, config/config.yaml:2 `devices: 1`): an int is a
    device COUNT, a list of device indices counts its length (JAX owns
    placement, so specific indices are not honored — only how many),
    and null/absent/non-positive means every visible device."""
    if devices_cfg is None:
        return None
    if isinstance(devices_cfg, (list, tuple)):
        return len(devices_cfg) or None
    n = int(devices_cfg)
    return n if n > 0 else None


def init_multihost() -> None:
    """jax.distributed.initialize() with a generic-cluster escape hatch.

    On TPU pods / SLURM the bare call auto-detects everything. Other
    clusters (incl. the CPU test cluster) have no plugin, so when
    JAX_NUM_PROCESSES is set we pass the coordinates explicitly:
    JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID."""
    import os
    kwargs = {}
    if os.environ.get('JAX_NUM_PROCESSES'):
        kwargs = dict(
            coordinator_address=os.environ.get('JAX_COORDINATOR_ADDRESS'),
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    jax.distributed.initialize(**kwargs)


def local_mesh(model: int = 1) -> Optional[Mesh]:
    """('data', 'model') mesh over THIS process's devices only, or None
    when the process has a single device (plain jit is then cheaper).

    For work that is embarrassingly parallel at the process level —
    multihost evaluation shards the song list per process and each
    process decodes on its own chips (infer.scores.get_scores) — a local
    mesh keeps every program single-process: no global arrays, no
    cross-host collectives inside decode."""
    devices = jax.local_devices()
    if len(devices) <= 1:
        return None
    return make_mesh(model=model, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split across 'data'."""
    return NamedSharding(mesh, P('data'))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter layout rules for the optional tensor-parallel axis. Attention
# q/k/v and MLP wi_* shard their output features (heads / ffn) across
# 'model'; o and wo shard input features, so each pair needs only one
# all-reduce, inserted by XLA.
_PARAM_RULES = (
    (re.compile(r'(self_attn|cross_attn)/(q|k|v)/kernel$'), P(None, 'model')),
    (re.compile(r'(self_attn|cross_attn)/o/kernel$'), P('model', None)),
    (re.compile(r'ff/(wi_0|wi_1)/kernel$'), P(None, 'model')),
    (re.compile(r'ff/wo/kernel$'), P('model', None)),
    (re.compile(r'lm_head/kernel$'), P(None, 'model')),
    (re.compile(r'token_embed/embedding$'), P('model', None)),
)


def _path_str(path) -> str:
    return '/'.join(getattr(k, 'key', str(k)) for k in path)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for params: TP rules on the 'model' axis,
    replicated otherwise (pure DP when model axis has size 1)."""
    def rule(path, leaf):
        name = _path_str(path)
        if mesh.shape['model'] > 1:
            for pattern, spec in _PARAM_RULES:
                if pattern.search(name):
                    # guard: only shard if the dim divides evenly
                    axis = spec.index('model') if 'model' in spec else None
                    if axis is not None and \
                            leaf.shape[axis] % mesh.shape['model'] == 0:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                pad_to_multiple: bool = True) -> Dict[str, jax.Array]:
    """Device-put a host batch with the leading axis split over 'data'.

    Pads the batch so the leading dim divides the data axis. Target-like
    keys pad with -100 (the CE ignore index) and everything else with
    zeros, so padding rows contribute exactly nothing to the masked losses
    — partial final batches are unbiased, not reweighted.

    MULTIHOST INVARIANT: every process must call this with the SAME local
    row count each step — the global shape is derived from the local one,
    so disagreeing row counts produce inconsistent global shapes and a
    crash or collective hang. The DataLoader guarantees this under
    sharding (equal counts of full-size batches per rank; see
    data/loader.py _batches); direct callers must do the same.
    """
    n_data = mesh.shape['data']
    procs = jax.process_count()
    # each process holds an equal slice of the data axis; its local rows
    # must divide its share of the data-axis devices
    local_quota = max(1, n_data // procs)
    out = {}
    for key, value in batch.items():
        b = value.shape[0]
        if b % local_quota:
            pad = local_quota - (b % local_quota)
            fill = -100 if key.startswith('targets') else 0
            pad_block = np.full((pad,) + value.shape[1:], fill,
                                dtype=value.dtype)
            value = np.concatenate([value, pad_block], axis=0)
        sharding = batch_sharding(mesh)
        if procs > 1:
            # multihost: each process contributes its local rows; the
            # global batch is the concatenation across processes
            global_shape = (value.shape[0] * procs,) + value.shape[1:]
            out[key] = jax.make_array_from_process_local_data(
                sharding, value, global_shape)
        else:
            out[key] = jax.device_put(value, sharding)
    return out
