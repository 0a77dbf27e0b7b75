"""Convert the official MT3 T5X checkpoint to this framework's format.

The reference converts T5X -> PyTorch (reference: tools/convert_weight.py);
here the T5X tree maps straight onto the Flax parameter layout (same
orientation — T5X kernels are (in, out) like Flax, so no transposes), and
an Orbax checkpoint is written that test.py / InferenceHandler can load.
PyTorch .pth checkpoints produced by the reference's converter load
directly via mr_mt3_tpu.utils.checkpoint_import instead.

Usage:
  python tools/convert_weight.py <t5x_state_dict.pk> <out_ckpt_dir>

The input is the pickled T5X state dict captured the way the reference
documents (reference: tools/convert_weight.py:110-125).
"""

from __future__ import annotations

import pickle
import sys
from typing import Any, Dict

import numpy as np


def flatten_state_dict(tree: Dict[str, Any], prefix: str = '') -> Dict[str, Any]:
    out = {}
    for key, value in tree.items():
        path = f'{prefix}/{key}' if prefix else key
        if isinstance(value, dict):
            out.update(flatten_state_dict(value, path))
        else:
            out[path] = value
    return out


def _count_layers(flat: Dict[str, np.ndarray], stack: str) -> int:
    import re
    pat = re.compile(rf'^target/{stack}/layers_(\d+)/')
    found = {int(m.group(1)) for k in flat for m in [pat.match(k)] if m}
    return max(found) + 1 if found else 0


def t5x_to_flax_params(flat: Dict[str, np.ndarray],
                       num_layers: int = None) -> Dict[str, Any]:
    """Map target/* T5X keys onto the mr_mt3_tpu.models.MT3 param tree.

    num_layers (a symmetric shorthand: same count for both stacks) defaults
    to the per-stack counts present in the checkpoint (8+8 for the official
    MT3 checkpoint); asymmetric checkpoints convert from their counted
    depths without needing the argument."""
    num_encoder_layers = (num_layers if num_layers is not None
                          else _count_layers(flat, 'encoder'))
    num_decoder_layers = (num_layers if num_layers is not None
                          else _count_layers(flat, 'decoder'))
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = np.asarray(value, dtype=np.float32)

    def attn(stack, block, mine, theirs):
        for sub_m, sub_t in (('q', 'query'), ('k', 'key'), ('v', 'value'),
                             ('o', 'out')):
            put((stack, block, mine, sub_m, 'kernel'),
                flat[f'target/{theirs}/{sub_t}/kernel'])

    for i in range(num_encoder_layers):
        blk = f'block_{i}'
        lyr = f'layers_{i}'
        attn('encoder', blk, 'self_attn', f'encoder/{lyr}/attention')
        put(('encoder', blk, 'self_norm', 'weight'),
            flat[f'target/encoder/{lyr}/pre_attention_layer_norm/scale'])
        for w in ('wi_0', 'wi_1', 'wo'):
            put(('encoder', blk, 'ff', w, 'kernel'),
                flat[f'target/encoder/{lyr}/mlp/{w}/kernel'])
        put(('encoder', blk, 'ff_norm', 'weight'),
            flat[f'target/encoder/{lyr}/pre_mlp_layer_norm/scale'])

    for i in range(num_decoder_layers):
        blk = f'block_{i}'
        lyr = f'layers_{i}'
        attn('decoder', blk, 'self_attn', f'decoder/{lyr}/self_attention')
        put(('decoder', blk, 'self_norm', 'weight'),
            flat[f'target/decoder/{lyr}/pre_self_attention_layer_norm/scale'])
        attn('decoder', blk, 'cross_attn',
             f'decoder/{lyr}/encoder_decoder_attention')
        put(('decoder', blk, 'cross_norm', 'weight'),
            flat[f'target/decoder/{lyr}/pre_cross_attention_layer_norm/scale'])
        for w in ('wi_0', 'wi_1', 'wo'):
            put(('decoder', blk, 'ff', w, 'kernel'),
                flat[f'target/decoder/{lyr}/mlp/{w}/kernel'])
        put(('decoder', blk, 'ff_norm', 'weight'),
            flat[f'target/decoder/{lyr}/pre_mlp_layer_norm/scale'])

    put(('encoder', 'final_norm', 'weight'),
        flat['target/encoder/encoder_norm/scale'])
    put(('decoder', 'final_norm', 'weight'),
        flat['target/decoder/decoder_norm/scale'])
    put(('proj', 'kernel'),
        flat['target/encoder/continuous_inputs_projection/kernel'])
    put(('token_embed', 'embedding'),
        flat['target/decoder/token_embedder/embedding'])
    put(('lm_head', 'kernel'), flat['target/decoder/logits_dense/kernel'])
    return params


def main(in_path: str, out_dir: str) -> None:
    with open(in_path, 'rb') as f:
        state = pickle.load(f)
    flat = {k: v for k, v in flatten_state_dict(state).items()
            if not k.startswith('state')}
    params = t5x_to_flax_params(flat)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    import os
    ckptr.save(os.path.abspath(out_dir),
               {'params': params, 'step': np.zeros((), np.int32)},
               force=True)
    ckptr.wait_until_finished()
    print(f'wrote {out_dir}')


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
