"""Import reference-format PyTorch checkpoints into the Flax model.

The reference ships/produces flat torch state dicts in HF-T5 naming
(pretrained/mt3.pth produced by reference tools/convert_weight.py, and
.pt files saved by reference train.py:105-116). This maps those names onto
the mr_mt3_tpu.models.MT3 parameter tree, transposing Linear kernels
(torch stores (out, in); flax stores (in, out)).

Accepted key families (others are ignored, matching the reference's
strict=False loads — reference train.py:80-84, test.py:105-110):

  proj.weight                                     -> proj/kernel (T)
  decoder_embed_tokens.weight                     -> token_embed/embedding
  lm_head.weight                                  -> lm_head/kernel (T)
  encoder.block.N.layer.0.SelfAttention.{q,k,v,o}.weight
  encoder.block.N.layer.0.layer_norm.weight
  encoder.block.N.layer.1.DenseReluDense.{wi_0,wi_1,wo}.weight
  encoder.block.N.layer.1.layer_norm.weight
  encoder.final_layer_norm.weight
  decoder.block.N.layer.{0,1,2}...   (0=self attn, 1=cross attn, 2=mlp)
  decoder.final_layer_norm.weight
  segmem_proj.weight, segmem_encoder.*            (segmem family)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from mr_mt3_tpu.models.config import MT3Config

_ATTN_SUBKEYS = {'q': 'q', 'k': 'k', 'v': 'v', 'o': 'o'}
_FF_SUBKEYS = {'wi_0': 'wi_0', 'wi_1': 'wi_1', 'wo': 'wo'}

# keys that exist in reference state dicts but carry no information for us
_IGNORED_PATTERNS = (
    re.compile(r'\.pos_emb\.inv_freq$'),
    re.compile(r'^(encoder|decoder|segmem_encoder)\.embed_tokens\.weight$'),
    re.compile(r'^shared\.weight$'),
    re.compile(r'relative_attention_bias'),
)


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, 'detach'):
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


_BLOCK_RE = re.compile(
    r'^(encoder|decoder|segmem_encoder)\.block\.(\d+)\.layer\.(\d+)\.'
    r'(SelfAttention|EncDecAttention|DenseReluDense|layer_norm)'
    r'(?:\.(\w+))?\.weight$')


def import_torch_state_dict(state_dict: Mapping[str, Any],
                            cfg: MT3Config) -> Dict[str, Any]:
    """Flat reference state dict -> nested flax params dict.

    Raises on shape mismatches; silently skips keys the model doesn't have
    (e.g. segmem weights when cfg has no segmem).
    """
    params: Dict[str, Any] = {}
    unused = []
    for key, raw in state_dict.items():
        if any(p.search(key) for p in _IGNORED_PATTERNS):
            continue
        value = _to_numpy(raw)

        if key == 'proj.weight':
            _set(params, ('proj', 'kernel'), value.T)
            continue
        if key == 'segmem_proj.weight':
            # vestigial in the reference (constructed but bypassed via
            # inputs_embeds — reference models/t5_segmem.py:57,134-135)
            continue
        if key == 'decoder_embed_tokens.weight':
            _set(params, ('token_embed', 'embedding'), value)
            continue
        if key == 'lm_head.weight':
            _set(params, ('lm_head', 'kernel'), value.T)
            continue
        m = re.match(r'^(encoder|decoder|segmem_encoder)\.final_layer_norm'
                     r'\.weight$', key)
        if m:
            _set(params, (m.group(1), 'final_norm', 'weight'), value)
            continue

        m = _BLOCK_RE.match(key)
        if m:
            stack, block_idx, layer_idx, kind, sub = m.groups()
            if stack == 'segmem_encoder' and not cfg.has_segmem:
                unused.append(key)
                continue
            block = f'block_{block_idx}'
            is_decoder = stack == 'decoder'
            layer_idx = int(layer_idx)
            if kind == 'SelfAttention':
                _set(params, (stack, block, 'self_attn',
                              _ATTN_SUBKEYS[sub], 'kernel'), value.T)
            elif kind == 'EncDecAttention':
                _set(params, (stack, block, 'cross_attn',
                              _ATTN_SUBKEYS[sub], 'kernel'), value.T)
            elif kind == 'DenseReluDense':
                _set(params, (stack, block, 'ff', _FF_SUBKEYS[sub],
                              'kernel'), value.T)
            elif kind == 'layer_norm':
                if layer_idx == 0:
                    norm = 'self_norm'
                elif is_decoder and layer_idx == 1:
                    norm = 'cross_norm'
                else:
                    norm = 'ff_norm'
                _set(params, (stack, block, norm, 'weight'), value)
            continue

        unused.append(key)

    if unused:
        # surfaced, not raised: skipping extra keys is load-bearing (a
        # full-model checkpoint loads into a no-segmem config by design),
        # but a silently dropped key family (e.g. a renamed block prefix)
        # should leave a trace in the logs
        print(f'import_torch_state_dict: {len(unused)} checkpoint keys '
              f'not mapped (e.g. {unused[:3]})')
    return params


def export_to_torch_state_dict(params: Mapping[str, Any],
                               cfg: MT3Config) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> reference-format flat dict (numpy)."""
    out: Dict[str, np.ndarray] = {}

    def get(*path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    out['proj.weight'] = get('proj', 'kernel').T
    out['decoder_embed_tokens.weight'] = get('token_embed', 'embedding')
    out['lm_head.weight'] = get('lm_head', 'kernel').T

    stacks = [('encoder', cfg.num_encoder_layers, False),
              ('decoder', cfg.num_decoder_layers, True)]
    if cfg.has_segmem and 'segmem_encoder' in params:
        stacks.append(('segmem_encoder', cfg.segmem_num_layers, False))
    for stack, n_layers, is_decoder in stacks:
        for i in range(n_layers):
            block = f'block_{i}'
            prefix = f'{stack}.block.{i}.layer'
            for hf_name, mine in _ATTN_SUBKEYS.items():
                out[f'{prefix}.0.SelfAttention.{hf_name}.weight'] = get(
                    stack, block, 'self_attn', mine, 'kernel').T
            out[f'{prefix}.0.layer_norm.weight'] = get(
                stack, block, 'self_norm', 'weight')
            ff_layer = 1
            if is_decoder:
                for hf_name, mine in _ATTN_SUBKEYS.items():
                    out[f'{prefix}.1.EncDecAttention.{hf_name}.weight'] = get(
                        stack, block, 'cross_attn', mine, 'kernel').T
                out[f'{prefix}.1.layer_norm.weight'] = get(
                    stack, block, 'cross_norm', 'weight')
                ff_layer = 2
            for hf_name, mine in _FF_SUBKEYS.items():
                out[f'{prefix}.{ff_layer}.DenseReluDense.{hf_name}.weight'] = (
                    get(stack, block, 'ff', mine, 'kernel').T)
            out[f'{prefix}.{ff_layer}.layer_norm.weight'] = get(
                stack, block, 'ff_norm', 'weight')
        out[f'{stack}.final_layer_norm.weight'] = get(
            stack, 'final_norm', 'weight')
    return out


def load_torch_checkpoint(path, cfg: MT3Config) -> Dict[str, Any]:
    """Load a reference .pth/.pt/.ckpt file into a flax params dict.

    Lightning .ckpt files store weights under 'state_dict' with a 'model.'
    prefix (reference: train.py:105-116 strips it the same way).
    """
    import torch
    blob = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(blob, dict) and 'state_dict' in blob:
        blob = blob['state_dict']
    state_dict = {k.removeprefix('model.'): v for k, v in blob.items()}
    return import_torch_state_dict(state_dict, cfg)
