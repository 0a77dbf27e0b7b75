"""Measure the PyTorch-CPU reference-equivalent decode baseline.

The reference decodes by re-running the whole decoder over the growing
sequence each step with use_cache=False (reference: models/t5.py:267-295).
Per-step cost at prefix length n is ~a + b*n + c*n^2 (the linear terms are
the cross-attention/FFN re-runs, the quadratic term is causal
self-attention over the growing prefix); this measures it at several n —
INCLUDING the full n=1024, so the integral over the 1024 steps
interpolates the fit rather than extrapolating past the last sample — and
writes benchmarks/baseline_torch_cpu.json for bench.py. Predicted per-step
costs are clamped at zero so a noisy fit can only shrink the baseline
total (i.e. only understate bench.py's vs_baseline, never inflate it).

Usage: python tools/measure_torch_baseline.py
"""

import json
import os
import time

import numpy as np


def fit_and_integrate(ns, cs, steps=1024):
    """Fit per-step cost a+b*n+c*n^2 to (ns, cs) and integrate 1..steps.

    Predicted per-step costs are clamped at zero so a noisy fit can only
    SHRINK the total (i.e. only understate bench.py's vs_baseline, never
    inflate it). Returns (a, b, c, total_seconds)."""
    design = np.vstack([np.ones(len(ns)), ns,
                        np.square(ns, dtype=float)]).T
    (a, b, c), *_ = np.linalg.lstsq(design, np.array(cs), rcond=None)
    total = float(sum(max(a + b * n + c * n * n, 0.0)
                      for n in range(1, steps + 1)))
    return a, b, c, total


def main():
    import torch
    import transformers

    torch.manual_seed(0)
    t5c = transformers.T5Config(
        vocab_size=1536, d_model=512, d_kv=64, d_ff=1024, num_heads=6,
        num_layers=8, num_decoder_layers=8, feed_forward_proj='gated-gelu',
        dropout_rate=0.0, tie_word_embeddings=False, use_cache=False,
        decoder_start_token_id=0)
    hf = transformers.T5ForConditionalGeneration(t5c).eval()
    batch = 8
    enc_out = torch.randn(batch, 256, 512)
    pos = torch.randn(5000, 512)

    def step_cost(n, iters=3):
        ids = torch.randint(0, 1536, (batch, n))
        with torch.no_grad():
            dec_in = hf.shared(ids) + pos[:n]
            hf.decoder(inputs_embeds=dec_in, encoder_hidden_states=enc_out)
            t0 = time.time()
            for _ in range(iters):
                out = hf.decoder(
                    inputs_embeds=dec_in,
                    encoder_hidden_states=enc_out).last_hidden_state
                hf.lm_head(out[:, -1:])
            return (time.time() - t0) / iters

    ns = [32, 128, 384, 768, 1024]
    cs = [step_cost(n) for n in ns]
    a, b, c, total = fit_and_integrate(ns, cs)
    audio_sec = batch * 256 * 128 / 16000

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks',
        'baseline_torch_cpu.json')
    with open(out_path, 'w') as f:
        json.dump({
            'description': ('PyTorch-CPU reference-equivalent greedy decode '
                            '(no KV cache, batch 8 segments, 1024 steps), '
                            'per-step cost fit a+b*n+c*n^2 integrated'),
            'machine': f'{os.cpu_count()} visible CPU(s), single process',
            'prefix_ms': {str(n): cost * 1000 for n, cost in zip(ns, cs)},
            'fit_a_ms': a * 1000, 'fit_b_ms': b * 1000,
            'fit_c_ms': c * 1000,
            'total_seconds_1024_steps': total,
            'audio_seconds': audio_sec,
            'rtf': audio_sec / total,
        }, f, indent=1)
    print(f'baseline RTF {audio_sec / total:.4f} -> {out_path}')


if __name__ == '__main__':
    main()
