"""Evaluation entry point (transcribe a dataset and score it).

CLI mirrors the reference (reference: test.py, test.sh):

  python test.py --config-name=config_slakh_segmem \
      model=MT3NetSegMemV2WithPrev path=runs/.../checkpoints/last \
      eval.eval_dataset=Slakh 'eval.audio_dir=/data/slakh/test/*/mix_16k.wav' \
      eval.exp_tag_name=out_midis eval.midi_dir=/data/slakh/test/

`path` may be an Orbax checkpoint directory or a reference torch
.pth/.pt file. mel_norm is disabled automatically for the official
checkpoint (reference: test.py:123).
"""

import glob
import os
import sys


def main(argv=None):
    from mr_mt3_tpu.utils.config import load_config, parse_cli
    config_name, config_dir, overrides = parse_cli(
        sys.argv[1:] if argv is None else argv)
    default_dir = os.environ.get('MR_MT3_CONFIGS') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'configs')
    cfg = load_config(config_dir or default_dir, config_name, overrides)

    from mr_mt3_tpu.utils.profiling import (
        enable_compilation_cache,
        honor_platform_env,
    )
    honor_platform_env()
    if bool(cfg.get('multihost')):
        # one process per host: the song list shards per process (strided),
        # each process decodes on its own chips via a LOCAL mesh, process 0
        # scores the shared output dir and broadcasts (infer/scores.py).
        # Mirrors train.py's multihost flag; auto-detects on TPU pods,
        # JAX_{COORDINATOR_ADDRESS,NUM_PROCESSES,PROCESS_ID} elsewhere.
        import jax

        from mr_mt3_tpu.parallel import init_multihost
        init_multihost()
        print(f'multihost eval: process {jax.process_index()}/'
              f'{jax.process_count()}, {jax.local_device_count()} '
              f'local devices')
    enable_compilation_cache()
    from mr_mt3_tpu.infer.scores import get_scores
    from mr_mt3_tpu.utils import builders

    assert cfg.get('path'), 'path=<checkpoint> is required'
    assert cfg.eval.get('exp_tag_name'), 'eval.exp_tag_name is required'
    assert cfg.eval.get('audio_dir'), 'eval.audio_dir is required'

    model = builders.build_model(cfg)
    # reference defaults to a NON-strict torch load when
    # eval.load_weights_strict is unset (reference test.py:107-110);
    # +eval.load_weights_strict=True opts into the strict check
    strict = cfg.eval.get('load_weights_strict')
    params, step = builders.load_weights(
        str(cfg.path), model, strict=False if strict is None else bool(strict))
    print(f'loaded weights from {cfg.path} (step {step})')

    files = sorted(glob.glob(cfg.eval.audio_dir))
    if cfg.eval.eval_dataset == 'NSynth':
        # no vocals/mallets in the training vocab (reference: test.py:117-119)
        files = [f for f in files if 'vocal' not in f and 'mallet' not in f]
    if cfg.eval.get('eval_first_n_examples'):
        files = files[:int(cfg.eval.eval_first_n_examples)]

    mel_norm = 'pretrained/mt3.pth' not in str(cfg.path)
    ground_truth = cfg.eval.get('midi_dir') or cfg.dataset.test.root_dir

    # data-parallel eval: shard decode batches over every visible chip
    # (devices: null = all, like train.py; the reference evaluates on a
    # single rank only — reference tasks/mt3_base.py:27). Under multihost
    # the mesh is per-process local — decode is embarrassingly parallel
    # across the process-sharded song list, so no program spans hosts.
    import jax
    mesh = None
    if bool(cfg.get('multihost')):
        from mr_mt3_tpu.parallel import local_mesh
        mesh = local_mesh()
        if mesh is not None:
            print(f'eval mesh (local): {mesh.shape["data"]} devices '
                  f'on the data axis')
    else:
        from mr_mt3_tpu.parallel import device_cap
        n_dev = device_cap(cfg.get('devices')) or len(jax.devices())
        if n_dev > 1:
            from mr_mt3_tpu.parallel import make_mesh
            mesh = make_mesh(data=n_dev, model=1)
            print(f'eval mesh: {n_dev} devices on the data axis')

    scores = get_scores(
        model=model,
        variables={'params': params},
        eval_audio_dir=files,
        mel_norm=mel_norm,
        eval_dataset=cfg.eval.eval_dataset,
        exp_tag_name=cfg.eval.exp_tag_name,
        ground_truth_midi_dir=ground_truth,
        contiguous_inference=bool(cfg.eval.get('contiguous_inference')),
        use_tf_spectral_ops=bool(cfg.eval.get('use_tf_spectral_ops')),
        batch_size=int(cfg.eval.get('batch_size') or 8),
        max_length=int(cfg.eval.get('max_length') or 1024),
        songs_per_batch=int(cfg.eval.get('songs_per_batch') or 4),
        # eval.quantize=fused opts eval into the whole-decoder megakernel
        # (1.5x decode throughput — PERF.md); eval.quantize=auto adds the
        # startup probe that falls back to exact bf16 on any token flip
        quantize=str(cfg.eval.get('quantize') or 'none'),
        mesh=mesh,
    )
    return scores


if __name__ == '__main__':
    main()
