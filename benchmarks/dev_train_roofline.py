"""Train-step roofline ablation (run on the TPU; dev tool, not CI).

Breaks the bucketed bf16 with-prev train step into additive costs by
ablation, at several batch sizes, so the PERF.md training section can name
where the time goes (the decode section already has this accounting):

  full        — the production step: mel-in-step, dropout, fwd+bwd+adam
  no_mel      — batch carries precomputed mel (isolates the in-step DSP)
  no_dropout  — deterministic fwd in the grad (isolates RNG/mask cost)
  fwd_only    — loss forward pass only (isolates backward+optimizer)
  no_segmem   — vanilla model, same shapes (isolates the memory encoder)
  targets_1024— unbucketed targets (what bucketing saves at this shape)

Prints a JSON lines table; wall-clock timed with host-sync (scalar pull).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from mr_mt3_tpu.models import MT3, MT3Config
    from mr_mt3_tpu.train.trainer import (
        TrainState,
        batch_to_mel,
        make_train_step,
    )
    from mr_mt3_tpu.audio.frontend import SpectrogramConfig
    from mr_mt3_tpu.train.losses import cross_entropy_loss
    from mr_mt3_tpu.utils.bench_helpers import time_stats, zero_variables
    from mr_mt3_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    spec = SpectrogramConfig()

    def make_batch(b, t_dec):
        targets = np.concatenate([
            rng.integers(3, 1391, (b, t_dec - 1)),
            np.ones((b, 1), np.int64)], axis=1)
        return {
            'audio': (rng.normal(size=(b, 256 * 128)) * 0.1
                      ).astype(np.float32),
            'valid_frames': np.full((b,), 256, np.int32),
            'targets': targets,
            'targets_prev': np.concatenate(
                [targets, np.full((b, 1024 - t_dec), -100)], axis=1),
        }

    def step_time(model, b, t_dec, variant):
        variables = zero_variables(model)
        optimizer = optax.adamw(1e-4)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables['params'],
                           opt_state=optimizer.init(variables['params']))
        batch = make_batch(b, t_dec)
        if not model.cfg.has_segmem:
            batch.pop('targets_prev')

        if variant == 'no_mel':
            mel = np.asarray(batch_to_mel(
                jnp.asarray(batch['audio']),
                jnp.asarray(batch['valid_frames']), spec))

            def loss_fn(params, batch, rng_):
                logits = model.apply(
                    {'params': params}, batch['mel'],
                    labels=batch['targets'],
                    targets_prev=batch.get('targets_prev'),
                    deterministic=False, rngs={'dropout': rng_})
                return cross_entropy_loss(logits, batch['targets'])

            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, batch, rng_):
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, batch, rng_)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(step=state.step + 1, params=params,
                                  opt_state=opt_state), loss
            batch = dict(batch)
            batch.pop('audio')
            batch.pop('valid_frames')
            batch['mel'] = mel
        elif variant == 'fwd_only':
            @jax.jit
            def fwd(params, batch, rng_):
                mel = batch_to_mel(batch['audio'], batch['valid_frames'],
                                   spec)
                logits = model.apply(
                    {'params': params}, mel, labels=batch['targets'],
                    targets_prev=batch.get('targets_prev'),
                    deterministic=False, rngs={'dropout': rng_})
                return cross_entropy_loss(logits, batch['targets'])

            def fn(state, batch, rng_):
                return state, fwd(state.params, batch, rng_)
        elif variant == 'no_dropout':
            def loss_det(params, batch):
                mel = batch_to_mel(batch['audio'], batch['valid_frames'],
                                   spec)
                logits = model.apply(
                    {'params': params}, mel, labels=batch['targets'],
                    targets_prev=batch.get('targets_prev'),
                    deterministic=True)
                return cross_entropy_loss(logits, batch['targets'])

            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, batch, rng_):
                loss, grads = jax.value_and_grad(loss_det)(state.params,
                                                           batch)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(step=state.step + 1, params=params,
                                  opt_state=opt_state), loss
        else:
            fn = make_train_step(model, optimizer)

        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(0)

        def call():
            nonlocal state
            state, metrics = fn(state, jb, key)
            return metrics

        stats = time_stats(lambda: call(), lambda: (), reps=6)
        return stats

    segcfg = MT3Config(dtype='bfloat16', segmem_variant='encoder_append',
                       segmem_length=64)
    vancfg = MT3Config(dtype='bfloat16')

    cases = []
    for b in (48, 96, 192):
        cases.append(('full', segcfg, b, 256))
    for variant in ('no_mel', 'fwd_only', 'no_dropout'):
        cases.append((variant, segcfg, 96, 256))
    cases.append(('no_segmem', vancfg, 96, 256))
    cases.append(('targets_1024', segcfg, 96, 1024))

    for variant, cfg, b, t_dec in cases:
        model = MT3(cfg)
        stats = step_time(model, b, t_dec,
                          variant if variant not in (
                              'no_segmem', 'targets_1024') else 'full')
        print(json.dumps({
            'variant': variant, 'batch': b, 't_dec': t_dec,
            'ms_median': round(stats['median'] * 1000, 1),
            'ms_min': round(stats['min'] * 1000, 1),
            'spread': round(stats['spread'], 3),
            'seg_per_s': round(b / stats['median'], 1),
        }), flush=True)


if __name__ == '__main__':
    main()
